"""In-memory golden oracle for the frontier-expansion strategies.

Single-process reference semantics re-derived from the public
BlockchainSpider algorithms (behavioral parity targets, cited per class):

* ``BfsOracle``      ≅ strategies/txs/bfs.py
* ``PoisonOracle``   ≅ strategies/txs/poison.py
* ``HaircutOracle``  ≅ strategies/txs/haricut.py
* ``ApprOracle``     ≅ strategies/txs/appr.py   (+ utils/cache.py LRU)

The Spark engine is asserted against these oracles (pop order, seen set,
rank vectors), never against the reference repo directly.

Determinism note: the reference iterates a Python ``set`` when scattering
APPR residuals (appr.py:41-52), whose order is hash-randomized run to run.
This oracle fixes neighbor order to *first appearance in the edge list*,
a deterministic refinement of the reference's unspecified order; every
other iteration order (dict insertion order, edge arrival order) is
preserved exactly, including float summation order.
"""

from __future__ import annotations

from collections import OrderedDict, deque
from typing import Any

Edge = dict  # keys: from, to, value, timeStamp, symbol, hash


class OracleBase:
    """Common surface: push(node, edges, **ctx) / pop() / snapshot() / ranks()."""

    def __init__(self, source: str, **_: Any):
        self.source = source

    def push(self, node: str, edges: list[Edge], **ctx: Any) -> None:
        raise NotImplementedError

    def pop(self) -> tuple[Any, dict]:
        raise NotImplementedError

    def snapshot(self) -> dict:
        raise NotImplementedError

    def ranks(self) -> dict:
        return {}


class BfsOracle(OracleBase):
    """Breadth-first over *all* endpoints of touched edges (undirected).

    Parity target: strategies/txs/bfs.py:7-47 — FIFO queue of
    ``(endpoint, depth+1)`` pairs enqueued in edge order (``from`` then
    ``to`` per edge), visited-set dedup applied at pop time.
    """

    def __init__(self, source: str, depth: int = 2, **_: Any):
        super().__init__(source)
        self.max_depth = int(depth)
        self.visited: set = {source}
        self._fifo: deque = deque()

    def push(self, node: str, edges: list[Edge], **ctx: Any) -> None:
        depth_now = int(ctx.get("depth", 0))
        if depth_now + 1 > self.max_depth:
            return
        for edge in edges:
            self._fifo.append((edge.get("from"), depth_now + 1))
            self._fifo.append((edge.get("to"), depth_now + 1))

    def pop(self) -> tuple[Any, dict]:
        while self._fifo:
            node, depth = self._fifo.popleft()
            if node in self.visited or depth > self.max_depth:
                continue
            self.visited.add(node)
            return node, {"depth": depth}
        return None, {}

    def snapshot(self) -> dict:
        return {
            "source": self.source,
            "max_depth": self.max_depth,
            "vis": list(self.visited),
        }


class PoisonOracle(OracleBase):
    """Forward-only BFS: taint flows along out-edges only.

    Parity target: strategies/txs/poison.py:7-41.
    """

    def __init__(self, source: str, depth: int = 2, **_: Any):
        super().__init__(source)
        self.max_depth = int(depth)
        self.visited: set = {source}
        self._fifo: deque = deque()

    def push(self, node: str, edges: list[Edge], **ctx: Any) -> None:
        depth_now = int(ctx.get("depth", 0))
        if depth_now + 1 > self.max_depth:
            return
        for edge in edges:
            if edge.get("from") == node:
                self._fifo.append((edge.get("to"), depth_now + 1))

    def pop(self) -> tuple[Any, dict]:
        while self._fifo:
            node, depth = self._fifo.popleft()
            if node in self.visited:
                continue
            self.visited.add(node)
            return node, {"depth": depth}
        return None, {}

    def snapshot(self) -> dict:
        return {
            "source": self.source,
            "depth": self.max_depth,
            "vis": list(self.visited),
        }


class HaircutOracle(OracleBase):
    """Proportional taint dilution along out-edge values.

    Parity target: strategies/txs/haricut.py:6-54. Quirks preserved:

    * pop() records the chosen node in the visited set *before* the
      ``None`` check, so an exhausted pop inserts ``None`` into ``vis``;
    * weights exactly equal to ``min_weight`` remain eligible
      (the reference skips only ``weight < min_weight``);
    * ties break toward the node inserted into ``weight_map`` first
      (strict ``>`` comparison while scanning in insertion order).
    """

    def __init__(self, source: str, min_weight: float = 1e-3, **_: Any):
        super().__init__(source)
        self.min_weight = float(min_weight)
        if not (0 < self.min_weight < 1):
            raise ValueError("min_weight must be in (0,1)")
        self.weight_map: dict = {source: 1}
        self.visited: set = {source}

    def push(self, node: str, edges: list[Edge], **ctx: Any) -> None:
        outgoing = [e for e in edges if e.get("from") == node]
        total_out = 0.0
        for e in outgoing:
            total_out += float(e.get("value", 0))
        if total_out == 0:
            return
        w_node = self.weight_map.get(node, 0)
        self.weight_map[node] = 0
        for e in outgoing:
            share = w_node * (float(e.get("value")) / total_out)
            dst = e.get("to")
            self.weight_map[dst] = self.weight_map.get(dst, 0) + share

    def pop(self) -> tuple[Any, dict]:
        best_node, best_w = None, 0
        for cand, w in self.weight_map.items():
            if w < self.min_weight:
                continue
            if cand not in self.visited and w > best_w:
                best_node, best_w = cand, w
        self.visited.add(best_node)  # reference inserts even when None
        if best_node is None:
            return None, {}
        return best_node, {"weight": best_w}

    def snapshot(self) -> dict:
        return {
            "source": self.source,
            "min_weight": self.min_weight,
            "weight_map": self.weight_map,
            "vis": list(self.visited),
        }

    def ranks(self) -> dict:
        return self.weight_map


class _Lru:
    """LRU map with reference eviction semantics (utils/cache.py:4-22):
    ``get`` refreshes recency; ``set`` evicts the oldest entry when the
    map is already at capacity."""

    def __init__(self, max_size: int = 1024):
        self.max_size = max_size
        self._odict: OrderedDict = OrderedDict()

    def get(self, key):
        val = self._odict.pop(key, None)
        if val is not None:
            self._odict[key] = val
        return val

    def set(self, key, val):
        self._odict.pop(key, None)
        if len(self._odict) >= self.max_size:
            self._odict.popitem(last=False)
        self._odict[key] = val


class ApprOracle(OracleBase):
    """Approximate personalized PageRank push (undirected degree).

    Parity target: strategies/txs/appr.py:7-89. The pop() drain loop
    repeatedly pushes any node whose residual exceeds epsilon *and*
    whose neighbor distribution has already been cached (i.e. the node
    was expanded before); fresh nodes must go through the crawler. The
    final answer is the residual argmax (strict ``>`` vs epsilon,
    insertion-order tiebreak).
    """

    def __init__(self, source: str, alpha: float = 0.15, epsilon: float = 1e-5, **_: Any):
        super().__init__(source)
        self.alpha = float(alpha)
        self.epsilon = float(epsilon)
        self.r: dict = {source: 1}
        self.p: dict = {}
        self.neighbor_cache = _Lru()

    def _neighbor_order(self, node: str, edges: list[Edge]) -> list:
        """Distinct endpoints in first-appearance order, self excluded."""
        seen, ordered = set(), []
        for e in edges:
            for endpoint in (e.get("from"), e.get("to")):
                if endpoint != node and endpoint not in seen:
                    seen.add(endpoint)
                    ordered.append(endpoint)
        return ordered

    def _scatter(self, dist: dict, r_node: float) -> None:
        for nbr, d in dist.items():
            self.r[nbr] = self.r.get(nbr, 0) + d * r_node

    def push(self, node: str, edges: list[Edge], **ctx: Any) -> None:
        r_node = self.r.get(node, 0)
        if r_node == 0:
            return
        self.r[node] = 0
        self.p[node] = self.p.get(node, 0) + r_node * self.alpha

        cached = self.neighbor_cache.get(node)
        if cached is not None:
            self._scatter(cached, r_node)
            return

        nbrs = self._neighbor_order(node, edges)
        degree = len(nbrs)
        inc = (1 - self.alpha) * r_node / degree if degree > 0 else 0
        for nbr in nbrs:
            self.r[nbr] = self.r.get(nbr, 0) + inc
        self.neighbor_cache.set(node, {nbr: (1 - self.alpha) / degree for nbr in nbrs})

    def pop(self) -> tuple[Any, dict]:
        while True:
            drained = None
            for cand, r_cand in self.r.items():
                if r_cand <= self.epsilon or not self.neighbor_cache.get(cand):
                    continue
                drained = (cand, r_cand)
                break
            if drained is None:
                break
            node, r_node = drained
            self.r[node] = 0
            self.p[node] = self.p.get(node, 0) + r_node * self.alpha
            self._scatter(self.neighbor_cache.get(node), r_node)

        best_node, best_r = None, self.epsilon
        for cand, r_cand in self.r.items():
            if r_cand > best_r:
                best_node, best_r = cand, r_cand
        if best_node is None:
            return None, {}
        return best_node, {"residual": best_r}

    def snapshot(self) -> dict:
        return {
            "source": self.source,
            "alpha": self.alpha,
            "epsilon": self.epsilon,
            "r": self.r,
            "p": self.p,
        }

    def ranks(self) -> dict:
        return self.p
