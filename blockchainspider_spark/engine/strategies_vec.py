"""Vectorized (numpy/Arrow-batch) strategy kernels for the exact engine.

These are the engine-side counterparts of the golden oracle in
``oracle/``: independently implemented with array operations — the shape
they take inside an ``applyInPandas`` grouped kernel — and asserted
against the oracle for identical pop sequences and allclose(1e-9) rank
vectors (float *summation order* differs: numpy pairwise vs the oracle's
left fold; values agree to ~1 ulp, ordering decisions are tie-free on
the fixtures by construction).

push() consumes one Arrow/pandas batch of the expanded node's transfers
(columns: from, to, value, timeStamp, symbol, hash in canonical scan
order); there is no per-row Python in any kernel except the genuinely
sequential TTRRedirect swap walk (SURVEY A11), which is the reference's
own data-dependency chain and runs per node group.

State is exportable per wave (``state_rows()``) → the engine writes it
as the ``node_state`` checkpoint table.
"""

from __future__ import annotations

from collections import deque
from typing import Any

import numpy as np
import pandas as pd

from blockchainspider_spark.oracle.ttr_redirect import TtrRedirectOracle


class VecStrategy:
    name = "base"

    def __init__(self, source: str, **_: Any):
        self.source = source

    def push(self, node: str, batch: pd.DataFrame, **ctx: Any) -> None:
        raise NotImplementedError

    def pop(self) -> tuple[Any, dict]:
        raise NotImplementedError

    def ranks(self) -> dict:
        return {}

    def state_rows(self) -> pd.DataFrame:
        """(node, r, p) snapshot for the node_state checkpoint table."""
        return pd.DataFrame({"node": [], "r": [], "p": []})


class VecBfs(VecStrategy):
    name = "BFS"

    def __init__(self, source, depth=2, **_: Any):
        super().__init__(source)
        self.max_depth = int(depth)
        self.visited = {source}
        self._fifo: deque = deque()

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        depth_now = int(ctx.get("depth", 0))
        if depth_now + 1 > self.max_depth:
            return
        # interleave (from, to) per edge — the reference's push order
        pairs = np.empty(2 * len(batch), dtype=object)
        pairs[0::2] = batch["from"].to_numpy()
        pairs[1::2] = batch["to"].to_numpy()
        self._fifo.extend((p, depth_now + 1) for p in pairs)

    def pop(self):
        while self._fifo:
            node, depth = self._fifo.popleft()
            if node in self.visited or depth > self.max_depth:
                continue
            self.visited.add(node)
            return node, {"depth": depth}
        return None, {}


class VecPoison(VecBfs):
    name = "Poison"

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        depth_now = int(ctx.get("depth", 0))
        if depth_now + 1 > self.max_depth:
            return
        outs = batch.loc[batch["from"] == node, "to"].to_numpy()
        self._fifo.extend((p, depth_now + 1) for p in outs)


class _OrderedFloatState:
    """Insertion-ordered node→float map backed by parallel arrays.

    pandas Series.add(fill_value=...) sorts its index — which would break
    the reference's insertion-order tiebreak — so we keep explicit
    first-insertion order and scatter with np.add.at."""

    def __init__(self):
        self._index: dict[str, int] = {}
        self._vals: list[float] = []

    def scatter(self, nodes: np.ndarray, deltas: np.ndarray) -> None:
        idx = np.empty(len(nodes), dtype=np.int64)
        for i, n in enumerate(nodes):  # dict lookups; n ≪ edges per batch
            j = self._index.get(n)
            if j is None:
                j = len(self._vals)
                self._index[n] = j
                self._vals.append(0.0)
            idx[i] = j
        arr = np.asarray(self._vals, dtype=np.float64)
        np.add.at(arr, idx, deltas)
        self._vals = arr.tolist()

    def get(self, node: str) -> float:
        j = self._index.get(node)
        return self._vals[j] if j is not None else 0.0

    def set(self, node: str, value: float) -> None:
        self.scatter(np.array([node], dtype=object), np.array([0.0]))
        self._vals[self._index[node]] = value

    def items(self):
        for n, j in self._index.items():
            yield n, self._vals[j]

    def to_dict(self) -> dict:
        return {n: self._vals[j] for n, j in self._index.items()}

    def argmax_over(self, threshold: float, exclude: set | None = None):
        """First-inserted strict argmax above threshold (reference tiebreak)."""
        best, best_v = None, threshold
        for n, j in self._index.items():
            v = self._vals[j]
            if exclude is not None and n in exclude:
                continue
            if v > best_v:
                best, best_v = n, v
        return best, best_v


class VecHaircut(VecStrategy):
    name = "Haircut"

    def __init__(self, source, min_weight=1e-3, **_: Any):
        super().__init__(source)
        self.min_weight = float(min_weight)
        self.weights = _OrderedFloatState()
        self.weights.set(source, 1.0)
        self.visited = {source}

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        outs = batch[batch["from"] == node]
        values = outs["value"].to_numpy(dtype=np.float64)
        total = values.sum()
        if total == 0:
            return
        w_node = self.weights.get(node)
        self.weights.set(node, 0.0)
        self.weights.scatter(outs["to"].to_numpy(), w_node * values / total)

    def pop(self):
        best, best_v = None, 0.0
        for n, v in self.weights.items():
            if v < self.min_weight or n in self.visited:
                continue
            if v > best_v:
                best, best_v = n, v
        self.visited.add(best)
        if best is None:
            return None, {}
        return best, {"weight": best_v}

    def ranks(self):
        return self.weights.to_dict()

    def state_rows(self):
        d = self.weights.to_dict()
        return pd.DataFrame({"node": list(d), "r": list(d.values()), "p": 0.0})


class VecAppr(VecStrategy):
    name = "APPR"

    def __init__(self, source, alpha=0.15, epsilon=1e-5, **_: Any):
        super().__init__(source)
        self.alpha = float(alpha)
        self.epsilon = float(epsilon)
        self.r = _OrderedFloatState()
        self.r.set(source, 1.0)
        self.p = _OrderedFloatState()
        self.dists: dict[str, tuple[np.ndarray, float]] = {}  # node → (nbrs, share)

    def _push_known(self, node: str) -> None:
        r_node = self.r.get(node)
        self.r.set(node, 0.0)
        self.p.scatter(np.array([node], dtype=object), np.array([r_node * self.alpha]))
        nbrs, share = self.dists[node]
        if len(nbrs):
            self.r.scatter(nbrs, np.full(len(nbrs), share * r_node))

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        if self.r.get(node) == 0:
            return
        if node not in self.dists:
            endpoints = np.concatenate([batch["from"].to_numpy(), batch["to"].to_numpy()])
            # first-appearance distinct order, interleaved (from_i, to_i)
            inter = np.empty(2 * len(batch), dtype=object)
            inter[0::2] = batch["from"].to_numpy()
            inter[1::2] = batch["to"].to_numpy()
            _, first_idx = np.unique(inter, return_index=True)
            ordered = inter[np.sort(first_idx)]
            nbrs = ordered[ordered != node]
            share = (1 - self.alpha) / len(nbrs) if len(nbrs) else 0.0
            self.dists[node] = (nbrs, share)
        self._push_known(node)

    def pop(self):
        while True:
            target = None
            for n, v in self.r.items():
                if v > self.epsilon and len(self.dists.get(n, ((), 0))[0]) > 0 and n in self.dists:
                    target = n
                    break
            if target is None:
                break
            self._push_known(target)
        best, best_v = self.r.argmax_over(self.epsilon)
        if best is None:
            return None, {}
        return best, {"residual": best_v}

    def ranks(self):
        return self.p.to_dict()

    def state_rows(self):
        r, p = self.r.to_dict(), self.p.to_dict()
        nodes = list(dict.fromkeys(list(r) + list(p)))
        return pd.DataFrame({
            "node": nodes,
            "r": [r.get(n, 0.0) for n in nodes],
            "p": [p.get(n, 0.0) for n in nodes],
        })


class _VecTtrScalar(VecStrategy):
    """Shared core of TTRBase/TTRWeight: scalar residual map."""

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **_: Any):
        super().__init__(source)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self.r = _OrderedFloatState()
        self.r.set(source, 1.0)
        self.p = _OrderedFloatState()

    def _shares(self, batch: pd.DataFrame, node: str, forward: bool) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        moving = self.r.get(node)
        self.r.set(node, 0.0)
        self.p.scatter(np.array([node], dtype=object), np.array([self.alpha * moving]))
        for forward in (True, False):
            targets, shares = self._shares(batch, node, forward)
            if len(targets):
                coeff = (1 - self.alpha) * (self.beta if forward else 1 - self.beta)
                self.r.scatter(targets, coeff * moving * shares)

    def pop(self):
        best, best_v = self.r.argmax_over(self.epsilon)
        if best is None:
            return None, {}
        return best, {"residual": best_v}

    def ranks(self):
        return self.p.to_dict()

    def state_rows(self):
        r, p = self.r.to_dict(), self.p.to_dict()
        nodes = list(dict.fromkeys(list(r) + list(p)))
        return pd.DataFrame({
            "node": nodes,
            "r": [r.get(n, 0.0) for n in nodes],
            "p": [p.get(n, 0.0) for n in nodes],
        })


class VecTtrBase(_VecTtrScalar):
    name = "TTRBase"

    def _shares(self, batch, node, forward):
        side = batch[batch["from" if forward else "to"] == node]
        targets = side["to" if forward else "from"].to_numpy()
        n = len(targets)
        return targets, (np.full(n, 1.0 / n) if n else np.array([]))


class VecTtrWeight(_VecTtrScalar):
    name = "TTRWeight"

    def _shares(self, batch, node, forward):
        side = batch[batch["from" if forward else "to"] == node]
        targets = side["to" if forward else "from"].to_numpy()
        values = side["value"].to_numpy(dtype=np.float64)
        total = values.sum()
        if total <= 0:
            return np.array([], dtype=object), np.array([])
        return targets, values / total


class VecTtrTime(VecStrategy):
    """TTRTime with searchsorted/cumsum temporal distribution.

    Residual chips live in a (node, ts, val) frame; the two-pointer
    suffix/prefix logic of the oracle becomes: W per chip via suffix/
    prefix cumsum over eligible edges, density per edge via cumsum over
    chips with strictly earlier (fwd) / later (bwd) timestamps."""

    name = "TTRTime"

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **_: Any):
        super().__init__(source)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self.p = _OrderedFloatState()
        self.chips: dict[str, dict[int, float]] = {}
        self._node_order: dict[str, None] = {}
        self._seeded = False

    def _chips_of(self, node):
        self._node_order.setdefault(node, None)
        return self.chips.setdefault(node, {})

    def _add_chip(self, node, ts, val):
        d = self._chips_of(node)
        d[ts] = d.get(ts, 0.0) + val

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        self._chips_of(node)
        if node == self.source and not self._seeded:
            self._seed(batch)
            return
        chips = self.chips[node]
        self.chips[node] = {}
        self.p.scatter(
            np.array([node], dtype=object),
            np.array([self.alpha * float(np.sum(list(chips.values())) if chips else 0.0)]),
        )
        self._flow(node, batch, chips, forward=True)
        self._flow(node, batch, chips, forward=False)

    def _seed(self, batch: pd.DataFrame) -> None:
        import sys

        self._seeded = True
        self.p.set(self.source, self.alpha)
        is_out = (batch["from"] == self.source).to_numpy()
        is_in_any = (batch["to"] == self.source).to_numpy()
        values = batch["value"].to_numpy(dtype=np.float64)
        ts = batch["timeStamp"].to_numpy(dtype=np.int64)
        out_total, in_total = values[is_out].sum(), values[is_in_any].sum()
        src = self._chips_of(self.source)
        # per-edge assignment in EDGE order (from-branch first): chips at
        # the same timestamp are overwritten by the LAST edge, so group
        # order (all-out then all-in) would pick the wrong winner. This
        # one-time seed loop is per-row by necessity; every later push is
        # fully vectorized.
        out_coeff = (1 - self.alpha) * self.beta
        in_coeff = (1 - self.alpha) * (1 - self.beta)
        for f_src, t_src, t, v in zip(is_out, is_in_any, ts, values):
            if f_src and out_total != 0:
                src[int(t)] = out_coeff * v / out_total
            elif t_src and in_total != 0:
                src[int(t)] = in_coeff * v / in_total
        if out_total == 0:
            src[0] = (1 - self.alpha) * self.beta
        if in_total == 0:
            src[sys.maxsize] = (1 - self.alpha) * (1 - self.beta)

    def _flow(self, node, batch: pd.DataFrame, chips: dict, forward: bool) -> None:
        share = self.beta if forward else (1 - self.beta)
        coeff = (1 - self.alpha) * share
        side = batch[batch["from" if forward else "to"] == node].sort_values(
            "timeStamp", kind="mergesort"
        )
        e_ts = side["timeStamp"].to_numpy(dtype=np.int64)
        e_val = side["value"].to_numpy(dtype=np.float64)
        targets = side["to" if forward else "from"].to_numpy()
        c_items = sorted(chips.items())
        # int64, NOT float64: the sys.maxsize sentinel chip (2^63-1) would
        # round to 2^63 in a double and land on the wrong timestamp key
        c_ts = np.array([t for t, _ in c_items], dtype=np.int64)
        c_val = np.array([v for _, v in c_items], dtype=np.float64)

        if len(c_items) == 0:
            return
        if forward:
            # W[chip] = Σ value of edges strictly after the chip
            pos = np.searchsorted(e_ts, c_ts, side="right")
            suffix = np.concatenate([np.cumsum(e_val[::-1])[::-1], [0.0]])
            W = suffix[pos]
            consumed = c_ts < (e_ts[-1] if len(e_ts) else np.iinfo(np.int64).min)
        else:
            # W[chip] = Σ value of edges strictly before the chip
            pos = np.searchsorted(e_ts, c_ts, side="left")
            prefix = np.concatenate([[0.0], np.cumsum(e_val)])
            W = prefix[pos]
            consumed = c_ts > (e_ts[0] if len(e_ts) else np.iinfo(np.int64).max)

        contrib = np.where(W > 0, c_val / np.where(W > 0, W, 1.0), 0.0)
        if len(e_ts):
            if forward:
                k = np.searchsorted(c_ts, e_ts, side="left")  # chips with ts < edge
                density = np.concatenate([[0.0], np.cumsum(contrib)])[k]
            else:
                k = np.searchsorted(c_ts, e_ts, side="right")  # chips with ts > edge
                rev = np.concatenate([[0.0], np.cumsum(contrib[::-1])])
                density = rev[len(c_ts) - k]
            inc = coeff * e_val * density
            for tgt, t, v in zip(targets, e_ts, inc):
                self._add_chip(tgt, int(t), float(v))
        # chips with no eligible edge recycle to the node itself
        # (iterate the original int keys — no dtype round trips)
        for keep, (t, v) in zip(~consumed, c_items):
            if keep:
                self._add_chip(node, t, coeff * float(v))

    def pop(self):
        best, best_v = None, self.epsilon
        for n in self._node_order:
            total = float(np.sum(list(self.chips.get(n, {}).values()) or [0.0]))
            if total > best_v:
                best, best_v = n, total
        if best is None:
            return None, {}
        return best, {"residual": best_v}

    def ranks(self):
        return self.p.to_dict()

    def state_rows(self):
        p = self.p.to_dict()
        nodes = list(self._node_order)
        return pd.DataFrame({
            "node": nodes,
            "r": [float(np.sum(list(self.chips.get(n, {}).values()) or [0.0])) for n in nodes],
            "p": [p.get(n, 0.0) for n in nodes],
        })


class VecTtrRedirect(VecStrategy):
    """TTRRedirect: the swap-leg redirect walk is a genuine sequential
    data dependency (stack DFS over per-symbol indexes, SURVEY A11), so
    the engine runs the oracle kernel per node group — this is exactly
    what the applyInPandas grouped kernel executes."""

    name = "TTRRedirect"

    def __init__(self, source, **kw: Any):
        super().__init__(source)
        self._kernel = TtrRedirectOracle(source, **kw)

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        edges = batch.to_dict("records")
        self._kernel.push(node, edges, **ctx)

    def pop(self):
        return self._kernel.pop()

    def ranks(self):
        return self._kernel.ranks()

    def state_rows(self):
        snap = self._kernel.snapshot()
        nodes = list(dict.fromkeys(list(snap["r"]) + list(snap["p"])))
        return pd.DataFrame({
            "node": nodes,
            "r": [snap["r"].get(n, 0.0) for n in nodes],
            "p": [snap["p"].get(n, 0.0) for n in nodes],
        })


VEC_REGISTRY = {
    "BFS": VecBfs,
    "Poison": VecPoison,
    "Haircut": VecHaircut,
    "APPR": VecAppr,
    "TTRBase": VecTtrBase,
    "TTRWeight": VecTtrWeight,
    "TTRTime": VecTtrTime,
    "TTRRedirect": VecTtrRedirect,
}
