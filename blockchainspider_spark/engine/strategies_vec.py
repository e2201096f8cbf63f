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

from blockchainspider_spark.functions.redirect_walk import Profit as _Profit


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
        if best is None:
            return None, {}
        self.visited.add(best)
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
        """Drain/cached-path push: the oracle's ``_scatter`` computes
        ``d * r_node`` with ``d = (1-alpha)/degree`` — multiply in THAT
        order (share first) for bit parity (oracle/strategies.py:235)."""
        r_node = self.r.get(node)
        self.r.set(node, 0.0)
        self.p.scatter(np.array([node], dtype=object), np.array([r_node * self.alpha]))
        nbrs, share = self.dists[node]
        if len(nbrs):
            self.r.scatter(nbrs, np.full(len(nbrs), share * r_node))

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        r_node = self.r.get(node)
        if r_node == 0:
            return
        if node not in self.dists:
            # FIRST push of a node mirrors the oracle's uncached branch
            # (oracle/strategies.py:251-255): the increment is computed as
            # ``(1-alpha) * r_node / degree`` — a DIFFERENT float rounding
            # than the cached ``((1-alpha)/degree) * r_node`` used on every
            # later drain. Replicating both expressions exactly is what
            # keeps ulp-level residual ties (and therefore the
            # insertion-order pop tiebreak) identical to the oracle —
            # the round-4 hypothesis counterexample flipped on this.
            # first-appearance distinct order, interleaved (from_i, to_i)
            inter = np.empty(2 * len(batch), dtype=object)
            inter[0::2] = batch["from"].to_numpy()
            inter[1::2] = batch["to"].to_numpy()
            _, first_idx = np.unique(inter, return_index=True)
            ordered = inter[np.sort(first_idx)]
            nbrs = ordered[ordered != node]
            degree = len(nbrs)
            share = (1 - self.alpha) / degree if degree else 0.0
            self.dists[node] = (nbrs, share)
            self.r.set(node, 0.0)
            self.p.scatter(
                np.array([node], dtype=object), np.array([r_node * self.alpha]))
            if degree:
                inc = (1 - self.alpha) * r_node / degree
                self.r.scatter(nbrs, np.full(degree, inc))
            return
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


class _EngineSwap:
    """Minimal swap container for the shared A11 walk (duck-typed:
    ``profits`` list of redirect_walk.Profit, newest leg first)."""

    __slots__ = ("profits",)

    def __init__(self, profits):
        self.profits = profits

    def timestamp(self):
        return self.profits[0].timestamp if self.profits else 0


class VecTtrRedirect(VecStrategy):
    """TTRRedirect, engine-side: the relational parts are independent
    array/dict-agg implementations — A9 symbol sums via np.add.at over
    symbol codes, A10 chip merges as a (symbol, ts)-keyed accumulator,
    the temporal W/density distribution via per-symbol searchsorted +
    cumsum (the VecTtrTime pattern). Only the genuinely sequential
    swap-leg walk (A11) is shared with the golden oracle
    (functions/redirect_walk), so the engine-vs-oracle equality tests
    compare two real implementations. Reference quirks (scan-order
    asymmetries, newest-first profit order, sign-flip timestamp
    adoption) are mirrored — see oracle/ttr_redirect.py's header."""

    name = "TTRRedirect"

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **_: Any):
        super().__init__(source)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self.p = _OrderedFloatState()
        # chips: node → {(symbol, ts): value} in first-appearance order (A10:
        # the oracle's per-push merge-by-(symbol,timestamp) is this store's
        # accumulation, applied eagerly)
        self.chips: dict[str, dict[tuple, float]] = {}
        self._seeded = False

    def _chips_of(self, node) -> dict:
        return self.chips.setdefault(node, {})

    def _add_chip(self, node, symbol, ts, val) -> None:
        d = self._chips_of(node)
        key = (symbol, ts)
        d[key] = d.get(key, 0.0) + val

    # ----- push --------------------------------------------------------------

    def push(self, node, batch: pd.DataFrame, **ctx: Any) -> None:
        self._chips_of(node)
        if node == self.source and not self._seeded:
            self._seed(batch)
            return
        self.push_swaps(node, self._aggregate(node, batch))

    def push_swaps(self, node, swaps: list["_EngineSwap"]) -> None:
        """Distribute pre-netted swaps for ``node`` — the tail of
        ``push`` after J8 netting. Split out so the wave engine's hub
        path can net a huge edge slice distributed (per hash bucket)
        and hand only the surviving swap legs to this sequential core.
        ``swaps`` must be in hash first-(re)creation scan order; the
        stable timestamp sort below then reproduces the reference's
        ordering exactly."""
        self._chips_of(node)
        chips_d = self.chips[node]
        self.chips[node] = {}
        # stable ts sort keeps first-appearance order among equal stamps
        c_items = sorted(chips_d.items(), key=lambda kv: kv[0][1])
        self.p.scatter(
            np.array([node], dtype=object),
            np.array([self.alpha * sum(v for _, v in c_items)]),
        )
        swaps.sort(key=lambda s: s.timestamp())
        self._distribute(node, swaps, c_items, forward=True)
        self._distribute(node, swaps, c_items, forward=False)

    # ----- A9: seed normalization (vectorized symbol sums) --------------------

    def _seed(self, batch: pd.DataFrame) -> None:
        self._seeded = True
        frm = batch["from"].to_numpy()
        to = batch["to"].to_numpy()
        val = batch["value"].to_numpy(dtype=np.float64)
        ts = batch["timeStamp"].to_numpy(dtype=np.int64)
        sym = batch["symbol"].to_numpy()

        symbols, codes = np.unique(sym, return_inverse=True)
        first_idx = np.sort(np.unique(sym, return_index=True)[1])
        symbols_ordered = list(sym[first_idx])
        # QUIRK (sum scan): `to` checked before `from` → self-loops on the
        # source count into in_sum only
        is_in = to == self.source
        is_out = (frm == self.source) & ~is_in
        in_sum = np.zeros(len(symbols))
        out_sum = np.zeros(len(symbols))
        np.add.at(in_sum, codes[is_in], val[is_in])
        np.add.at(out_sum, codes[is_out], val[is_out])
        in_of = dict(zip(symbols, in_sum))
        out_of = dict(zip(symbols, out_sum))

        self.p.set(self.source, self.alpha * len(symbols_ordered))

        out_coeff = (1 - self.alpha) * self.beta
        in_coeff = (1 - self.alpha) * (1 - self.beta)
        # QUIRK (scatter scan): `from` checked before `to` — edge-order loop
        # mirrors the reference's chip overwrite-by-append semantics
        for i in range(len(val)):
            s = sym[i]
            if frm[i] == self.source and out_of[s] != 0:
                v = out_coeff * val[i] / out_of[s]
                if v > 0:
                    self._add_chip(to[i], s, int(ts[i]), v)
            elif to[i] == self.source and in_of[s] != 0:
                v = in_coeff * val[i] / in_of[s]
                if v > 0:
                    self._add_chip(frm[i], s, int(ts[i]), v)
        import sys

        for s in symbols_ordered:
            if out_of.get(s, 0) == 0:
                self._add_chip(self.source, s, 0, out_coeff)
            elif in_of.get(s, 0) == 0:
                self._add_chip(self.source, s, sys.maxsize, in_coeff)

    # ----- J8: per-hash swap netting ------------------------------------------

    def _aggregate(self, node, batch: pd.DataFrame) -> list[_EngineSwap]:
        """Net signed profits per (hash, symbol, counterparty) with the
        reference's move-to-front + sign-flip-timestamp merge discipline
        (tracked here as move-to-end; profits emitted newest-first)."""
        frm = batch["from"].to_numpy()
        to = batch["to"].to_numpy()
        val = batch["value"].to_numpy(dtype=np.float64)
        ts = batch["timeStamp"].to_numpy(dtype=np.int64)
        sym = batch["symbol"].to_numpy()
        hsh = batch["hash"].to_numpy()
        counterparty = np.where(frm == node, to, frm)
        signed = np.where(frm == node, -val, val)

        legs_by_hash: dict = {}  # hash → {(sym, cp): [value, ts]} move-to-end
        for i in range(len(val)):
            h = hsh[i]
            legs = legs_by_hash.setdefault(h, {})
            key = (sym[i], counterparty[i])
            held = legs.pop(key, None)
            v, t = float(signed[i]), int(ts[i])
            if held is None:
                if v != 0:
                    legs[key] = [v, t]
            else:
                total = held[0] + v
                if total != 0:
                    # sign flip relative to the incoming edge adopts the
                    # accumulated (older) timestamp
                    legs[key] = [total, t if (v > 0) == (total > 0) else held[1]]
            if not legs:
                del legs_by_hash[h]
        out = []
        for legs in legs_by_hash.values():
            profits = [
                _Profit(cp, v, t, s)
                for (s, cp), (v, t) in reversed(list(legs.items()))
            ]
            out.append(_EngineSwap(profits))
        return out

    # ----- A7-shaped temporal distribution + A11 walk --------------------------

    def _distribute(self, node, swaps: list[_EngineSwap], c_items, forward: bool) -> None:
        if not c_items:
            return
        coeff = (1 - self.alpha) * (self.beta if forward else 1 - self.beta)
        sign = -1 if forward else 1  # forward distributes outputs (value<0)

        c_sym = np.array([k[0] for k, _ in c_items], dtype=object)
        c_ts = np.array([k[1] for k, _ in c_items], dtype=np.int64)
        c_val = np.array([v for _, v in c_items], dtype=np.float64)
        swap_ts = np.array([s.timestamp() for s in swaps], dtype=np.int64)

        # eligible-leg rows per symbol in scan order (swap asc, profit order)
        leg_rows: dict[str, list] = {}
        has_leg = np.zeros(len(swaps), dtype=bool)
        for i, s in enumerate(swaps):
            for prf in s.profits:
                if prf.value * sign > 0:
                    leg_rows.setdefault(prf.symbol, []).append((swap_ts[i], prf.value))
                    has_leg[i] = True

        # W per chip: Σ eligible-leg value strictly after (fwd) / before
        # (bwd) the chip, within the chip's symbol — suffix/prefix cumsums
        W = np.zeros(len(c_items))
        for s, rows in leg_rows.items():
            arr_ts = np.array([r[0] for r in rows], dtype=np.int64)
            arr_val = np.array([r[1] for r in rows], dtype=np.float64)
            mask = c_sym == s
            if forward:
                suffix = np.concatenate([np.cumsum(arr_val[::-1])[::-1], [0.0]])
                W[mask] = suffix[np.searchsorted(arr_ts, c_ts[mask], side="right")]
            else:
                prefix = np.concatenate([[0.0], np.cumsum(arr_val)])
                W[mask] = prefix[np.searchsorted(arr_ts, c_ts[mask], side="left")]

        contrib = np.where(W != 0, c_val / np.where(W != 0, W, 1.0), 0.0)

        # per-symbol chip index for density-at-swap lookups
        chip_idx: dict[str, tuple] = {}
        for s in set(c_sym.tolist()):
            mask = c_sym == s
            if forward:
                cum = np.concatenate([[0.0], np.cumsum(contrib[mask])])
            else:
                cum = np.concatenate([[0.0], np.cumsum(contrib[mask][::-1])])
            chip_idx[s] = (c_ts[mask], cum)

        from blockchainspider_spark.functions.redirect_walk import (
            redirect_targets,
            symbol_index,
        )

        sym_idx, dist_idx = symbol_index(swaps, forward=forward)

        for i, swap in enumerate(swaps):
            legs = [p for p in swap.profits if p.value * sign > 0]
            if not legs:
                continue
            for prf in legs:
                ts_s, cum = chip_idx.get(prf.symbol, (None, None))
                if ts_s is None:
                    continue
                if forward:
                    density = cum[np.searchsorted(ts_s, swap_ts[i], side="left")]
                else:
                    density = cum[len(ts_s) - np.searchsorted(ts_s, swap_ts[i], side="right")]
                inc = coeff * prf.value * density
                if inc == 0:
                    continue
                targets = redirect_targets(
                    sign, prf.symbol, i, swaps, dist_idx, sym_idx, inc, self.epsilon
                )
                if not targets:
                    continue
                share = inc / len(targets)
                for t in targets:
                    self._add_chip(t.address, t.symbol, t.timestamp, share)

        # unconsumed chips recycle to the node (leftovers)
        eligible_ts = swap_ts[has_leg]
        if forward:
            bound = eligible_ts.max() if len(eligible_ts) else np.iinfo(np.int64).min
            consumed = c_ts < bound
        else:
            bound = eligible_ts.min() if len(eligible_ts) else np.iinfo(np.int64).max
            consumed = c_ts > bound
        for keep, (key, v) in zip(~consumed, c_items):
            if keep:
                self._add_chip(node, key[0], key[1], coeff * v)

    # ----- pop / snapshot -------------------------------------------------------

    def pop(self):
        best, best_v = None, self.epsilon
        for n, d in self.chips.items():
            total = sum(d.values())
            if total > best_v:
                best, best_v = n, total
        if best is None:
            return None, {}
        return best, {"residual": best_v, "allow_all_tokens": True}

    def ranks(self):
        return self.p.to_dict()

    def state_rows(self):
        p = self.p.to_dict()
        nodes = list(dict.fromkeys(list(self.chips) + list(p)))
        return pd.DataFrame({
            "node": nodes,
            "r": [sum(self.chips.get(n, {}).values()) for n in nodes],
            "p": [p.get(n, 0.0) for n in nodes],
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
