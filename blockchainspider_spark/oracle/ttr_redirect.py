"""Golden oracle for the TTRRedirect strategy.

Behavioral parity target: public BlockchainSpider strategies/txs/ttr.py
lines 334-825. Edges sharing a transaction ``hash`` are merged into one
"swap" whose per-(symbol,address) profits cancel; residual chips carry
``(value, timestamp, symbol)`` and flow to the counterparty legs of the
swap (redirect), discovered via a stack walk over per-symbol edge
indexes.

Reference quirks preserved (marked QUIRK):
* the backward pass builds its per-symbol distribution index from
  *output* profits (mirroring the forward pass verbatim);
* the per-(i) distribution index advances at most one step per slot;
* sum-collection checks ``to`` before ``from`` while the scatter loop
  checks ``from`` first, so self-loop edges on the source count into
  ``in_sum`` but scatter through the out branch;
* a sign flip during profit cancellation adopts the *incoming* profit's
  timestamp.

Determinism refinement: the reference iterates a ``set`` of symbols when
seeding the source (hash-randomized); this oracle uses first-appearance
order. A division-by-zero the reference would crash on (empty redirect
set) is skipped instead.
"""

from __future__ import annotations

from typing import Any

from blockchainspider_spark.functions.redirect_walk import (
    Profit as _Profit,
    redirect_targets as _walk_targets,
    symbol_index as _walk_index,
)
from blockchainspider_spark.oracle.strategies import Edge
from blockchainspider_spark.oracle.ttr import MAX_TS, _TtrCommon


class _Swap:
    """All transfers of one tx hash, with per-(symbol,address) net profits."""

    def __init__(self, tx_hash: str, profits: list[_Profit]):
        self.hash = tx_hash
        self.profits = profits

    def merge(self, older: "_Swap | None") -> "_Swap":
        if older is None:
            return self
        netted: dict = {}
        for profit in self.profits + older.profits:
            key = (profit.symbol, profit.address)
            held = netted.get(key)
            if held is None:
                if profit.value != 0:
                    netted[key] = profit
                continue
            total = held.value + profit.value
            if total == 0:
                del netted[key]
                continue
            if (held.value > 0) != (total > 0):  # sign flip → adopt newcomer
                held = profit
            held.value = total
            netted[key] = held
        self.profits = list(netted.values())
        return self

    def outputs(self) -> list[_Profit]:
        return [p for p in self.profits if p.value < 0]

    def inputs(self) -> list[_Profit]:
        return [p for p in self.profits if p.value > 0]

    def timestamp(self):
        return self.profits[0].timestamp if self.profits else 0


class TtrRedirectOracle(_TtrCommon):
    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **_: Any):
        super().__init__(source, alpha, beta, epsilon)
        self._seeded = False

    # ----- edge aggregation ------------------------------------------------

    def _aggregate(self, node, edges: list[Edge]) -> list[_Swap]:
        by_hash: dict = {}
        for e in edges:
            h = e.get("hash")
            counterparty = e.get("to") if e.get("from") == node else e.get("from")
            signed = -e.get("value") if e.get("from") == node else e.get("value")
            swap = _Swap(h, [_Profit(counterparty, signed, e.get("timeStamp"), e.get("symbol"))])
            swap = swap.merge(by_hash.get(h))
            by_hash[h] = swap
            if not swap.profits:
                del by_hash[h]
        return list(by_hash.values())

    # ----- push ------------------------------------------------------------

    def push(self, node, edges: list[Edge], **ctx: Any) -> None:
        if self.r.get(node) is None:
            self.r[node] = []

        if node == self.source and not self._seeded:
            self._seed_source(edges)
            return

        chips = self.r[node]
        chips.sort(key=lambda c: c.get("timestamp", 0))
        self.r[node] = []

        swaps = self._aggregate(node, edges)
        swaps.sort(key=lambda s: s.timestamp())

        self.p[node] = self.p.get(node, 0) + self.alpha * sum(c.get("value", 0) for c in chips)
        self._forward(node, swaps, chips)
        self._backward(node, swaps, chips)

        # merge chips node-wide by (symbol, timestamp)
        for nd, nd_chips in self.r.items():
            merged: dict = {}
            for chip in nd_chips:
                key = (chip.get("symbol"), chip.get("timestamp"))
                if key in merged:
                    merged[key]["value"] += chip.get("value", 0)
                else:
                    merged[key] = chip
            self.r[nd] = list(merged.values())

    def _seed_source(self, edges: list[Edge]) -> None:
        self._seeded = True
        in_sum: dict = {}
        out_sum: dict = {}
        symbols_ordered: list = []
        symbols_seen: set = set()
        for e in edges:
            sym = e.get("symbol")
            if sym not in symbols_seen:
                symbols_seen.add(sym)
                symbols_ordered.append(sym)
            if e.get("to") == self.source:
                in_sum[sym] = in_sum.get(sym, 0) + e.get("value", 0)
            elif e.get("from") == self.source:
                out_sum[sym] = out_sum.get(sym, 0) + e.get("value", 0)

        self.p[self.source] = self.alpha * len(symbols_ordered)

        for e in edges:
            sym = e.get("symbol")
            if e.get("from") == self.source and out_sum.get(sym, 0) != 0:
                tgt = e.get("to")
                if self.r.get(tgt) is None:
                    self.r[tgt] = []
                val = (1 - self.alpha) * self.beta * e.get("value", 0) / out_sum[sym]
                if val > 0:
                    self.r[tgt].append(dict(value=val, timestamp=e.get("timeStamp"), symbol=sym))
            elif e.get("to") == self.source and in_sum.get(sym, 0) != 0:
                tgt = e.get("from")
                if self.r.get(tgt) is None:
                    self.r[tgt] = []
                val = (1 - self.alpha) * (1 - self.beta) * e.get("value", 0) / in_sum[sym]
                if val > 0:
                    self.r[tgt].append(dict(value=val, timestamp=e.get("timeStamp"), symbol=sym))

        for sym in symbols_ordered:
            if out_sum.get(sym, 0) == 0:
                self.r[self.source].append(
                    dict(value=(1 - self.alpha) * self.beta, timestamp=0, symbol=sym)
                )
            elif in_sum.get(sym, 0) == 0:
                self.r[self.source].append(
                    dict(value=(1 - self.alpha) * (1 - self.beta), timestamp=MAX_TS, symbol=sym)
                )

    # ----- distribution index (shared A11 kernel: functions/redirect_walk) ---

    def _symbol_index(self, swaps: list[_Swap], forward: bool):
        return _walk_index(swaps, forward)

    def _redirect_targets(
        self, direction: int, symbol: str, start: int,
        swaps: list[_Swap], dist_idx: dict, sym_idx: dict, chip_value: float,
    ) -> list[_Profit]:
        return _walk_targets(direction, symbol, start, swaps, dist_idx,
                             sym_idx, chip_value, self.epsilon)

    # ----- forward / backward ------------------------------------------------

    def _forward(self, node, swaps: list[_Swap], chips: list[dict]) -> None:
        if not chips:
            return
        # per-chip eligible weight: Σ output-profit value of later swaps
        W: dict = {}
        j, acc = len(swaps) - 1, {}
        for i in range(len(chips) - 1, -1, -1):
            c = chips[i]
            while j >= 0 and swaps[j].timestamp() > c.get("timestamp", 0):
                for profit in swaps[j].outputs():
                    acc[profit.symbol] = acc.get(profit.symbol, 0) + profit.value
                j -= 1
            W[i] = acc.get(c.get("symbol"), 0)

        sym_idx, dist_idx = self._symbol_index(swaps, forward=True)

        j, density = 0, {}
        for i, swap in enumerate(swaps):
            outs = swap.outputs()
            if not outs:
                continue
            while j < len(chips) and swap.timestamp() > chips[j].get("timestamp", 0):
                c = chips[j]
                inc_d = (c.get("value", 0) / W[j]) if W[j] != 0 else 0
                density[c.get("symbol")] = density.get(c.get("symbol"), 0) + inc_d
                j += 1
            for profit in outs:
                inc = (1 - self.alpha) * self.beta * profit.value * density.get(profit.symbol, 0)
                if inc == 0:
                    continue
                targets = self._redirect_targets(-1, profit.symbol, i, swaps, dist_idx, sym_idx, inc)
                if not targets:  # reference would ZeroDivisionError here
                    continue
                for t in targets:
                    if self.r.get(t.address) is None:
                        self.r[t.address] = []
                    self.r[t.address].append(
                        dict(value=inc / len(targets), symbol=t.symbol, timestamp=t.timestamp)
                    )

        leftovers: dict = {}
        while j < len(chips):
            c = chips[j]
            key = (c.get("symbol"), c.get("timestamp"))
            leftovers[key] = leftovers.get(key, 0) + (1 - self.alpha) * self.beta * c.get("value", 0)
            j += 1
        for (sym, ts), val in leftovers.items():
            self.r[node].append(dict(value=val, symbol=sym, timestamp=ts))

    def _backward(self, node, swaps: list[_Swap], chips: list[dict]) -> None:
        if not chips:
            return
        W: dict = {}
        j, acc = 0, {}
        for i in range(len(chips)):
            c = chips[i]
            while j < len(swaps) and swaps[j].timestamp() < c.get("timestamp", 0):
                for profit in swaps[j].inputs():
                    acc[profit.symbol] = acc.get(profit.symbol, 0) + profit.value
                j += 1
            W[i] = acc.get(c.get("symbol"), 0)

        sym_idx, dist_idx = self._symbol_index(swaps, forward=False)

        j, density = len(chips) - 1, {}
        for i in range(len(swaps) - 1, -1, -1):
            swap = swaps[i]
            ins = swap.inputs()
            if not ins:
                continue
            while j >= 0 and swap.timestamp() < chips[j].get("timestamp", 0):
                c = chips[j]
                inc_d = (c.get("value", 0) / W[j]) if W[j] != 0 else 0
                density[c.get("symbol")] = density.get(c.get("symbol"), 0) + inc_d
                j -= 1
            for profit in ins:
                inc = (1 - self.alpha) * (1 - self.beta) * profit.value * density.get(profit.symbol, 0)
                if inc == 0:
                    continue
                targets = self._redirect_targets(1, profit.symbol, i, swaps, dist_idx, sym_idx, inc)
                if not targets:
                    continue
                for t in targets:
                    if self.r.get(t.address) is None:
                        self.r[t.address] = []
                    self.r[t.address].append(
                        dict(value=inc / len(targets), symbol=t.symbol, timestamp=t.timestamp)
                    )

        leftovers: dict = {}
        while j >= 0:
            c = chips[j]
            key = (c.get("symbol"), c.get("timestamp"))
            leftovers[key] = leftovers.get(key, 0) + (1 - self.alpha) * (1 - self.beta) * c.get("value", 0)
            j -= 1
        for (sym, ts), val in leftovers.items():
            self.r[node].append(dict(value=val, symbol=sym, timestamp=ts))

    # ----- pop / snapshot ----------------------------------------------------

    def pop(self) -> tuple[Any, dict]:
        best, best_r = None, self.epsilon
        for cand, chips in self.r.items():
            total = 0
            for chip in chips:
                total += chip.get("value", 0)
            if total > best_r:
                best, best_r = cand, total
        if best is None:
            return None, {}
        return best, {"residual": best_r, "allow_all_tokens": True}

    def snapshot(self) -> dict:
        data = super().snapshot()
        data["r"] = {n: sum(c.get("value", 0) for c in chips) for n, chips in self.r.items()}
        return data
