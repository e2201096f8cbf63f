"""Golden oracle for the TTR (transaction-tracing rank) strategy family.

Behavioral parity targets (public BlockchainSpider algorithms):

* ``TtrBaseOracle``     ≅ strategies/txs/ttr.py:39-99   (fan-out counts)
* ``TtrWeightOracle``   ≅ strategies/txs/ttr.py:102-161 (value weighted)
* ``TtrTimeOracle``     ≅ strategies/txs/ttr.py:164-331 (temporal chips)
* ``TtrRedirectOracle`` ≅ strategies/txs/ttr.py:334-825 (profit redirect)

All float additions happen in the reference's iteration order (edge
arrival order; dict insertion order), so rank vectors agree bit-for-bit
with a faithful sequential run, not merely to rounding tolerance.
Reference quirks preserved on purpose (each marked QUIRK below).
"""

from __future__ import annotations

import sys
from typing import Any

from blockchainspider_spark.oracle.strategies import Edge, OracleBase

MAX_TS = sys.maxsize


class _TtrCommon(OracleBase):
    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **_: Any):
        super().__init__(source)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.epsilon = float(epsilon)
        self.p: dict = {}
        self.r: dict = {}

    def snapshot(self) -> dict:
        return {
            "source": self.source,
            "alpha": self.alpha,
            "beta": self.beta,
            "epsilon": self.epsilon,
            "r": self.r,
            "p": self.p,
        }

    def ranks(self) -> dict:
        return self.p

    def _argmax_scalar(self) -> tuple[Any, dict]:
        best, best_r = None, self.epsilon
        for cand, r_cand in self.r.items():
            if r_cand > best_r:
                best, best_r = cand, r_cand
        return (None, {}) if best is None else (best, {"residual": best_r})


class TtrBaseOracle(_TtrCommon):
    """Residual split by directed edge *count* (β forward, 1−β backward)."""

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **kw: Any):
        super().__init__(source, alpha, beta, epsilon)
        self.r[source] = 1.0

    def push(self, node, edges: list[Edge], **ctx: Any) -> None:
        if self.r.get(node) is None:
            self.r[node] = 0
        moving = self.r[node]
        self.r[node] = 0
        self.p[node] = self.p.get(node, 0) + self.alpha * moving

        outs = [e for e in edges if e["from"] == node]
        for e in outs:
            inc = (1 - self.alpha) * self.beta * moving / len(outs) if outs else 0
            self.r[e["to"]] = self.r.get(e["to"], 0) + inc
        ins = [e for e in edges if e["to"] == node]
        for e in ins:
            inc = (1 - self.alpha) * (1 - self.beta) * moving / len(ins) if ins else 0
            self.r[e["from"]] = self.r.get(e["from"], 0) + inc

    def pop(self) -> tuple[Any, dict]:
        return self._argmax_scalar()


class TtrWeightOracle(_TtrCommon):
    """Residual split proportional to edge *values* per direction."""

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **kw: Any):
        super().__init__(source, alpha, beta, epsilon)
        self.r[source] = 1.0

    def push(self, node, edges: list[Edge], **ctx: Any) -> None:
        if self.r.get(node) is None:
            self.r[node] = 0
        moving = self.r[node]
        self.r[node] = 0
        self.p[node] = self.p.get(node, 0) + self.alpha * moving

        out_total, outs = 0, []
        for e in edges:
            if e["from"] == node:
                out_total += e["value"]
                outs.append(e)
        for e in outs:
            inc = (1 - self.alpha) * self.beta * (e["value"] / out_total) * moving if out_total > 0 else 0
            self.r[e["to"]] = self.r.get(e["to"], 0) + inc

        in_total, ins = 0, []
        for e in edges:
            if e["to"] == node:
                in_total += e["value"]
                ins.append(e)
        for e in ins:
            inc = (1 - self.alpha) * (1 - self.beta) * (e["value"] / in_total) * moving if in_total > 0 else 0
            self.r[e["from"]] = self.r.get(e["from"], 0) + inc

    def pop(self) -> tuple[Any, dict]:
        return self._argmax_scalar()


class TtrTimeOracle(_TtrCommon):
    """Temporal TTR: residual held as {timestamp: value} chips; a chip only
    flows along edges that occur *after* it (forward) / *before* it
    (backward); chips with no eligible edge recycle to the node itself."""

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **kw: Any):
        super().__init__(source, alpha, beta, epsilon)
        self._seeded = False

    def push(self, node, edges: list[Edge], **ctx: Any) -> None:
        if self.r.get(node) is None:
            self.r[node] = {}

        if node == self.source and not self._seeded:
            self._seed_source(edges)
            return

        chips = self.r[node]
        self.r[node] = {}
        self.p[node] = self.p.get(node, 0) + self.alpha * sum(chips.values())
        self._flow(node, edges, chips, forward=True)
        self._flow(node, edges, chips, forward=False)

    def _seed_source(self, edges: list[Edge]) -> None:
        self._seeded = True
        self.p[self.source] = self.alpha  # QUIRK: assignment, not +=
        out_total = sum(e["value"] if e["from"] == self.source else 0 for e in edges)
        in_total = sum(e["value"] if e["to"] == self.source else 0 for e in edges)
        for e in edges:
            # QUIRK: plain assignment — a later edge at the same timestamp
            # overwrites the earlier chip rather than accumulating.
            if e["from"] == self.source and out_total != 0:
                self.r[self.source][e["timeStamp"]] = (
                    (1 - self.alpha) * self.beta * e["value"] / out_total
                )
            elif e["to"] == self.source and in_total != 0:
                self.r[self.source][e["timeStamp"]] = (
                    (1 - self.alpha) * (1 - self.beta) * e["value"] / in_total
                )
        if out_total == 0:
            self.r[self.source][0] = (1 - self.alpha) * self.beta
        if in_total == 0:
            self.r[self.source][MAX_TS] = (1 - self.alpha) * (1 - self.beta)

    def _flow(self, node, edges: list[Edge], chips: dict, forward: bool) -> None:
        """Two-pointer temporal distribution, shared by both directions.

        forward: chips flow to later out-edges, weighted by edge value ×
        cumulative (chip/W) density d; W[chip] = Σ value of out-edges
        strictly after the chip. backward: mirror image on in-edges.
        """
        share = self.beta if forward else (1 - self.beta)
        if forward:
            flow_edges = sorted((e for e in edges if e["from"] == node), key=lambda e: e["timeStamp"])
        else:
            flow_edges = sorted((e for e in edges if e["to"] == node), key=lambda e: e["timeStamp"])
        chip_list = sorted(chips.items(), key=lambda c: c[0])

        # W: per chip, total eligible edge value (after it fwd / before it bwd)
        W: dict = {}
        if forward:
            j, acc = len(flow_edges) - 1, 0
            for i in range(len(chip_list) - 1, -1, -1):
                ts = chip_list[i][0]
                while j >= 0 and flow_edges[j]["timeStamp"] > ts:
                    acc += flow_edges[j]["value"]
                    j -= 1
                W[chip_list[i]] = acc
        else:
            j, acc = 0, 0
            for i in range(len(chip_list)):
                ts = chip_list[i][0]
                while j < len(flow_edges) and flow_edges[j]["timeStamp"] < ts:
                    acc += flow_edges[j]["value"]
                    j += 1
                W[chip_list[i]] = acc

        # distribute density d over edges in temporal order
        if forward:
            j, density = 0, 0
            for e in flow_edges:
                while j < len(chip_list) and e["timeStamp"] > chip_list[j][0]:
                    c = chip_list[j]
                    density += (c[1] / W[c]) if W[c] > 0 else 0
                    j += 1
                tgt = e["to"]
                if self.r.get(tgt) is None:
                    self.r[tgt] = {}
                inc = (1 - self.alpha) * share * e["value"] * density
                self.r[tgt][e["timeStamp"]] = self.r[tgt].get(e["timeStamp"], 0) + inc
            # leftover chips (no later edge) recycle to self
            while j < len(chip_list):
                ts, val = chip_list[j]
                self.r[node][ts] = self.r[node].get(ts, 0) + (1 - self.alpha) * share * val
                j += 1
        else:
            j, density = len(chip_list) - 1, 0
            for i in range(len(flow_edges) - 1, -1, -1):
                e = flow_edges[i]
                while j >= 0 and e["timeStamp"] < chip_list[j][0]:
                    c = chip_list[j]
                    density += (c[1] / W[c]) if W[c] > 0 else 0
                    j -= 1
                tgt = e["from"]
                if self.r.get(tgt) is None:
                    self.r[tgt] = {}
                inc = (1 - self.alpha) * share * e["value"] * density
                self.r[tgt][e["timeStamp"]] = self.r[tgt].get(e["timeStamp"], 0) + inc
            while j >= 0:
                ts, val = chip_list[j]
                self.r[node][ts] = self.r[node].get(ts, 0) + (1 - self.alpha) * share * val
                j -= 1

    def pop(self) -> tuple[Any, dict]:
        best, best_r = None, self.epsilon
        for cand, chips in self.r.items():
            total = 0
            for v in chips.values():
                total += v
            if total > best_r:
                best, best_r = cand, total
        if best is None:
            return None, {}
        return best, {"residual": best_r}

    def snapshot(self) -> dict:
        data = super().snapshot()
        data["r"] = {n: sum(ch.values()) for n, ch in self.r.items()}
        return data
