"""Sequential crawl-loop simulator — the golden reference run.

Reproduces the reference push→pop cycle (spiders/txs/blockscan.py:138-168
+ middlewares/txs/push_pop.py:50-71): exactly one node in flight; each
cycle expands the node (all transfers touching it), adapts transfers to
edges, pushes into the strategy, snapshots, pops the next node. Expansion
order is the canonical scan order (block_number, timestamp, id) ascending
— the Etherscan `sort=asc` semantics (external.py:60) made total.

Outputs are the golden artifacts the Spark engine is asserted against:
``pop_log`` (crawl-order contract), ``seen`` (visited membership), and
``ranks`` per wave.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pandas as pd

from blockchainspider_spark.oracle.strategies import (
    ApprOracle,
    BfsOracle,
    HaircutOracle,
    PoisonOracle,
)
from blockchainspider_spark.oracle.ttr import TtrBaseOracle, TtrTimeOracle, TtrWeightOracle
from blockchainspider_spark.oracle.ttr_redirect import TtrRedirectOracle

STRATEGY_REGISTRY = {
    "BFS": BfsOracle,
    "Poison": PoisonOracle,
    "Haircut": HaircutOracle,
    "APPR": ApprOracle,
    "TTRBase": TtrBaseOracle,
    "TTRWeight": TtrWeightOracle,
    "TTRTime": TtrTimeOracle,
    "TTRRedirect": TtrRedirectOracle,
}

CANONICAL_ORDER = ["block_number", "timestamp", "id"]


def adapt_edges(transfers: pd.DataFrame) -> list[dict]:
    """Transfer rows → strategy edge dicts (reference push_pop.py:10-28):
    from/to/timeStamp renames, numeric value, symbol identity
    ``symbol_contract[_tokenid]``."""
    edges = []
    for row in transfers.itertuples(index=False):
        identity = [row.symbol, row.contract_address]
        if row.token_id != "":
            identity.append(row.token_id)
        edges.append({
            "id": row.id,
            "hash": row.hash,
            "from": row.address_from,
            "to": row.address_to,
            "value": float(row.value),
            "timeStamp": int(row.timestamp),
            "symbol": "_".join(identity),
        })
    return edges


class EdgeIndex:
    """In-memory lookup: node → transfers touching it, canonical order."""

    def __init__(self, transfers: pd.DataFrame):
        self._df = transfers.sort_values(CANONICAL_ORDER, kind="mergesort").reset_index(drop=True)

    def expand(self, node: str) -> pd.DataFrame:
        mask = (self._df["address_from"] == node) | (self._df["address_to"] == node)
        return self._df[mask]


@dataclass
class CrawlResult:
    pop_log: list[tuple[int, str, dict]] = field(default_factory=list)
    seen: set = field(default_factory=set)
    ranks: dict = field(default_factory=dict)
    snapshots: list[dict] = field(default_factory=list)
    edges_emitted: list[str] = field(default_factory=list)  # transfer ids, dedup'd


def run_crawl(
    transfers: pd.DataFrame,
    source: str,
    strategy: str = "BFS",
    params: dict[str, Any] | None = None,
    max_steps: int | None = None,
) -> CrawlResult:
    index = EdgeIndex(transfers)
    model = STRATEGY_REGISTRY[strategy](source, **(params or {}))
    result = CrawlResult()
    emitted: set = set()

    node, ctx = source, {}
    step = 0
    result.pop_log.append((step, node, dict(ctx)))
    while node is not None:
        expanded = index.expand(node)
        # sink-side exact dedup of transfer ids (pipelines/subgraph.py:9-27)
        for tid in expanded["id"]:
            if tid not in emitted:
                emitted.add(tid)
                result.edges_emitted.append(tid)
        model.push(node, adapt_edges(expanded), **ctx)
        result.snapshots.append(model.snapshot())
        node, ctx = model.pop()
        if node is None:
            break
        step += 1
        result.pop_log.append((step, node, dict(ctx)))
        if max_steps is not None and step >= max_steps:
            break

    result.ranks = dict(model.ranks())
    vis = getattr(model, "visited", None)
    if vis is not None:
        result.seen = {v for v in vis if v is not None}
    else:
        result.seen = {n for _, n, _ in result.pop_log}
    return result
