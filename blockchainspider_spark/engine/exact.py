"""Exact-order crawl engine: one pop per wave, any strategy.

Mirrors the reference's strictly sequential frontier (one node in
flight, spiders/txs/blockscan.py:138-168): each wave is one Spark job
that expands the popped node against the (distributed) edge table in
canonical scan order, streams the expansion to the driver as one Arrow
batch, and applies the vectorized strategy kernel
(engine/strategies_vec). Strategy state is tiny relative to the edge
table — it is the *edges* that are big — so the data-heavy stages
(expand join, transfer dedup, payload fetch) stay distributed while the
inherently sequential push→pop decision runs on the driver, checkpointed
per wave as the ``node_state`` table.

This is the mode the correctness gate runs (exact pop order vs oracle);
the throughput/bench mode is engine/batch_bfs.BfsWaveEngine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchainspider_spark.engine.strategies_vec import VEC_REGISTRY
from blockchainspider_spark.operators.transfers import CANONICAL_ORDER_COLS, with_symbol_identity


@dataclass
class ExactCrawlResult:
    pop_log: list = field(default_factory=list)       # (step, node, ctx)
    seen: set = field(default_factory=set)
    ranks: dict = field(default_factory=dict)
    emitted_ids: list = field(default_factory=list)
    state_history: list = field(default_factory=list)  # per-wave node_state pdf


class ExactCrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        strategy: str,
        params: dict | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.strategy_name = strategy
        self.params = params or {}
        self.checkpoint_dir = checkpoint_dir
        # adapt once: strategy edge view with symbol identity + double value
        adapted = with_symbol_identity(edges).select(
            F.col("id"),
            F.col("hash"),
            F.col("address_from").alias("from"),
            F.col("address_to").alias("to"),
            F.col("value_d").alias("value"),
            F.col("timestamp").alias("ts_edge"),
            F.col("symbol_identity").alias("symbol"),
            F.col("block_number").alias("_bn"),
        )
        self.adapted = adapted.persist()

    def _expand(self, node: str) -> pd.DataFrame:
        """One Spark job: all transfers touching the node, canonical order.
        Predicate pushes into the scan; result arrives as Arrow batches."""
        pdf = (
            self.adapted.where((F.col("from") == node) | (F.col("to") == node))
            .orderBy("_bn", "ts_edge", "id")
            .drop("_bn")
            .toPandas()
        )
        # pandas rename is case-sensitive, unlike Spark column resolution
        return pdf.rename(columns={"ts_edge": "timeStamp"})

    def run(self, source: str, max_steps: int | None = None) -> ExactCrawlResult:
        from blockchainspider_spark.engine.plugins import load_strategy

        model = load_strategy(self.strategy_name)(source, **self.params)
        result = ExactCrawlResult()
        emitted: set = set()
        node, ctx, step = source, {}, 0
        result.pop_log.append((step, node, {}))
        while node is not None:
            batch = self._expand(node)
            for tid in batch["id"]:
                if tid not in emitted:
                    emitted.add(tid)
                    result.emitted_ids.append(tid)
            model.push(node, batch, **ctx)
            if self.checkpoint_dir:
                state = model.state_rows()
                state.to_parquet(
                    os.path.join(self.checkpoint_dir, f"node_state_{step:05d}.parquet")
                )
            node, ctx = model.pop()
            if node is None:
                break
            step += 1
            result.pop_log.append((step, node, dict(ctx)))
            if max_steps is not None and step >= max_steps:
                break
        result.ranks = dict(model.ranks())
        vis = getattr(model, "visited", None)
        result.seen = (
            {v for v in vis if v is not None}
            if vis is not None
            else {n for _, n, _ in result.pop_log}
        )
        return result
