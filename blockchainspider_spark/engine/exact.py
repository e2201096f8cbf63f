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
        return self._drive(model, result, emitted, node, ctx, step, max_steps)

    def resume_latest(self, max_steps: int | None = None) -> ExactCrawlResult:
        """Resume from the newest strategy snapshot in checkpoint_dir."""
        import glob

        snaps = sorted(glob.glob(os.path.join(self.checkpoint_dir, "strategy_*.pkl")))
        if not snaps:
            raise FileNotFoundError(f"no strategy snapshots in {self.checkpoint_dir}")
        step = int(os.path.basename(snaps[-1]).split("_")[1].split(".")[0])
        return self.resume(step, max_steps=max_steps)

    def _history_upto(self, step: int) -> tuple[list, list]:
        """Concatenate the pop-log / emitted-id DELTAS of every snapshot
        ≤ ``step``. Snapshots store per-wave deltas, not the full
        history — a k-wave crawl checkpoints O(k) entries total instead
        of the old full-copy-per-wave O(k²)."""
        import glob
        import pickle

        pop_log: list = []
        emitted_ids: list = []
        for path in sorted(glob.glob(os.path.join(self.checkpoint_dir, "strategy_*.pkl"))):
            s = int(os.path.basename(path).split("_")[1].split(".")[0])
            if s > step:
                break
            with open(path, "rb") as fh:
                snap = pickle.load(fh)
            if "pop_log" in snap:  # pre-delta snapshot format: full copies
                pop_log, emitted_ids = list(snap["pop_log"]), list(snap["emitted_ids"])
            else:
                pop_log.extend(snap["pop_log_delta"])
                emitted_ids.extend(snap["emitted_delta"])
        return pop_log, emitted_ids

    def resume(self, step: int, max_steps: int | None = None) -> ExactCrawlResult:
        """Resume mid-crawl from the pickled wave snapshot ``step``: the
        strategy state (residuals, visited sets, queues, caches) and the
        crawl cursor restore exactly; the remaining waves replay on the
        distributed edge table as usual."""
        import pickle

        with open(os.path.join(self.checkpoint_dir, f"strategy_{step:05d}.pkl"), "rb") as fh:
            snap = pickle.load(fh)
        model = snap["model"]
        pop_log, emitted_ids = self._history_upto(step)
        # restarting from step k invalidates any later snapshots: the
        # continuation rewrites them, and a stale leftover would corrupt
        # the delta concatenation of a future resume
        import glob

        for path in glob.glob(os.path.join(self.checkpoint_dir, "strategy_*.pkl")):
            if int(os.path.basename(path).split("_")[1].split(".")[0]) > step:
                os.remove(path)
        result = ExactCrawlResult(pop_log=pop_log, emitted_ids=emitted_ids)
        emitted = set(emitted_ids)
        node, ctx = snap["next_node"], snap["next_ctx"]
        if node is None:
            result.ranks = dict(model.ranks())
            return result
        return self._drive(model, result, emitted, node, ctx, snap["step"] + 1, max_steps,
                           ckpt_base=(len(result.pop_log), len(result.emitted_ids)))

    def _drive(self, model, result, emitted, node, ctx, step, max_steps,
               ckpt_base: tuple[int, int] = (0, 0)):
        # entries below these indices already live in earlier snapshots
        # (resume passes the restored lengths); everything after them is
        # this drive's delta stream
        ckpt_pop, ckpt_emit = ckpt_base
        while node is not None:
            batch = self._expand(node)
            for tid in batch["id"]:
                if tid not in emitted:
                    emitted.add(tid)
                    result.emitted_ids.append(tid)
            model.push(node, batch, **ctx)
            pushed_step = step
            if self.checkpoint_dir:
                model.state_rows().to_parquet(
                    os.path.join(self.checkpoint_dir, f"node_state_{pushed_step:05d}.parquet")
                )
            node, ctx = model.pop()
            if node is not None:
                step += 1
                result.pop_log.append((step, node, dict(ctx)))
            if self.checkpoint_dir:
                import pickle

                snap = {
                    "step": pushed_step,
                    "model": model,
                    # per-wave DELTAS only: the full history is the
                    # concatenation over snapshots (_history_upto) —
                    # checkpoint bytes stay linear in crawl length
                    "pop_log_delta": list(result.pop_log[ckpt_pop:]),
                    "emitted_delta": list(result.emitted_ids[ckpt_emit:]),
                    "next_node": node,
                    "next_ctx": dict(ctx),
                }
                ckpt_pop = len(result.pop_log)
                ckpt_emit = len(result.emitted_ids)
                with open(
                    os.path.join(self.checkpoint_dir, f"strategy_{pushed_step:05d}.pkl"), "wb"
                ) as fh:
                    pickle.dump(snap, fh)
            if node is None:
                break
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
