"""Wave-batched Haircut: the first weighted strategy in throughput mode.

The exact engine (engine/exact.py) pops ONE node per wave — faithful to
the reference's sequential frontier (spiders/txs/blockscan.py:138-168,
strategies/txs/haircut.py semantics: pop the max-weight unvisited node
above ``min_weight``, zero it, scatter its weight across its out-edges
proportional to value). At 100× scale the ranked crawl itself needs a
batched form: this engine keeps the WHOLE node-weight state DataFrame-
resident and advances ``k`` pops per Spark wave:

* **top-k pop** — ``orderBy(weight desc, first-touch key asc).limit(k)``
  compiles to TakeOrderedAndProject: a distributed per-partition top-k
  + driver-side merge of k rows, never a global sort. The merged ≤k
  rows are collected (O(k) driver state — TakeOrdered materializes
  them driver-side regardless) and re-shipped as a LocalRelation, so
  seq assignment is order-of-collect and every downstream probe
  broadcasts the pop set with no extra jobs (r7). The first-touch
  key ``(wave, parent_seq, edge_rank)`` reproduces the reference's
  insertion-order tiebreak (the sequential engine's _OrderedFloatState
  iterates first-inserted-first).
* **push** — one equi-join of the popped rows (broadcast, with their
  A1 out-sums attached from the build-once ``_out_totals`` node index)
  against the out-edge view (A2 proportional scatter), then ONE groupBy
  merging scatter deltas into the state: base rows carry weight (zeroed
  for pops via an IN-predicate) + first-touch key + visited; delta rows
  carry contributions; ``sum(weight), min(fk), max(visited)`` folds
  both. One shuffle per wave, map-side partial aggregation; the probe
  carries an IN-filter so the cached out-edge view (sorted by ``from``
  within partitions) prunes whole batches via min/max stats (r7).
* **state hygiene** — node_state is ``localCheckpoint(eager=True)``-ed
  per wave: bounded plan depth on long crawls and no silent recompute
  of a nondeterministic lineage. Pops append to the log straight from
  the localCheckpoint'ed pop set (no per-wave disk round-trip;
  wave_common.PopLog compacts every 64 waves). With ``checkpoint_dir``
  set, every wave also writes a durable parquet snapshot
  (node_state + pop_log/wave=N + meta.json) and ``resume()`` continues
  from the newest one — the BfsWaveEngine contract.

With ``k=1`` the pop sequence is IDENTICAL to the sequential engine
(pinned in tests/test_wave_haircut.py); with ``k>1`` all k pops of a
wave read the same pre-wave state — the documented batch semantics
(weights gained mid-wave are seen next wave)."""

from __future__ import annotations

import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blockchainspider_spark.engine.wave_common import (
    PopLog,
    WaveCheckpoint,
    WaveTrace,
    ensure_wave_aligned,
)
from blockchainspider_spark.operators.transfers import with_symbol_identity

NODE_STATE_SCHEMA = (
    "node string, weight double, fk struct<wave:long,pseq:long,erank:long>, "
    "visited boolean, outsum double"
)


@dataclass
class HaircutWaveState:
    wave: int
    node_state: DataFrame          # (node, weight, fk, visited)
    pop_log_df: DataFrame          # (seq, node, weight, wave)
    next_seq: int
    last_pops: int
    lineage: list = field(default_factory=list)

    @property
    def pop_log(self) -> list[tuple[int, str]]:
        """(seq, node) tuples in pop order — collect-on-access, for
        tests/small crawls only."""
        return [(r.seq, r.node) for r in
                self.pop_log_df.select("seq", "node").orderBy("seq").collect()]

    @property
    def seen(self) -> set:
        return {r.node for r in self.pop_log_df.select("node").collect()}


class HaircutWaveEngine:
    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        k: int = 1,
        min_weight: float = 1e-3,
        n_shuffle: int | None = None,
        work_dir: str | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.k = int(k)
        self.min_weight = float(min_weight)
        self.n_shuffle = n_shuffle or int(spark.conf.get("spark.sql.shuffle.partitions"))
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="haircutwave-")
        self._ckpt = WaveCheckpoint(spark, checkpoint_dir) if checkpoint_dir else None
        # out-edge view with the canonical per-parent edge rank computed
        # ONCE (the same (_bn, ts, id) scan order the exact engine's
        # expand uses) and persisted — every wave's push re-probes it.
        # At cluster scale, bucket this table by `from` so the per-wave
        # broadcast join needs no shuffle at all.
        adapted = with_symbol_identity(edges).select(
            F.col("address_from").alias("from"),
            F.col("address_to").alias("to"),
            F.col("value_d").alias("value"),
            F.col("block_number").alias("_bn"),
            F.col("timestamp").alias("_ts"),
            F.col("id"),
        )
        rank_w = Window.partitionBy("from").orderBy("_bn", "_ts", "id")
        ranked = adapted.withColumn(
            "erank", F.row_number().over(rank_w).cast("long")
        ).drop("_bn", "_ts", "id")
        # per-node out-sum index (A1), computed once: every wave's push
        # used to recompute it twice — a window over the joined slice
        # for the scatter denominators plus a separate groupBy scan of
        # the whole out-edge view for the zeroing set (r7, guide §2.4).
        self._out_totals = (
            ranked.groupBy("from").agg(F.sum("value").alias("outsum")).persist()
        )
        # r7b: the out-edge view additionally carries the TARGET node's
        # out-sum (`to_outsum`, one build-time join) so scatter deltas
        # deliver each new state row's A1 denominator with them — the
        # node state then holds every popped node's out-sum and the
        # per-wave `_out_totals` probe job disappears entirely (the pop
        # collect returns it from state; guide §2.4, one less job/wave).
        # broadcast: keeps the streamed side's `from`-clustered layout
        # (the rank window's sort) intact so the per-wave IN-filter probe
        # still prunes cached batches via min/max stats; a shuffled join
        # would re-cluster by `to`. At cluster scale the equivalent is a
        # node-bucketed totals table co-located with the edge buckets.
        self._outs = (
            ranked.join(
                F.broadcast(self._out_totals.select(
                    F.col("from").alias("to"), F.col("outsum").alias("to_outsum")
                )),
                on="to", how="left",
            )
            .select("from", "to", "value", "erank", "to_outsum")
            .persist()
        )

    POP_LOG_SCHEMA = "seq long, node string, weight double, wave long"

    def _pop_log(self) -> PopLog:
        return PopLog(
            self.spark, self.POP_LOG_SCHEMA, self._work_dir,
            durable_dir=self._ckpt.pop_log_dir() if self._ckpt else None,
        )

    def run(self, source: str, max_pops: int | None = None) -> HaircutWaveState:
        # the seed's A1 out-sum is the one state row no delta can deliver
        # (deltas carry their target's out-sum; the seed is never a
        # target before it pops) — one bounded index lookup at crawl
        # start replaces the per-wave totals-probe job (r7b)
        src_row = self._out_totals.where(F.col("from") == source).collect()
        src_outsum = src_row[0]["outsum"] if src_row else None
        state_df = self.spark.createDataFrame(
            [(source, 1.0, (0, -1, -1), False, src_outsum)], NODE_STATE_SCHEMA
        ).localCheckpoint(eager=True)
        plog = self._pop_log()
        st = HaircutWaveState(
            wave=0, node_state=state_df, pop_log_df=plog.df,
            next_seq=0, last_pops=-1,
        )
        return self._run_from(st, plog, max_pops)

    def resume(self, max_pops: int | None = None) -> HaircutWaveState:
        """Continue from the newest durable wave snapshot: node_state
        from parquet, pop log rebuilt from the per-wave dirs (stale
        later waves deleted — the continuation rewrites them)."""
        if self._ckpt is None:
            raise ValueError("resume() requires checkpoint_dir")
        wave = self._ckpt.latest_wave()
        if wave is None:
            raise FileNotFoundError(f"no wave snapshot under {self._ckpt.dir}")
        tables, scalars = self._ckpt.load(wave, ["node_state"])
        plog = self._pop_log()
        st = HaircutWaveState(
            wave=wave,
            node_state=tables["node_state"].localCheckpoint(eager=True),
            pop_log_df=plog.load_upto(wave),
            next_seq=scalars["next_seq"], last_pops=scalars["last_pops"],
            lineage=scalars["lineage"],
        )
        return self._run_from(st, plog, max_pops)

    POPPED_SCHEMA = (
        "node string, weight double, fk struct<wave:long,pseq:long,erank:long>, "
        "seq long, outsum double"
    )

    def _run_from(self, st: HaircutWaveState, plog: PopLog,
                  max_pops: int | None = None) -> HaircutWaveState:
        pop_order = [F.desc("weight"), F.asc("fk")]
        spark = self.spark
        while True:
            wave = st.wave + 1
            tr = WaveTrace(f"haircut w{wave}")
            # eligibility follows VecHaircut.pop exactly: weight ≥
            # min_weight, strictly positive, not yet visited
            eligible = st.node_state.where(
                (~F.col("visited")) & (F.col("weight") >= self.min_weight)
                & (F.col("weight") > 0.0)
            )
            budget = self.k
            if max_pops is not None:
                budget = min(budget, max_pops - st.next_seq)
            if budget <= 0:
                break
            ensure_wave_aligned(eligible, budget, self.k, wave, max_pops)
            # top-k pop: TakeOrderedAndProject merges the ≤k winning rows
            # on the driver anyway — collect them (bounded by k, the same
            # O(k) driver posture as the old per-wave pop broadcast) and
            # re-ship as a LocalRelation: seq assignment is trivial
            # (collect preserves the sort order) and every downstream
            # probe broadcasts the local rows with no extra jobs (r7;
            # replaces a localCheckpoint job + a count job + a window).
            pop_rows = (
                eligible.orderBy(*pop_order).limit(budget)
                .select("node", "weight", "fk", "outsum").collect()
            )
            n_pops = len(pop_rows)
            if n_pops == 0:
                break
            # the A1 out-sum arrives WITH the pop rows: state rows carry
            # it from their creating delta (r7b) — the separate per-wave
            # `_out_totals` probe job is gone
            pop_nodes = [r["node"] for r in pop_rows]
            totals = {r["node"]: r["outsum"] for r in pop_rows}
            popped = spark.createDataFrame(
                [
                    (r["node"], r["weight"], tuple(r["fk"]),
                     st.next_seq + i, r["outsum"])
                    for i, r in enumerate(pop_rows)
                ],
                self.POPPED_SCHEMA,
            )
            tr.mark("pop")
            pop_log_df = plog.append(
                popped.select("seq", "node", "weight",
                              F.lit(wave).cast("long").alias("wave")),
                wave,
            )

            # push: broadcast the ≤k popped rows (with their A1 out-sums
            # attached) into the out-edge view — A2 proportional scatter
            # as delta rows; one _outs probe, no per-wave window
            # IN-filter before the probe join: _outs is cached sorted by
            # `from` within partitions (the rank window's sort), so the
            # in-memory scan prunes whole batches via min/max stats
            # instead of scanning every cached row (r7)
            deltas = (
                self._outs.where(F.col("from").isin(pop_nodes)).join(
                    F.broadcast(popped.where(F.col("outsum") > 0.0).select(
                        F.col("node").alias("from"),
                        F.col("seq").alias("_pseq"),
                        F.col("weight").alias("_pw"),
                        F.col("outsum").alias("_outsum"),
                    )),
                    on="from", how="inner",
                )
                .select(
                    F.col("to").alias("node"),
                    (F.col("_pw") * F.col("value") / F.col("_outsum")).alias("weight"),
                    F.struct(
                        F.lit(wave).cast("long").alias("wave"),
                        F.col("_pseq").alias("pseq"),
                        F.col("erank").alias("erank"),
                    ).alias("fk"),
                    F.lit(False).alias("visited"),
                    # deliver the target's A1 out-sum with the delta so
                    # the state row that makes it poppable already holds
                    # its scatter denominator (r7b)
                    F.col("to_outsum").alias("outsum"),
                )
            )
            # merge: zero the weight of popped rows THAT SCATTERED (the
            # sequential push returns early on out-sum == 0 — a dead-end
            # pop KEEPS its weight; found by the wave property tests),
            # zeroing before the delta fold so self-loops re-credit the
            # popped node; mark all pops visited; fold deltas in ONE
            # groupBy. Both pop sets are ≤k node strings — plain
            # IN-predicates on the state scan, no joins at all.
            tr.mark("log")
            scattered_nodes = [n for n in pop_nodes
                               if (totals.get(n) or 0.0) > 0.0]
            zeroed = (F.col("node").isin(scattered_nodes) if scattered_nodes
                      else F.lit(False))
            base = st.node_state.select(
                "node",
                F.when(zeroed, 0.0).otherwise(F.col("weight")).alias("weight"),
                "fk",
                (F.col("visited") | F.col("node").isin(pop_nodes)).alias("visited"),
                "outsum",
            )
            new_state = (
                base.unionByName(deltas)
                .groupBy("node")
                .agg(
                    F.sum("weight").alias("weight"),
                    F.min("fk").alias("fk"),
                    F.max("visited").alias("visited"),
                    # constant per node wherever non-null (max = that value)
                    F.max("outsum").alias("outsum"),
                )
                # r7c: LAZY local checkpoint — the merge materializes
                # inside the NEXT wave's pop job (the TakeOrdered scan
                # reads every partition, so the checkpoint completes and
                # truncates lineage there), halving the engine's Spark
                # jobs to ONE per wave. Same storage and loud-failure
                # semantics as eager=True; measured per-job fixed cost
                # (~0.3-0.5 s on this host) dominates the tiny stage
                # work, so job count is what per-wave cost scales with.
                .localCheckpoint(eager=False)
            )
            tr.mark("merge")
            tr.done()
            st = HaircutWaveState(
                wave=wave,
                node_state=new_state,
                pop_log_df=pop_log_df,
                next_seq=st.next_seq + n_pops,
                last_pops=n_pops,
                lineage=st.lineage,
            )
            st.lineage.append({"wave": wave, "pops": n_pops, "next_seq": st.next_seq})
            if self._ckpt is not None:
                self._ckpt.save(wave, {"node_state": new_state}, {
                    "next_seq": st.next_seq, "last_pops": n_pops,
                    "lineage": st.lineage,
                })
        return st
