"""Wave-batched TTR strategies (TTRBase/TTRWeight) and APPR — weighted
crawl at throughput, completing the set after wave_haircut.

Reference semantics (BlockchainSpider strategies/txs/ttr.py TTRBase/
TTRWeight; engine twin: strategies_vec._VecTtrScalar): pop the node with
the max residual ``r > epsilon`` (nodes CAN re-pop once they regain
residual — there is no visited set), then push: ``p[v] += α·r[v]``,
``r[v] = 0``, and scatter ``(1-α)·β·r[v]`` across FORWARD (out-edge)
targets and ``(1-α)·(1-β)·r[v]`` across BACKWARD (in-edge) sources —
shares uniform per edge row (TTRBase) or value-proportional (TTRWeight).

Wave form mirrors engine/wave_haircut.py: the (r, p) state is a
DataFrame; each wave is one TakeOrderedAndProject top-k pop (r desc,
first-touch-key asc — the sequential _OrderedFloatState insertion-order
tiebreak, where forward targets of a push insert before backward ones,
each in canonical edge order), one broadcast push join per direction,
and ONE groupBy folding r-deltas, p-deltas and first-touch keys. With
``k=1`` the pop sequence is identical to the sequential exact engine
(pinned in tests); with ``k>1`` all k pops read the pre-wave state.
State is localCheckpoint'ed per wave (bounded plan depth, loud on
executor loss)."""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blockchainspider_spark.operators.transfers import with_symbol_identity

TTR_STATE_SCHEMA = (
    "node string, r double, p double, fk struct<wave:long,pseq:long,slot:long>"
)


@dataclass
class TtrWaveState:
    wave: int
    node_state: DataFrame          # (node, r, p, fk)
    pop_log_df: DataFrame          # (seq, node, residual, wave)
    next_seq: int
    lineage: list = field(default_factory=list)

    @property
    def pop_log(self) -> list[tuple[int, str]]:
        return [(row.seq, row.node) for row in
                self.pop_log_df.select("seq", "node").orderBy("seq").collect()]

    def ranks(self) -> dict:
        """node → p (the approximate PageRank mass), collect-on-access."""
        return {row.node: row.p for row in
                self.node_state.select("node", "p").where(F.col("p") > 0).collect()}


class TtrWaveEngine:
    """``weighted=False`` → TTRBase (uniform shares); ``True`` →
    TTRWeight (value-proportional)."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        weighted: bool = False,
        k: int = 1,
        alpha: float = 0.15,
        beta: float = 0.8,
        epsilon: float = 1e-3,
        work_dir: str | None = None,
    ):
        self.spark = spark
        self.weighted = bool(weighted)
        self.k = int(k)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="ttrwave-")
        adapted = with_symbol_identity(edges).select(
            F.col("address_from").alias("from"),
            F.col("address_to").alias("to"),
            F.col("value_d").alias("value"),
            F.col("block_number").alias("_bn"),
            F.col("timestamp").alias("_ts"),
            F.col("id"),
        )
        # per-direction edge views with the canonical per-node rank —
        # computed once, persisted, re-probed every wave (bucket by the
        # join key at cluster scale)
        out_w = Window.partitionBy("from").orderBy("_bn", "_ts", "id")
        self._outs = (
            adapted.withColumn("erank", F.row_number().over(out_w).cast("long"))
            .drop("_bn", "_ts", "id").persist()
        )
        in_w = Window.partitionBy("to").orderBy("_bn", "_ts", "id")
        self._ins = (
            adapted.withColumn("erank", F.row_number().over(in_w).cast("long"))
            .drop("_bn", "_ts", "id").persist()
        )
        # out-degree dim: backward-scatter slots come after the parent's
        # forward slots, so the slot offset is the parent's out-row count
        self._outcnt = self._outs.groupBy("from").agg(
            F.count("*").cast("long").alias("n_out")
        ).persist()

    def _pop_wave_dir(self, wave: int) -> str:
        return os.path.join(self._work_dir, "pop_log", f"wave={wave:05d}")

    def _direction_deltas(self, popped: DataFrame, wave: int, forward: bool) -> DataFrame:
        """Scatter contributions of one push direction as delta rows
        (node, r, p, fk)."""
        edge_view = self._outs if forward else self._ins
        join_key = "from" if forward else "to"
        target = "to" if forward else "from"
        coeff = (1 - self.alpha) * (self.beta if forward else 1 - self.beta)
        side = popped.select(
            F.col("node").alias(join_key),
            F.col("seq").alias("_pseq"),
            F.col("residual").alias("_pr"),
            F.col("_n_out"),
        )
        pj = edge_view.join(F.broadcast(side), on=join_key, how="inner")
        grp = Window.partitionBy(join_key)
        share = (
            (F.col("value") / F.sum("value").over(grp)) if self.weighted
            else (F.lit(1.0) / F.count("*").over(grp))
        )
        slot = F.col("erank") if forward else (F.col("_n_out") + F.col("erank"))
        deltas = pj.select(
            F.col(target).alias("node"),
            (F.lit(coeff) * F.col("_pr") * share).alias("r"),
            F.lit(0.0).alias("p"),
            F.struct(
                F.lit(wave).cast("long").alias("wave"),
                F.col("_pseq").alias("pseq"),
                slot.cast("long").alias("slot"),
            ).alias("fk"),
        )
        if self.weighted:
            # a zero-value edge group has share NULL (0/0); the sequential
            # kernel skips zero-total sides entirely
            deltas = deltas.where(F.col("r").isNotNull())
        return deltas

    def run(self, source: str, max_pops: int | None = None) -> TtrWaveState:
        spark = self.spark
        state_df = spark.createDataFrame(
            [(source, 1.0, 0.0, (0, -1, -1))], TTR_STATE_SCHEMA
        ).localCheckpoint(eager=True)
        pop_order = [F.desc("r"), F.asc("fk")]
        seq_w = Window.partitionBy(F.lit(0)).orderBy(*pop_order)
        st = TtrWaveState(
            wave=0, node_state=state_df,
            pop_log_df=spark.createDataFrame(
                [], "seq long, node string, residual double, wave long"),
            next_seq=0,
        )
        while True:
            wave = st.wave + 1
            budget = self.k
            if max_pops is not None:
                budget = min(budget, max_pops - st.next_seq)
            if budget <= 0:
                break
            # strict r > epsilon, matching argmax_over's threshold compare
            pop_rows = (
                st.node_state.where(F.col("r") > self.epsilon)
                .orderBy(*pop_order).limit(budget)
                .withColumn("seq", (F.lit(st.next_seq) - 1
                                    + F.row_number().over(seq_w)).cast("long"))
                .select("seq", F.col("node"), F.col("r").alias("residual"))
            )
            # out-degree lookup for the ≤k popped rows: broadcast the
            # POPPED side into an inner probe of the (arbitrarily large)
            # degree dim, then re-attach — never broadcast the dim itself
            # (at 10^10 nodes it is unbroadcastable)
            hit_cnt = self._outcnt.withColumnRenamed("from", "node").join(
                F.broadcast(pop_rows.select("node")), on="node", how="inner"
            )
            popped = (
                pop_rows.join(F.broadcast(hit_cnt), on="node", how="left")
                .withColumn("_n_out", F.coalesce(F.col("n_out"), F.lit(0)))
                .drop("n_out")
                .localCheckpoint(eager=True)
            )
            n_pops = popped.count()
            if n_pops == 0:
                break
            popped.select(
                "seq", "node", "residual", F.lit(wave).cast("long").alias("wave")
            ).write.mode("overwrite").parquet(self._pop_wave_dir(wave))
            wave_pops = spark.read.parquet(self._pop_wave_dir(wave))

            # base rows: r zeroed for pops (before scatter, so self-loops
            # re-credit), p bumped by α·r
            pop_sel = popped.select("node", F.col("residual").alias("_pr"))
            base = (
                st.node_state.join(F.broadcast(pop_sel), on="node", how="left")
                .select(
                    "node",
                    F.when(F.col("_pr").isNotNull(), 0.0).otherwise(F.col("r")).alias("r"),
                    (F.col("p") + F.coalesce(F.col("_pr") * self.alpha, F.lit(0.0))).alias("p"),
                    "fk",
                )
            )
            fwd = self._direction_deltas(popped, wave, forward=True)
            bwd = self._direction_deltas(popped, wave, forward=False)
            new_state = (
                base.unionByName(fwd).unionByName(bwd)
                .groupBy("node")
                .agg(F.sum("r").alias("r"), F.sum("p").alias("p"),
                     F.min("fk").alias("fk"))
                .localCheckpoint(eager=True)
            )
            st = TtrWaveState(
                wave=wave,
                node_state=new_state,
                pop_log_df=st.pop_log_df.unionByName(wave_pops),
                next_seq=st.next_seq + n_pops,
                lineage=st.lineage,
            )
            st.lineage.append({"wave": wave, "pops": n_pops, "next_seq": st.next_seq})
        return st


APPR_STATE_SCHEMA = (
    "node string, r double, p double, fk struct<wave:long,pseq:long,slot:long>, "
    "fetched boolean"
)


@dataclass
class ApprWaveState:
    wave: int
    node_state: DataFrame          # (node, r, p, fk, fetched)
    pop_log_df: DataFrame          # (seq, node, residual, wave)
    next_seq: int
    lineage: list = field(default_factory=list)

    @property
    def pop_log(self) -> list[tuple[int, str]]:
        return [(row.seq, row.node) for row in
                self.pop_log_df.select("seq", "node").orderBy("seq").collect()]

    def ranks(self) -> dict:
        return {row.node: row.p for row in
                self.node_state.select("node", "p").where(F.col("p") > 0).collect()}


class ApprWaveEngine:
    """Wave-batched APPR local push (reference strategies/txs/appr.py,
    engine twin strategies_vec.VecAppr).

    Sequential semantics: pop() first DRAINS — repeatedly pushes any
    already-crawled node whose residual exceeds epsilon (p += α·r,
    r scattered (1-α)/deg across the distinct-neighbor distribution) —
    then returns the residual argmax, which is necessarily an uncrawled
    node. The wave form keeps (r, p) in a DataFrame and runs the drain
    as SIMULTANEOUS (Jacobi) push iterations — every eligible crawled
    node pushes against the pre-iteration state, one join + one groupBy
    per iteration, until no crawled node exceeds epsilon — then pops the
    top-k uncrawled nodes. Jacobi vs the reference's one-at-a-time
    (Gauss-Seidel) drain converges to the same ε→0 limit but may
    terminate in a slightly different sub-epsilon residual state, so
    exact pop-order parity is NOT guaranteed in general; tests pin
    fixture-level k=1 order equality plus the order-independent
    invariants (mass conservation, drained-state condition, rank error
    bounded by the push theory's ε·deg envelope)."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        k: int = 1,
        alpha: float = 0.15,
        epsilon: float = 1e-5,
        max_drain_iters: int = 200,
        broadcast_threshold: int = 1_000_000,
        work_dir: str | None = None,
    ):
        self.spark = spark
        self.k = int(k)
        self.alpha, self.epsilon = float(alpha), float(epsilon)
        self.max_drain_iters = int(max_drain_iters)
        self.broadcast_threshold = int(broadcast_threshold)
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="apprwave-")
        adapted = with_symbol_identity(edges).select(
            F.col("address_from").alias("from"),
            F.col("address_to").alias("to"),
            F.col("block_number").alias("_bn"),
            F.col("timestamp").alias("_ts"),
            F.col("id"),
        )
        # neighbor distribution view: for every node, the DISTINCT other
        # endpoints of its touching edges in first-appearance order over
        # the interleaved (from_i, to_i) canonical scan — exactly the
        # reference's _neighbor_order. Built once with two windows,
        # persisted; at cluster scale this is the table you bucket by
        # `node`.
        touch = adapted.selectExpr(
            "stack(2, address_from, address_to) as node", "*"
        ) if False else adapted.selectExpr(
            "stack(2, `from`, `to`) as node", "`from`", "`to`", "_bn", "_ts", "id"
        )
        edge_w = Window.partitionBy("node").orderBy("_bn", "_ts", "id")
        pos = touch.withColumn("_eidx", F.row_number().over(edge_w)).select(
            "node", "_eidx",
            F.explode(F.array(
                F.struct(F.lit(0).alias("s"), F.col("from").alias("nbr")),
                F.struct(F.lit(1).alias("s"), F.col("to").alias("nbr")),
            )).alias("c"),
        ).select(
            "node", (F.col("_eidx") * 2 + F.col("c.s")).alias("_pos"),
            F.col("c.nbr"),
        ).where(F.col("nbr") != F.col("node"))
        first = pos.groupBy("node", "nbr").agg(F.min("_pos").alias("_first"))
        rank_w = Window.partitionBy("node").orderBy("_first")
        self._nbrs = first.select(
            "node", "nbr", F.row_number().over(rank_w).cast("long").alias("nrank"),
            F.count("*").over(Window.partitionBy("node")).cast("long").alias("deg"),
        ).persist()

    def _pop_wave_dir(self, wave: int) -> str:
        return os.path.join(self._work_dir, "pop_log", f"wave={wave:05d}")

    def _drain_once(self, state: DataFrame, wave: int) -> tuple[DataFrame, int]:
        """One Jacobi drain iteration: every crawled node with r > ε
        pushes simultaneously. Returns (new_state, n_pushed)."""
        # state is localCheckpoint'ed by the caller, so this filter is a
        # cheap deterministic re-read — no extra materialization needed
        pushers = state.where(F.col("fetched") & (F.col("r") > self.epsilon)).select(
            F.col("node").alias("_pn"), F.col("r").alias("_pr"),
            F.col("fk.pseq").alias("_ppseq"),
        )
        n = pushers.count()
        if n == 0:
            return state, 0
        # the pusher set is bounded by the CRAWLED set, which grows with
        # the crawl — broadcast only while it is actually small, else
        # join shuffle-side (hash-partitioned on the node key)
        push_side = F.broadcast(pushers) if n <= self.broadcast_threshold else pushers
        deltas = (
            self._nbrs.join(push_side,
                            on=F.col("node") == F.col("_pn"), how="inner")
            .select(
                F.col("nbr").alias("node"),
                ((1 - self.alpha) / F.col("deg") * F.col("_pr")).alias("r"),
                F.lit(0.0).alias("p"),
                F.struct(
                    F.lit(wave).cast("long").alias("wave"),
                    F.col("_ppseq").alias("pseq"),
                    F.col("nrank").alias("slot"),
                ).alias("fk"),
                F.lit(False).alias("fetched"),
            )
        )
        pushed = pushers.select(F.col("_pn").alias("node"), F.col("_pr"))
        if n <= self.broadcast_threshold:
            pushed = F.broadcast(pushed)
        base = (
            state.join(pushed, on="node", how="left")
            .select(
                "node",
                F.when(F.col("_pr").isNotNull(), 0.0).otherwise(F.col("r")).alias("r"),
                (F.col("p") + F.coalesce(F.col("_pr") * self.alpha, F.lit(0.0))).alias("p"),
                "fk", "fetched",
            )
        )
        new_state = (
            base.unionByName(deltas)
            .groupBy("node")
            .agg(F.sum("r").alias("r"), F.sum("p").alias("p"),
                 F.min("fk").alias("fk"), F.max("fetched").alias("fetched"))
            .localCheckpoint(eager=True)
        )
        return new_state, n

    def run(self, source: str, max_pops: int | None = None) -> ApprWaveState:
        spark = self.spark
        state_df = spark.createDataFrame(
            [(source, 1.0, 0.0, (0, -1, -1), False)], APPR_STATE_SCHEMA
        ).localCheckpoint(eager=True)
        pop_order = [F.desc("r"), F.asc("fk")]
        seq_w = Window.partitionBy(F.lit(0)).orderBy(*pop_order)
        st = ApprWaveState(
            wave=0, node_state=state_df,
            pop_log_df=spark.createDataFrame(
                [], "seq long, node string, residual double, wave long"),
            next_seq=0,
        )
        while True:
            wave = st.wave + 1
            # drain: crawled residual mass flows until every crawled node
            # is ≤ ε (geometric decay — ≥α of pushed mass leaves r per
            # iteration); the cap is a loud backstop, not a silent limit
            state, iters = st.node_state, 0
            while True:
                state, n_pushed = self._drain_once(state, wave)
                if n_pushed == 0:
                    break
                iters += 1
                if iters >= self.max_drain_iters:
                    raise RuntimeError(
                        f"APPR drain did not settle in {self.max_drain_iters} "
                        f"iterations (epsilon={self.epsilon})"
                    )
            budget = self.k
            if max_pops is not None:
                budget = min(budget, max_pops - st.next_seq)
            if budget <= 0:
                st = ApprWaveState(wave, state, st.pop_log_df, st.next_seq, st.lineage)
                break
            # post-drain, every node above ε is uncrawled — the argmax
            # over all nodes equals the argmax over uncrawled ones
            popped = (
                state.where(F.col("r") > self.epsilon)
                .orderBy(*pop_order).limit(budget)
                .withColumn("seq", (F.lit(st.next_seq) - 1
                                    + F.row_number().over(seq_w)).cast("long"))
                .select("seq", "node", F.col("r").alias("residual"))
                .localCheckpoint(eager=True)
            )
            n_pops = popped.count()
            if n_pops == 0:
                st = ApprWaveState(wave, state, st.pop_log_df, st.next_seq, st.lineage)
                break
            popped.select(
                "seq", "node", "residual", F.lit(wave).cast("long").alias("wave")
            ).write.mode("overwrite").parquet(self._pop_wave_dir(wave))
            wave_pops = spark.read.parquet(self._pop_wave_dir(wave))
            # mark crawled; carry the pop seq into fk.pseq so later drain
            # scatters from this node order by its pop sequence
            mark = popped.select("node", F.col("seq").alias("_seq"))
            new_state = (
                state.join(F.broadcast(mark), on="node", how="left")
                .select(
                    "node", "r", "p",
                    F.when(
                        F.col("_seq").isNotNull(),
                        F.struct(F.col("fk.wave").alias("wave"),
                                 F.col("_seq").alias("pseq"),
                                 F.col("fk.slot").alias("slot")),
                    ).otherwise(F.col("fk")).alias("fk"),
                    (F.col("fetched") | F.col("_seq").isNotNull()).alias("fetched"),
                )
                .localCheckpoint(eager=True)
            )
            st = ApprWaveState(
                wave=wave,
                node_state=new_state,
                pop_log_df=st.pop_log_df.unionByName(wave_pops),
                next_seq=st.next_seq + n_pops,
                lineage=st.lineage,
            )
            st.lineage.append({"wave": wave, "pops": n_pops,
                               "drain_iters": iters, "next_seq": st.next_seq})
        return st
