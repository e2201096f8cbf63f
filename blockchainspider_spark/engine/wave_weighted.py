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

import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blockchainspider_spark.engine.wave_common import PopLog, WaveCheckpoint, ensure_wave_aligned
from blockchainspider_spark.operators.transfers import with_symbol_identity

POP_LOG_SCHEMA = "seq long, node string, residual double, wave long"

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
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.weighted = bool(weighted)
        self.k = int(k)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="ttrwave-")
        self._ckpt = WaveCheckpoint(spark, checkpoint_dir) if checkpoint_dir else None
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

    def _pop_log(self) -> PopLog:
        return PopLog(
            self.spark, POP_LOG_SCHEMA, self._work_dir,
            durable_dir=self._ckpt.pop_log_dir() if self._ckpt else None,
        )

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
        state_df = self.spark.createDataFrame(
            [(source, 1.0, 0.0, (0, -1, -1))], TTR_STATE_SCHEMA
        ).localCheckpoint(eager=True)
        plog = self._pop_log()
        st = TtrWaveState(wave=0, node_state=state_df, pop_log_df=plog.df, next_seq=0)
        return self._run_from(st, plog, max_pops)

    def resume(self, max_pops: int | None = None) -> TtrWaveState:
        if self._ckpt is None:
            raise ValueError("resume() requires checkpoint_dir")
        wave = self._ckpt.latest_wave()
        if wave is None:
            raise FileNotFoundError(f"no wave snapshot under {self._ckpt.dir}")
        tables, scalars = self._ckpt.load(wave, ["node_state"])
        plog = self._pop_log()
        st = TtrWaveState(
            wave=wave,
            node_state=tables["node_state"].localCheckpoint(eager=True),
            pop_log_df=plog.load_upto(wave),
            next_seq=scalars["next_seq"], lineage=scalars["lineage"],
        )
        return self._run_from(st, plog, max_pops)

    def _run_from(self, st: TtrWaveState, plog: PopLog,
                  max_pops: int | None = None) -> TtrWaveState:
        spark = self.spark
        pop_order = [F.desc("r"), F.asc("fk")]
        seq_w = Window.partitionBy(F.lit(0)).orderBy(*pop_order)
        while True:
            wave = st.wave + 1
            budget = self.k
            if max_pops is not None:
                budget = min(budget, max_pops - st.next_seq)
            if budget <= 0:
                break
            # strict r > epsilon, matching argmax_over's threshold compare
            eligible = st.node_state.where(F.col("r") > self.epsilon)
            ensure_wave_aligned(eligible, budget, self.k, wave, max_pops)
            pop_rows = (
                eligible
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
            pop_log_df = plog.append(
                popped.select("seq", "node", "residual",
                              F.lit(wave).cast("long").alias("wave")),
                wave,
            )

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
                pop_log_df=pop_log_df,
                next_seq=st.next_seq + n_pops,
                lineage=st.lineage,
            )
            st.lineage.append({"wave": wave, "pops": n_pops, "next_seq": st.next_seq})
            if self._ckpt is not None:
                self._ckpt.save(wave, {"node_state": new_state},
                                {"next_seq": st.next_seq, "lineage": st.lineage})
        return st


APPR_STATE_SCHEMA = (
    "node string, r double, p double, fk struct<wave:long,pseq:long,slot:long>, "
    "fetched boolean, isolated boolean"
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
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.k = int(k)
        self.alpha, self.epsilon = float(alpha), float(epsilon)
        self.max_drain_iters = int(max_drain_iters)
        self.broadcast_threshold = int(broadcast_threshold)
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="apprwave-")
        self._ckpt = WaveCheckpoint(spark, checkpoint_dir) if checkpoint_dir else None
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

    def _pop_log(self) -> PopLog:
        return PopLog(
            self.spark, POP_LOG_SCHEMA, self._work_dir,
            durable_dir=self._ckpt.pop_log_dir() if self._ckpt else None,
        )

    def _drain_once(self, state: DataFrame, wave: int) -> tuple[DataFrame, int]:
        """One Jacobi drain iteration: every crawled node with r > ε
        pushes simultaneously. Returns (new_state, n_pushed)."""
        # state is localCheckpoint'ed by the caller, so this filter is a
        # cheap deterministic re-read — no extra materialization needed.
        # Isolated nodes (zero distinct neighbors) are excluded like the
        # reference drain (appr.py pop(): a cached empty dist is falsy →
        # skipped); they re-pop instead, and their pop-time push zeroes r
        # in run() — so no per-iteration degree join is needed here.
        pushers = state.where(
            F.col("fetched") & (~F.col("isolated")) & (F.col("r") > self.epsilon)
        ).select(
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
                F.lit(False).alias("isolated"),
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
                "fk", "fetched", "isolated",
            )
        )
        new_state = (
            base.unionByName(deltas)
            .groupBy("node")
            .agg(F.sum("r").alias("r"), F.sum("p").alias("p"),
                 F.min("fk").alias("fk"), F.max("fetched").alias("fetched"),
                 F.max("isolated").alias("isolated"))
            .localCheckpoint(eager=True)
        )
        return new_state, n

    def run(self, source: str, max_pops: int | None = None) -> ApprWaveState:
        state_df = self.spark.createDataFrame(
            [(source, 1.0, 0.0, (0, -1, -1), False, False)], APPR_STATE_SCHEMA
        ).localCheckpoint(eager=True)
        plog = self._pop_log()
        st = ApprWaveState(wave=0, node_state=state_df, pop_log_df=plog.df, next_seq=0)
        return self._run_from(st, plog, max_pops)

    def resume(self, max_pops: int | None = None) -> ApprWaveState:
        if self._ckpt is None:
            raise ValueError("resume() requires checkpoint_dir")
        wave = self._ckpt.latest_wave()
        if wave is None:
            raise FileNotFoundError(f"no wave snapshot under {self._ckpt.dir}")
        tables, scalars = self._ckpt.load(wave, ["node_state"])
        plog = self._pop_log()
        st = ApprWaveState(
            wave=wave,
            node_state=tables["node_state"].localCheckpoint(eager=True),
            pop_log_df=plog.load_upto(wave),
            next_seq=scalars["next_seq"], lineage=scalars["lineage"],
        )
        return self._run_from(st, plog, max_pops)

    def _run_from(self, st: ApprWaveState, plog: PopLog,
                  max_pops: int | None = None) -> ApprWaveState:
        pop_order = [F.desc("r"), F.asc("fk")]
        seq_w = Window.partitionBy(F.lit(0)).orderBy(*pop_order)
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
            # post-drain, any node above ε is either uncrawled or an
            # isolated re-pop (zero distinct neighbors — excluded from
            # the drain exactly like the reference's falsy-cache skip)
            eligible = state.where(F.col("r") > self.epsilon)
            ensure_wave_aligned(eligible, budget, self.k, wave, max_pops)
            popped = (
                eligible
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
            pop_log_df = plog.append(
                popped.select("seq", "node", "residual",
                              F.lit(wave).cast("long").alias("wave")),
                wave,
            )
            # mark crawled; carry the pop seq into fk.pseq so later drain
            # scatters from this node order by its pop sequence. A popped
            # node with zero distinct neighbors gets its push applied
            # HERE (p += α·r, r = 0, empty scatter — reference push with
            # an empty neighbor set) and is flagged isolated so the drain
            # never touches it again; it re-pops if it ever regains mass,
            # exactly like the sequential engine.
            has_nbrs = (
                self._nbrs.join(F.broadcast(popped.select("node")),
                                on="node", how="leftsemi")
                .select("node").distinct()
                .withColumn("_has_nbrs", F.lit(True))
            )
            mark = (
                popped.select("node", F.col("seq").alias("_seq"),
                              F.col("residual").alias("_res"))
                .join(F.broadcast(has_nbrs), on="node", how="left")
            )
            pop_isolated = F.col("_seq").isNotNull() & F.col("_has_nbrs").isNull()
            new_state = (
                state.join(F.broadcast(mark), on="node", how="left")
                .select(
                    "node",
                    F.when(pop_isolated, 0.0).otherwise(F.col("r")).alias("r"),
                    (F.col("p") + F.when(pop_isolated, F.col("_res") * self.alpha)
                     .otherwise(F.lit(0.0))).alias("p"),
                    F.when(
                        F.col("_seq").isNotNull(),
                        F.struct(F.col("fk.wave").alias("wave"),
                                 F.col("_seq").alias("pseq"),
                                 F.col("fk.slot").alias("slot")),
                    ).otherwise(F.col("fk")).alias("fk"),
                    (F.col("fetched") | F.col("_seq").isNotNull()).alias("fetched"),
                    (F.col("isolated") | pop_isolated).alias("isolated"),
                )
                .localCheckpoint(eager=True)
            )
            st = ApprWaveState(
                wave=wave,
                node_state=new_state,
                pop_log_df=pop_log_df,
                next_seq=st.next_seq + n_pops,
                lineage=st.lineage,
            )
            st.lineage.append({"wave": wave, "pops": n_pops,
                               "drain_iters": iters, "next_seq": st.next_seq})
            if self._ckpt is not None:
                self._ckpt.save(wave, {"node_state": new_state},
                                {"next_seq": st.next_seq, "lineage": st.lineage})
        return st


CHIPS_SCHEMA = "node string, ts long, val double"
TTRTIME_META_SCHEMA = (
    "node string, p double, fk struct<wave:long,pseq:long,slot:long>"
)


@dataclass
class TtrTimeWaveState:
    wave: int
    chips: DataFrame               # (node, ts, val) residual chips
    meta: DataFrame                # (node, p, fk)
    pop_log_df: DataFrame          # (seq, node, residual, wave)
    next_seq: int
    lineage: list = field(default_factory=list)

    @property
    def pop_log(self) -> list[tuple[int, str]]:
        return [(row.seq, row.node) for row in
                self.pop_log_df.select("seq", "node").orderBy("seq").collect()]

    def ranks(self) -> dict:
        return {row.node: row.p for row in
                self.meta.select("node", "p").where(F.col("p") > 0).collect()}


class TtrTimeWaveEngine:
    """Wave-batched TTRTime (reference strategies/txs/ttr.py TTRTime;
    engine twin strategies_vec.VecTtrTime).

    The strategy state is per-node CHIP maps (timestamp → residual mass);
    a push flows each popped node's chips along its edges with temporal
    eligibility — a chip moves only across edges strictly LATER (forward)
    or strictly EARLIER (backward) than the chip's timestamp, weighted by
    the eligible-value mass W. The sequential kernel does this with
    searchsorted/cumsum per node; here the same quantities are computed
    as two range-frame window passes over a per-node UNION of chip rows
    and edge rows ordered by timestamp (the as-of-join shape):

    * ``W[chip]``   = total edge value − Σ edge value with ts ≤ chip.ts
                      (forward; strictly-earlier prefix for backward)
    * ``density[e]`` = Σ chip contributions with ts < e.ts (forward;
                      ts > e.ts via a following-range frame backward)

    Both frames share one sort, so each direction is a single window
    exchange over the popped nodes' slice. Chips with no eligible edge
    recycle to their node ×(1−α)·share, exactly as the reference. The
    one-time source seed (per-timestamp last-writer chip assignment +
    zero-total sentinels) runs as a per-ts window; k=1 reproduces the
    sequential engine's pop order and p-ranks (pinned)."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        k: int = 1,
        alpha: float = 0.15,
        beta: float = 0.8,
        epsilon: float = 1e-3,
        work_dir: str | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.k = int(k)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="ttrtimewave-")
        self._ckpt = WaveCheckpoint(spark, checkpoint_dir) if checkpoint_dir else None
        adapted = with_symbol_identity(edges).select(
            F.col("address_from").alias("from"),
            F.col("address_to").alias("to"),
            F.col("value_d").alias("value"),
            F.col("timestamp").cast("long").alias("ts"),
            F.col("block_number").alias("_bn"),
            F.col("id"),
        )
        self._outs = adapted.select(
            F.col("from").alias("node"), F.col("to").alias("target"),
            "value", "ts", "_bn", "id",
        ).persist()
        self._ins = adapted.select(
            F.col("to").alias("node"), F.col("from").alias("target"),
            "value", "ts", "_bn", "id",
        ).persist()

    def _pop_log(self) -> PopLog:
        return PopLog(
            self.spark, POP_LOG_SCHEMA, self._work_dir,
            durable_dir=self._ckpt.pop_log_dir() if self._ckpt else None,
        )

    def _seed(self, source: str, wave: int):
        """The reference's one-time seed (strategies_vec._seed): per-edge
        chip assignment on the source in canonical order (last writer at
        a timestamp wins, out-branch condition checked first per row),
        plus sentinel chips when a side has zero total value."""
        touch = self._outs.where(F.col("node") == source).withColumn(
            "_is_out", F.lit(True)
        ).unionByName(
            self._ins.where(F.col("node") == source)
            .withColumn("_is_out", F.lit(False))
        )
        # in/out TOTALS count every edge on that side — INCLUDING
        # self-loops on the in side (the sequential seed's is_in_any mask
        # is `to == source` with no self-exclusion; the wave property
        # tests caught an all-self-loop source getting a spurious
        # in-sentinel chip from a self-loop-excluded in_total of 0)
        tot = touch.agg(
            F.sum(F.when(F.col("_is_out"), F.col("value"))).alias("out_total"),
            F.sum(F.when(~F.col("_is_out"), F.col("value"))).alias("in_total"),
        ).collect()[0]  # two scalars — bounded driver traffic
        out_total = float(tot.out_total or 0.0)
        in_total = float(tot.in_total or 0.0)
        out_coeff = (1 - self.alpha) * self.beta
        in_coeff = (1 - self.alpha) * (1 - self.beta)
        # chip ASSIGNMENT still sees a self-loop once, via its out branch
        # (the sequential per-row loop checks `from == source` first, so
        # the elif in-branch never fires for a self-loop row): in-side
        # self-loop rows get NULL here and drop out below
        val = (
            F.when(F.col("_is_out") & F.lit(out_total != 0.0),
                   F.lit(out_coeff) * F.col("value") / F.lit(out_total or 1.0))
            .when((~F.col("_is_out")) & (F.col("target") != source)
                  & F.lit(in_total != 0.0),
                  F.lit(in_coeff) * F.col("value") / F.lit(in_total or 1.0))
        )
        # canonical write order: (_bn, ts, id) with the out branch of a
        # row evaluated first — last writer per timestamp wins
        pos_w = Window.partitionBy("node").orderBy("_bn", "ts", "id", F.col("_is_out").desc())
        win_w = Window.partitionBy("node", "ts").orderBy(F.desc("_pos"))
        chips = (
            touch.withColumn("_v", val).where(F.col("_v").isNotNull())
            .withColumn("_pos", F.row_number().over(pos_w))
            .withColumn("_rn", F.row_number().over(win_w))
            .where(F.col("_rn") == 1)
            .select("node", "ts", F.col("_v").alias("val"))
        )
        sentinels = []
        if out_total == 0.0:
            sentinels.append((source, 0, out_coeff))
        if in_total == 0.0:
            sentinels.append((source, (1 << 63) - 1, in_coeff))
        if sentinels:
            chips = chips.unionByName(self.spark.createDataFrame(sentinels, CHIPS_SCHEMA))
        return chips

    def _direction(self, chips_pop: DataFrame, side_edges: DataFrame,
                   wave: int, forward: bool):
        """One push direction over the popped nodes' chips: returns
        (new_chip_rows with fk, recycled_chip_rows). Two range-frame
        windows over the chips∪edges union, one sort."""
        coeff = (1 - self.alpha) * (self.beta if forward else 1 - self.beta)
        edges = side_edges.select(
            "node", "ts",
            F.col("value").alias("ev"), F.lit(0.0).alias("cv"),
            F.lit(True).alias("is_edge"), "target", "_bn", "id", "_pseq", "_slot_base",
        )
        chip_rows = chips_pop.select(
            "node", "ts",
            F.lit(0.0).alias("ev"), F.col("val").alias("cv"),
            F.lit(False).alias("is_edge"),
            F.lit(None).cast("string").alias("target"),
            F.lit(0).cast("long").alias("_bn"), F.lit("").alias("id"),
            F.lit(None).cast("long").alias("_pseq"), F.lit(0).cast("long").alias("_slot_base"),
        )
        u = edges.unionByName(chip_rows)
        part = Window.partitionBy("node")
        ordered = Window.partitionBy("node").orderBy("ts")
        # edge-value mass at ≤ts / <ts of each row (range frames handle
        # timestamp ties exactly like searchsorted side right/left)
        prefix_le = F.sum("ev").over(ordered.rangeBetween(Window.unboundedPreceding, 0))
        prefix_lt = F.sum("ev").over(ordered.rangeBetween(Window.unboundedPreceding, -1))
        total_ev = F.sum("ev").over(part)
        W = (total_ev - prefix_le) if forward else prefix_lt
        u = u.withColumn(
            "_contrib",
            F.when((~F.col("is_edge")) & (W > 0), F.col("cv") / W).otherwise(F.lit(0.0)),
        )
        # backward needs "chips with ts STRICTLY > edge ts"; a
        # rangeBetween(1, following) frame over ts computes ts+1 per row,
        # which overflows int64 on the 2^63-1 in-sentinel chip — order by
        # the NEGATED ts instead, whose -1 bound lands exactly on min-long
        # (same partitioning ⇒ an extra in-partition sort, no shuffle)
        u = u.withColumn("_nts", -F.col("ts"))
        density = (
            F.sum("_contrib").over(ordered.rangeBetween(Window.unboundedPreceding, -1))
            if forward else
            F.sum("_contrib").over(
                Window.partitionBy("node").orderBy("_nts")
                .rangeBetween(Window.unboundedPreceding, -1))
        )
        edge_bound = (
            F.max(F.when(F.col("is_edge"), F.col("ts"))).over(part) if forward
            else F.min(F.when(F.col("is_edge"), F.col("ts"))).over(part)
        )
        u = u.withColumn("_density", F.coalesce(density, F.lit(0.0))).withColumn(
            "_bound", edge_bound
        )
        # new chips: one per edge row, at the edge's timestamp, slotted in
        # the side's ts-sorted canonical order for the first-touch key
        slot_w = Window.partitionBy("node").orderBy("ts", "_bn", "id")
        new_chips = (
            u.where(F.col("is_edge"))
            .withColumn("_srank", F.row_number().over(slot_w).cast("long"))
            .select(
                F.col("target").alias("node"), "ts",
                (F.lit(coeff) * F.col("ev") * F.col("_density")).alias("val"),
                F.struct(
                    F.lit(wave).cast("long").alias("wave"),
                    F.col("_pseq").alias("pseq"),
                    (F.col("_slot_base") + F.col("_srank")).alias("slot"),
                ).alias("fk"),
            )
            # zero-value chips are kept deliberately: the sequential
            # kernel adds them too, and their FIRST TOUCH fixes the
            # node's insertion-order tiebreak
        )
        # consumption requires an ACTUAL eligible edge: a node with no
        # edges on this side has _bound NULL and recycles every chip —
        # including the ts=2^63-1 in-sentinel, which a coalesced finite
        # bound would silently consume (the sequential kernel's
        # searchsorted over an empty edge set never consumes)
        consumed = F.col("_bound").isNotNull() & (
            (F.col("ts") < F.col("_bound")) if forward
            else (F.col("ts") > F.col("_bound"))
        )
        recycled = (
            u.where((~F.col("is_edge")) & (~consumed))
            .select("node", "ts", (F.lit(coeff) * F.col("cv")).alias("val"))
        )
        return new_chips, recycled

    def run(self, source: str, max_pops: int | None = None) -> TtrTimeWaveState:
        spark = self.spark
        st = TtrTimeWaveState(
            wave=0,
            chips=spark.createDataFrame([(source, 0, 1.0)], CHIPS_SCHEMA)
            .localCheckpoint(eager=True),
            meta=spark.createDataFrame([(source, 0.0, (0, -1, -1))], TTRTIME_META_SCHEMA)
            .localCheckpoint(eager=True),
            pop_log_df=None,
            next_seq=0,
        )
        plog = self._pop_log()
        st.pop_log_df = plog.df
        return self._run_from(st, plog, source, seeded=False, max_pops=max_pops)

    def resume(self, source: str, max_pops: int | None = None) -> TtrTimeWaveState:
        if self._ckpt is None:
            raise ValueError("resume() requires checkpoint_dir")
        wave = self._ckpt.latest_wave()
        if wave is None:
            raise FileNotFoundError(f"no wave snapshot under {self._ckpt.dir}")
        tables, scalars = self._ckpt.load(wave, ["chips", "meta"])
        plog = self._pop_log()
        st = TtrTimeWaveState(
            wave=wave,
            chips=tables["chips"].localCheckpoint(eager=True),
            meta=tables["meta"].localCheckpoint(eager=True),
            pop_log_df=plog.load_upto(wave),
            next_seq=scalars["next_seq"], lineage=scalars["lineage"],
        )
        return self._run_from(st, plog, source,
                              seeded=scalars["seeded"], max_pops=max_pops)

    def _run_from(self, st: TtrTimeWaveState, plog: PopLog, source: str,
                  seeded: bool, max_pops: int | None = None) -> TtrTimeWaveState:
        spark = self.spark
        pop_order = [F.desc("r"), F.asc("fk")]
        seq_w = Window.partitionBy(F.lit(0)).orderBy(*pop_order)
        while True:
            wave = st.wave + 1
            budget = self.k
            if max_pops is not None:
                budget = min(budget, max_pops - st.next_seq)
            if budget <= 0:
                break
            sums = st.chips.groupBy("node").agg(F.sum("val").alias("r"))
            eligible = (
                sums.where(F.col("r") > self.epsilon)
                .join(st.meta.select("node", "fk"), on="node", how="inner")
            )
            ensure_wave_aligned(eligible, budget, self.k, wave, max_pops)
            popped = (
                eligible
                .orderBy(*pop_order).limit(budget)
                .withColumn("seq", (F.lit(st.next_seq) - 1
                                    + F.row_number().over(seq_w)).cast("long"))
                .select("seq", "node", F.col("r").alias("residual"))
                .localCheckpoint(eager=True)
            )
            n_pops = popped.count()
            if n_pops == 0:
                break
            pop_log_df = plog.append(
                popped.select("seq", "node", "residual",
                              F.lit(wave).cast("long").alias("wave")),
                wave,
            )

            if not seeded:
                # wave 1 pops the source: the first push only SEEDS
                # (reference VecTtrTime.push); the source keeps its
                # seeded chips and its pre-seed unit chip is consumed
                seeded = True
                new_chips = self._seed(source, wave).localCheckpoint(eager=True)
                new_meta = (
                    st.meta.withColumn(
                        "p",
                        F.when(F.col("node") == source, F.lit(self.alpha))
                        .otherwise(F.col("p")),
                    ).localCheckpoint(eager=True)
                )
            else:
                pop_key = popped.select("node", F.col("seq").alias("_pseq"),
                                        F.col("residual").alias("_r"))
                chips_pop = st.chips.join(F.broadcast(pop_key.select("node")),
                                          on="node", how="leftsemi")
                rest = st.chips.join(F.broadcast(pop_key.select("node")),
                                     on="node", how="left_anti")
                fwd_edges = self._outs.join(F.broadcast(pop_key), on="node", how="inner")
                n_fwd = fwd_edges.groupBy("node").agg(
                    F.count("*").cast("long").alias("_nf"))
                bwd_edges = (
                    self._ins.join(F.broadcast(pop_key), on="node", how="inner")
                    .join(F.broadcast(n_fwd), on="node", how="left")
                )
                fwd_new, fwd_rec = self._direction(
                    chips_pop,
                    fwd_edges.withColumn("_slot_base", F.lit(0).cast("long")),
                    wave, forward=True)
                bwd_new, bwd_rec = self._direction(
                    chips_pop,
                    bwd_edges.withColumn(
                        "_slot_base", F.coalesce(F.col("_nf"), F.lit(0)).cast("long")
                    ).drop("_nf"),
                    wave, forward=False)
                new_chips = (
                    rest.unionByName(fwd_new.drop("fk"))
                    .unionByName(bwd_new.drop("fk"))
                    .unionByName(fwd_rec).unionByName(bwd_rec)
                    .groupBy("node", "ts").agg(F.sum("val").alias("val"))
                    .localCheckpoint(eager=True)
                )
                # meta: p += α·r for pops; first-touch fk for new nodes
                fk_new = fwd_new.select("node", "fk").unionByName(
                    bwd_new.select("node", "fk"))
                base_meta = (
                    st.meta.join(F.broadcast(pop_key.select("node", "_r")),
                                 on="node", how="left")
                    .select(
                        "node",
                        (F.col("p") + F.coalesce(F.col("_r") * self.alpha,
                                                 F.lit(0.0))).alias("p"),
                        "fk",
                    )
                )
                new_meta = (
                    base_meta.unionByName(
                        fk_new.select("node", F.lit(0.0).alias("p"), "fk"))
                    .groupBy("node")
                    .agg(F.sum("p").alias("p"), F.min("fk").alias("fk"))
                    .localCheckpoint(eager=True)
                )
            st = TtrTimeWaveState(
                wave=wave,
                chips=new_chips,
                meta=new_meta,
                pop_log_df=pop_log_df,
                next_seq=st.next_seq + n_pops,
                lineage=st.lineage,
            )
            st.lineage.append({"wave": wave, "pops": n_pops, "next_seq": st.next_seq})
            if self._ckpt is not None:
                self._ckpt.save(wave, {"chips": new_chips, "meta": new_meta}, {
                    "next_seq": st.next_seq, "lineage": st.lineage,
                    "seeded": seeded,
                })
        return st
