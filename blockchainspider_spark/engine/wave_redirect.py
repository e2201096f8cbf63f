"""Wave-batched TTRRedirect — the last weighted strategy family to get a
DataFrame-resident throughput engine (reference strategies/txs/ttr.py
TTRRedirect, :334-825; sequential twin engine/strategies_vec.VecTtrRedirect).

Division of labor, per SURVEY §2.5:

* **state + pop (A12/A13)** — chips live in a ``(node, symbol, ts, val)``
  DataFrame; each wave's pop is one ``groupBy(node).sum`` plus a
  TakeOrderedAndProject top-k on ``(r desc, fk asc)`` where ``fk`` is the
  first-touch key reproducing the sequential chips-dict insertion-order
  tiebreak (same contract as the other wave engines).
* **A9 seed + A10 chip merge** — pure DataFrame aggregations: the seed's
  per-symbol in/out sums are one ``groupBy(symbol)`` (with the reference's
  scan-order quirks as ``when`` chains), and every wave's chip merge is
  ``groupBy(node, symbol, ts).sum(val)``.
* **J8 netting + A7-shaped distribution + A11 walk** — one
  ``applyInPandas`` kernel per POPPED node over its edge slice ∪ chip
  slice. The reference's move-to-end / sign-flip-timestamp netting fold
  and the swap-leg stack walk are genuinely sequential *within a node's
  batch* (the set-level netting is separately pinned as a DataFrame agg by
  the a8 gate row); the kernel reuses the vectorized per-node strategy
  (``VecTtrRedirect``) so the wave engine and the exact engine share one
  numeric core — k=1 parity is then structural, and the oracle/ ports
  remain the independent implementation for equivalence tests.

Scale shape: per wave, the only non-broadcast exchanges are the chip
merge groupBy and the applyInPandas grouping over ≤k popped nodes;
edges are probed via an IN-filtered broadcast join of the (≤k)-row pop
set against the endpoint-exploded touch view, which is materialized
ONCE as parquet range-clustered + sorted on ``node`` (r7) so the probe
filter pushes into the scan and row-group stats skip everything but the
popped nodes' edges — the node-bucketed table layout of a real cluster,
without pinning a multi-GB view in executor storage. State is
localCheckpoint'ed per wave; ``checkpoint_dir`` (durable parquet
snapshots + ``resume``) mirrors the other engines.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchainspider_spark.engine.wave_common import (
    PopLog,
    WaveCheckpoint,
    WaveTrace,
    ensure_wave_aligned,
)
from blockchainspider_spark.operators.transfers import with_symbol_identity

REDIRECT_CHIPS_SCHEMA = "node string, symbol string, ts long, val double"
# r7b: meta additionally carries ``r`` — the node's current chip sum
# (the pop rank). Folding r into the per-wave meta aggregation makes the
# pop a TakeOrderedAndProject over the materialized state: the per-wave
# full-chips groupBy + meta join job is gone (guide §2.4).
REDIRECT_META_SCHEMA = (
    "node string, p double, fk struct<wave:long,pseq:long,slot:long>, r double"
)
# fused per-wave fold row: chips rows (_tag 'c') and meta rows (_tag 'm')
# materialize in ONE localCheckpoint job instead of two
_FOLD_SCHEMA_COLS = ("_tag", "node", "symbol", "ts", "val", "p", "fk", "r")
_PUSH_OUT_SCHEMA = "node string, symbol string, ts long, val double, pseq long, slot long"
# stage-A output of the hub path: one row per surviving netted swap leg.
# (cbn, cts, cid) is the (block, ts, id) triple of the edge that last
# (re)created the hash's legs dict — sorting on it reproduces the
# sequential scan's hash insertion order exactly; `ord` orders legs
# within a swap (newest first, the reference's reversed-items order).
_NET_SCHEMA = ("_node string, _pseq long, cbn long, cts long, cid string, "
               "ord long, cp string, value double, ts long, symbol string")
# stage-B input: netted legs ∪ the popped hub's chips, one group per node
_HUB_IN_SCHEMA = ("_node string, _pseq long, _kind string, symbol string, "
                  "ts long, cval double, cbn long, cts long, cid string, "
                  "ord long, cp string, value double")
_MAX_TS = (1 << 63) - 1  # sys.maxsize — the reference's in-sentinel stamp


def _emit_model_chips(model, pseq: int):
    """Shared kernel tail: flatten the strategy's chips dict to the
    push-output rows, slot = the node's insertion position in the dict
    (= the sequential pop tiebreak)."""
    import pandas as pd

    out = {"node": [], "symbol": [], "ts": [], "val": [], "pseq": [], "slot": []}
    for slot, (n, chips_d) in enumerate(model.chips.items()):
        for (sym, ts), v in chips_d.items():
            out["node"].append(n)
            out["symbol"].append(sym)
            out["ts"].append(int(ts))
            out["val"].append(float(v))
            out["pseq"].append(pseq)
            out["slot"].append(slot)
    return pd.DataFrame({
        "node": pd.Series(out["node"], dtype=object),
        "symbol": pd.Series(out["symbol"], dtype=object),
        "ts": pd.Series(out["ts"], dtype="int64"),
        "val": pd.Series(out["val"], dtype="float64"),
        "pseq": pd.Series(out["pseq"], dtype="int64"),
        "slot": pd.Series(out["slot"], dtype="int64"),
    })


def _netting_kernel():
    """Stage A of the hub push: J8 netting over ONE (node, hash-bucket)
    slice. The reference's per-hash move-to-end + sign-flip-timestamp
    fold (strategies/txs/ttr.py:540-583) only reads edges of a single
    hash in scan order, so bucketing by hash distributes the O(E)
    Python loop that otherwise makes a popped hub a single-task
    straggler. Emits each surviving leg with its swap's creation triple
    so stage B can reassemble the exact sequential swap order."""

    def kernel(pdf):
        import pandas as pd

        node = pdf["_node"].iloc[0]
        pseq = int(pdf["_pseq"].iloc[0])
        ed = pdf.sort_values(["_bn", "timeStamp", "id"], kind="mergesort")
        frm = ed["from"].to_numpy()
        to = ed["to"].to_numpy()
        val = ed["value"].to_numpy(dtype="float64")
        ts = ed["timeStamp"].to_numpy(dtype="int64")
        sym = ed["symbol"].to_numpy()
        hsh = ed["hash"].to_numpy()
        bn = ed["_bn"].to_numpy(dtype="int64")
        eid = ed["id"].to_numpy()

        # hash → [legs dict (move-to-end), creation (bn, ts, id)];
        # deleting on empty and re-creating on a later edge reproduces
        # the sequential fold's setdefault re-insertion order
        state: dict = {}
        for i in range(len(val)):
            h = hsh[i]
            st = state.get(h)
            if st is None:
                st = [{}, (int(bn[i]), int(ts[i]), str(eid[i]))]
                state[h] = st
            legs = st[0]
            if frm[i] == node:
                cp, v = to[i], -float(val[i])
            else:
                cp, v = frm[i], float(val[i])
            key = (sym[i], cp)
            held = legs.pop(key, None)
            t = int(ts[i])
            if held is None:
                if v != 0:
                    legs[key] = [v, t]
            else:
                total = held[0] + v
                if total != 0:
                    legs[key] = [total, t if (v > 0) == (total > 0) else held[1]]
            if not legs:
                del state[h]

        out = {"cbn": [], "cts": [], "cid": [], "ord": [], "cp": [],
               "value": [], "ts": [], "symbol": []}
        for legs, (cbn, cts, cid) in state.values():
            for o, ((s, cp), (v, t)) in enumerate(reversed(list(legs.items()))):
                out["cbn"].append(cbn)
                out["cts"].append(cts)
                out["cid"].append(cid)
                out["ord"].append(o)
                out["cp"].append(cp)
                out["value"].append(float(v))
                out["ts"].append(int(t))
                out["symbol"].append(s)
        n = len(out["cbn"])
        return pd.DataFrame({
            "_node": pd.Series([node] * n, dtype=object),
            "_pseq": pd.Series([pseq] * n, dtype="int64"),
            "cbn": pd.Series(out["cbn"], dtype="int64"),
            "cts": pd.Series(out["cts"], dtype="int64"),
            "cid": pd.Series(out["cid"], dtype=object),
            "ord": pd.Series(out["ord"], dtype="int64"),
            "cp": pd.Series(out["cp"], dtype=object),
            "value": pd.Series(out["value"], dtype="float64"),
            "ts": pd.Series(out["ts"], dtype="int64"),
            "symbol": pd.Series(out["symbol"], dtype=object),
        })

    return kernel


def _hub_walk_kernel(alpha: float, beta: float, epsilon: float,
                     max_walk_legs: int | None):
    """Stage B of the hub push: rebuild the node's swaps from the
    pre-netted legs (hashes in creation-triple order, legs in emitted
    order) and run the genuinely sequential distribute + A11 walk via
    the shared ``VecTtrRedirect.push_swaps`` core. Input is netted legs
    — usually far smaller than the raw edge slice — so the irreducible
    single-task work is the walk itself; ``max_walk_legs`` is the loud
    bound on that residue."""

    def kernel(pdf):
        from blockchainspider_spark.engine.strategies_vec import (
            VecTtrRedirect,
            _EngineSwap,
        )
        from blockchainspider_spark.functions.redirect_walk import Profit

        node = pdf["_node"].iloc[0]
        pseq = int(pdf["_pseq"].iloc[0])
        model = VecTtrRedirect(
            "\x00-no-source", alpha=alpha, beta=beta, epsilon=epsilon
        )
        model._seeded = True  # non-seed push path
        d = model._chips_of(node)
        chips_rows = pdf[pdf["_kind"] == "c"].sort_values(
            ["ts", "symbol"], kind="mergesort"
        )
        for sym, t, v in zip(chips_rows["symbol"], chips_rows["ts"],
                             chips_rows["cval"]):
            key = (sym, int(t))
            d[key] = d.get(key, 0.0) + float(v)

        net = pdf[pdf["_kind"] == "n"]
        if max_walk_legs is not None and len(net) > max_walk_legs:
            raise RuntimeError(
                f"popped hub node {node!r} still has {len(net)} netted swap "
                f"legs after the distributed J8 stage, above "
                f"max_walk_legs={max_walk_legs}: the A11 walk over them is "
                "genuinely sequential (cross-symbol stack DFS) and cannot be "
                "chunked. Raise the cap "
                "(TtrRedirectWaveEngine(max_walk_legs=...)) after sizing "
                "executor memory for it, or crawl this graph with the "
                "sequential ExactCrawlEngine."
            )
        net = net.sort_values(["cbn", "cts", "cid", "ord"], kind="mergesort")
        swaps: list = []
        cur_key = None
        cur_profits: list = []
        for cbn, cts, cid, cp, v, t, s in zip(
            net["cbn"], net["cts"], net["cid"], net["cp"],
            net["value"], net["ts"], net["symbol"],
        ):
            k = (cbn, cts, cid)
            if k != cur_key:
                cur_profits = []
                swaps.append(_EngineSwap(cur_profits))
                cur_key = k
            cur_profits.append(Profit(cp, float(v), int(t), s))
        model.push_swaps(node, swaps)
        return _emit_model_chips(model, pseq)

    return kernel


@dataclass
class TtrRedirectWaveState:
    wave: int
    chips: DataFrame               # (node, symbol, ts, val)
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


def _push_kernel(alpha: float, beta: float, epsilon: float,
                 max_push_edges: int = 1_000_000):
    """Per-popped-node push: rebuild the node's chip dict, run the shared
    per-node strategy core (J8 netting → temporal distribution → A11
    walk → recycle), emit every produced chip row with its first-touch
    slot (= the node's insertion position in the strategy's chips dict —
    exactly the sequential pop tiebreak).

    **Hub-node bound.** Nodes whose touching-edge count exceeds
    ``max_push_edges`` are routed AROUND this kernel by the engine
    (two-stage hub path: distributed per-hash-bucket J8 netting, then
    the sequential walk over only the surviving legs — see
    ``_netting_kernel`` / ``_hub_walk_kernel``), so the in-task check
    here is a defensive assertion that the routing held, not the
    crawl-killing abort it was before round 6."""

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        from blockchainspider_spark.engine.strategies_vec import VecTtrRedirect

        node = pdf["_node"].iloc[0]
        pseq = int(pdf["_pseq"].iloc[0])
        model = VecTtrRedirect(
            "\x00-no-source", alpha=alpha, beta=beta, epsilon=epsilon
        )
        model._seeded = True  # non-seed push path
        d = model._chips_of(node)
        chips_rows = pdf[pdf["_kind"] == "c"].sort_values(
            ["timeStamp", "symbol"], kind="mergesort"
        )
        for sym, ts, v in zip(
            chips_rows["symbol"], chips_rows["timeStamp"], chips_rows["cval"]
        ):
            key = (sym, int(ts))
            d[key] = d.get(key, 0.0) + float(v)
        ed = pdf[pdf["_kind"] == "e"].sort_values(
            ["_bn", "timeStamp", "id"], kind="mergesort"
        )
        if len(ed) > max_push_edges:
            raise RuntimeError(
                f"popped hub node {node!r} has {len(ed)} touching edges, above "
                f"max_push_edges={max_push_edges}: its sequential A11 walk would "
                "make this wave's single Python task a straggler. Raise the cap "
                "(TtrRedirectWaveEngine(max_push_edges=...)) after sizing "
                "executor memory for it, or crawl this graph with the "
                "sequential ExactCrawlEngine."
            )
        batch = pd.DataFrame({
            "id": ed["id"].to_numpy(),
            "hash": ed["hash"].to_numpy(),
            "from": ed["from"].to_numpy(),
            "to": ed["to"].to_numpy(),
            "value": ed["value"].to_numpy(dtype=np.float64),
            "timeStamp": ed["timeStamp"].to_numpy(dtype=np.int64),
            "symbol": ed["symbol"].to_numpy(),
        })
        model.push(node, batch)
        out = {"node": [], "symbol": [], "ts": [], "val": [], "pseq": [], "slot": []}
        for slot, (n, chips_d) in enumerate(model.chips.items()):
            for (sym, ts), v in chips_d.items():
                out["node"].append(n)
                out["symbol"].append(sym)
                out["ts"].append(int(ts))
                out["val"].append(float(v))
                out["pseq"].append(pseq)
                out["slot"].append(slot)
        return pd.DataFrame({
            "node": pd.Series(out["node"], dtype=object),
            "symbol": pd.Series(out["symbol"], dtype=object),
            "ts": pd.Series(out["ts"], dtype="int64"),
            "val": pd.Series(out["val"], dtype="float64"),
            "pseq": pd.Series(out["pseq"], dtype="int64"),
            "slot": pd.Series(out["slot"], dtype="int64"),
        })

    return kernel


class TtrRedirectWaveEngine:
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
        max_push_edges: int = 1_000_000,
        hub_buckets: int = 64,
        max_walk_legs: int | None = 5_000_000,
        index_row_group_bytes: int = 4 * 1024 * 1024,
    ):
        self.spark = spark
        self.k = int(k)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self.max_push_edges = int(max_push_edges)
        self.hub_buckets = int(hub_buckets)
        self.max_walk_legs = max_walk_legs
        self._hub_nodes: frozenset | None = None
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="redirectwave-")
        self._ckpt = WaveCheckpoint(spark, checkpoint_dir) if checkpoint_dir else None
        adapted = with_symbol_identity(edges).select(
            F.col("id"),
            F.col("hash"),
            F.col("address_from").alias("from"),
            F.col("address_to").alias("to"),
            F.col("value_d").alias("value"),
            F.col("timestamp").cast("long").alias("ts"),
            F.col("symbol_identity").alias("symbol"),
            F.col("block_number").alias("_bn"),
        )
        # endpoint-exploded touch view: each edge once per DISTINCT
        # endpoint (a self-loop appears once, like the sequential
        # engine's OR-filtered batch). Materialized ONCE as parquet
        # range-clustered + sorted on `node` (r7): every wave's push
        # probes this view for the ≤k popped nodes' edges, and the
        # IN-filter pushes into the scan where the sorted layout's
        # row-group min/max stats skip everything else — the same
        # node-bucketed table layout the engine prescribes at cluster
        # scale, without pinning a multi-GB view in executor storage
        # memory (the cached form evicted into GC storms at sf≥1).
        touch_cols = adapted.select(
            F.explode(F.array_distinct(F.array("from", "to"))).alias("node"),
            "id", "hash", "from", "to", "value", "ts", "symbol", "_bn",
        )
        touch_path = os.path.join(self._work_dir, "touch_idx")
        # r7c: small row groups on the index write. The default 128 MB
        # block size left ONE row group per range file, so the per-wave
        # ≤k-node IN-probe could only prune at file granularity and
        # still scanned ~half the view (measured: ~12M of 24M rows per
        # wave at sf1.0). With ~4 MB row groups the same probe reads a
        # handful of narrow node ranges. Parameterized: a cluster
        # deployment sizes this with its bucketed-table row-group
        # policy; probe cost scales with row-group size, build cost is
        # one-time.
        (touch_cols
         .repartitionByRange(
             int(spark.conf.get("spark.sql.shuffle.partitions")), "node")
         .sortWithinPartitions("node")
         .write.mode("overwrite")
         .option("parquet.block.size", int(index_row_group_bytes))
         .parquet(touch_path))
        self._touch = spark.read.parquet(touch_path)
        # the hub-degree census is an engine INDEX (one scan, like the
        # touch view itself) — build it at construction, not lazily in
        # the middle of the first push wave (r7: it was a full-touch
        # groupBy + collect silently charged to wave 2)
        self._hub_node_set()

    POP_LOG_SCHEMA = "seq long, node string, residual double, wave long"

    def _hub_node_set(self) -> frozenset:
        """Degree census for hub routing, computed once per engine (on
        a cluster: the skew census you would persist next to the touch
        view). Nodes with more than ``max_push_edges`` touching edges
        are pushed through the two-stage path — distributed J8 netting
        per hash bucket, then the sequential walk over the surviving
        legs only — instead of landing their whole raw edge slice in
        one Python task."""
        if self._hub_nodes is None:
            deg = self._touch.groupBy("node").agg(F.count("*").alias("deg"))
            self._hub_nodes = frozenset(
                r["node"]
                for r in deg.where(F.col("deg") > self.max_push_edges).collect()
            )
        return self._hub_nodes

    def _pop_log(self) -> PopLog:
        return PopLog(
            self.spark, self.POP_LOG_SCHEMA, self._work_dir,
            durable_dir=self._ckpt.pop_log_dir() if self._ckpt else None,
        )

    def _hub_netted(self, hub_key: DataFrame,
                    hub_nodes: list | None = None) -> DataFrame:
        """Stage A of the hub push: broadcast the (≤k)-row hub pop set
        against the touch view, bucket by hash, and net each (node,
        bucket) slice in one grouped Arrow kernel. Factored out so
        tools/explain_audit.py can pin the physical shape (broadcast
        probe join + FlatMapGroupsInPandas, raw edges shuffled exactly
        once on the bucket key). ``hub_nodes`` (when known) adds the
        IN-filter that lets the clustered cache prune batches."""
        touch = (self._touch.where(F.col("node").isin(hub_nodes))
                 if hub_nodes else self._touch)
        return (
            touch.join(F.broadcast(hub_key.select("node", "_pseq")),
                       on="node", how="inner")
            .select(
                F.col("node").alias("_node"), "_pseq",
                "id", "hash", "from", "to", "value",
                F.col("ts").alias("timeStamp"), "_bn", "symbol",
                F.pmod(F.xxhash64("hash"),
                       F.lit(self.hub_buckets)).alias("_bucket"),
            )
            .groupBy("_node", "_bucket")
            .applyInPandas(_netting_kernel(), _NET_SCHEMA)
        )

    def _seed_chips(self, source: str, wave: int) -> tuple[DataFrame, int]:
        """The reference's one-time seed as DataFrame aggregations (A9):
        per-symbol in/out sums with the scan-order quirks — self-loops
        count into in_sum (`to` checked first), but scatter checks `from`
        first — then per-edge chip values, plus per-symbol sentinel chips
        (out_sum==0 → ts=0 out-coeff chip, elif in_sum==0 → ts=maxint
        in-coeff chip). Returns (chip rows with first-touch slots,
        n_symbols) — p[source] becomes α·n_symbols."""
        # one bounded parquet probe, cached: sums, the chip join, and the
        # slot assignment all read the seed's edge slice — without the
        # persist each consumer re-scans the touch index (r7b)
        t = self._touch.where(F.col("node") == source).persist()
        is_in = F.col("to") == source
        is_out = (F.col("from") == source) & (~is_in)
        sums = t.groupBy("symbol").agg(
            F.coalesce(F.sum(F.when(is_in, F.col("value"))), F.lit(0.0)).alias("in_sum"),
            F.coalesce(F.sum(F.when(is_out, F.col("value"))), F.lit(0.0)).alias("out_sum"),
        ).persist()
        n_symbols = sums.count()
        out_coeff = (1 - self.alpha) * self.beta
        in_coeff = (1 - self.alpha) * (1 - self.beta)
        j = t.join(F.broadcast(sums), on="symbol", how="inner")
        out_branch = (F.col("from") == source) & (F.col("out_sum") != 0.0)
        in_branch = (F.col("to") == source) & (F.col("in_sum") != 0.0)
        chip_val = (
            F.when(out_branch, F.lit(out_coeff) * F.col("value") / F.col("out_sum"))
            .when(in_branch, F.lit(in_coeff) * F.col("value") / F.col("in_sum"))
        )
        chip_tgt = F.when(out_branch, F.col("to")).when(in_branch, F.col("from"))
        # slot = canonical edge rank over ALL of the seed's edges.
        # assign_global_seq is adaptive (VERDICT r5 ceiling-class note):
        # ≤ threshold rows run the old single-task window; a 10^7-degree
        # seed takes the distributed range-partitioned path instead of
        # funneling every edge through one task. The persist it takes is
        # reused by the second consumption (fk_new) in _run_from; freed
        # with the engine.
        from blockchainspider_spark.engine.distseq import assign_global_seq

        base = j.withColumn("_v", chip_val).withColumn("_tgt", chip_tgt)
        assignment = assign_global_seq(base, ["_bn", "ts", "id"],
                                       base_seq=0, seq_col="slot")
        chips = (
            assignment.df
            .where(F.col("_v").isNotNull() & (F.col("_v") > 0))
            .select(
                F.col("_tgt").alias("node"), "symbol",
                F.col("ts"), F.col("_v").alias("val"), "slot",
            )
        )
        sentinel = (
            F.when(
                F.col("out_sum") == 0.0,
                F.struct(F.lit(0).cast("long").alias("ts"),
                         F.lit(out_coeff).alias("val")),
            ).when(
                F.col("in_sum") == 0.0,
                F.struct(F.lit(_MAX_TS).cast("long").alias("ts"),
                         F.lit(in_coeff).alias("val")),
            )
        )
        sent = (
            sums.withColumn("_s", sentinel)
            .where(F.col("_s").isNotNull())
            .select(
                F.lit(source).alias("node"), "symbol",
                F.col("_s.ts").alias("ts"), F.col("_s.val").alias("val"),
                F.lit(0).cast("long").alias("slot"),  # targets the source: fk unchanged
            )
        )
        return chips.unionByName(sent), n_symbols

    def run(self, source: str, max_pops: int | None = None) -> TtrRedirectWaveState:
        spark = self.spark
        plog = self._pop_log()
        st = TtrRedirectWaveState(
            wave=0,
            # scaffold unit chip so wave 1 pops the source (consumed at seed)
            chips=spark.createDataFrame([(source, "", 0, 1.0)], REDIRECT_CHIPS_SCHEMA)
            .localCheckpoint(eager=True),
            # r mirrors the scaffold chip's sum so the seed is poppable
            meta=spark.createDataFrame([(source, 0.0, (0, -1, -1), 1.0)],
                                       REDIRECT_META_SCHEMA)
            .localCheckpoint(eager=True),
            pop_log_df=plog.df,
            next_seq=0,
        )
        return self._run_from(st, plog, source, seeded=False, max_pops=max_pops)

    def resume(self, source: str, max_pops: int | None = None) -> TtrRedirectWaveState:
        if self._ckpt is None:
            raise ValueError("resume() requires checkpoint_dir")
        wave = self._ckpt.latest_wave()
        if wave is None:
            raise FileNotFoundError(f"no wave snapshot under {self._ckpt.dir}")
        tables, scalars = self._ckpt.load(wave, ["chips", "meta"])
        plog = self._pop_log()
        st = TtrRedirectWaveState(
            wave=wave,
            chips=tables["chips"].localCheckpoint(eager=True),
            meta=tables["meta"].localCheckpoint(eager=True),
            pop_log_df=plog.load_upto(wave),
            next_seq=scalars["next_seq"], lineage=scalars["lineage"],
        )
        return self._run_from(st, plog, source,
                              seeded=scalars["seeded"], max_pops=max_pops)

    POPPED_SCHEMA = "seq long, node string, residual double"

    def _run_from(self, st: TtrRedirectWaveState, plog: PopLog, source: str,
                  seeded: bool, max_pops: int | None = None) -> TtrRedirectWaveState:
        pop_order = [F.desc("r"), F.asc("fk")]
        kernel = _push_kernel(self.alpha, self.beta, self.epsilon,
                              self.max_push_edges)
        while True:
            wave = st.wave + 1
            tr = WaveTrace(f"redirect w{wave}")
            budget = self.k
            if max_pops is not None:
                budget = min(budget, max_pops - st.next_seq)
            if budget <= 0:
                break
            # r7b: the pop rank r is state-resident (folded into meta by
            # the previous wave's single fold job), so eligibility is a
            # filter over the materialized state and the pop compiles to
            # TakeOrderedAndProject — the per-wave full-chips groupBy +
            # meta join job is gone (guide §2.4)
            eligible = st.meta.where(F.col("r") > self.epsilon)
            ensure_wave_aligned(eligible, budget, self.k, wave, max_pops)
            # top-k pop via driver collect (≤k rows — TakeOrdered merges
            # them on the driver anyway; same O(k) posture as the old
            # per-wave pop broadcast + the existing hub-routing collect):
            # seq assignment is trivial and downstream probes broadcast
            # the LocalRelation with no extra jobs (r7)
            pop_rows = (
                eligible.orderBy(*pop_order).limit(budget)
                .select("node", F.col("r").alias("residual")).collect()
            )
            n_pops = len(pop_rows)
            if n_pops == 0:
                break
            popped = self.spark.createDataFrame(
                [(st.next_seq + i, r["node"], r["residual"])
                 for i, r in enumerate(pop_rows)],
                self.POPPED_SCHEMA,
            )
            tr.mark("pop")
            pop_log_df = plog.append(
                popped.select("seq", "node", "residual",
                              F.lit(wave).cast("long").alias("wave")),
                wave,
            )

            if not seeded:
                seeded = True
                seed_rows, n_symbols = self._seed_chips(source, wave)
                chip_inputs = seed_rows.select("node", "symbol", "ts", "val")
                # meta-branch rows from the same seed rows: each carries
                # its first-touch struct AND its chip value as r, so one
                # groupBy(node) yields min(fk) == the old fk_new AND
                # sum(r) == the node's fresh chip sum (r7b)
                chip_meta_rows = seed_rows.select(
                    "node", F.lit(0.0).alias("p"),
                    F.struct(
                        F.lit(wave).cast("long").alias("wave"),
                        F.lit(0).cast("long").alias("pseq"),
                        F.col("slot").alias("slot"),
                    ).alias("fk"),
                    F.col("val").alias("r"),
                )
                base_meta = st.meta.select(
                    "node",
                    F.when(F.col("node") == source,
                           F.lit(self.alpha * n_symbols)).otherwise(F.col("p")).alias("p"),
                    "fk",
                    F.lit(0.0).alias("r"),
                )
            else:
                pop_key = popped.select("node", F.col("seq").alias("_pseq"),
                                        F.col("residual").alias("_r"))
                # ≤k pop nodes as plain IN-predicates: the chip split
                # needs no joins (r7; was a semi + an anti broadcast join
                # over the full chip state per wave)
                pop_nodes = [r["node"] for r in pop_rows]
                chips_pop = st.chips.where(F.col("node").isin(pop_nodes))
                rest = st.chips.where(~F.col("node").isin(pop_nodes))
                # hub routing: pops above the degree cap take the
                # two-stage path (distributed netting → walk on netted
                # legs); everything else takes the one-kernel fast path
                hubs = self._hub_node_set()
                tr.mark("census")
                pop_hub = [n for n in pop_nodes if n in hubs] if hubs else []
                parts = []
                if len(pop_hub) < n_pops:
                    norm_nodes = [n for n in pop_nodes if n not in pop_hub]
                    norm_key = (pop_key.where(~F.col("node").isin(pop_hub))
                                if pop_hub else pop_key)
                    # IN-filter before the probe join: the clustered
                    # cache skips every batch whose node range misses
                    # the ≤k pops (r7 — was a full touch scan per wave)
                    edges_part = (
                        self._touch.where(F.col("node").isin(norm_nodes))
                        .join(F.broadcast(norm_key.select("node", "_pseq")),
                              on="node", how="inner")
                        .select(
                            F.col("node").alias("_node"), "_pseq",
                            F.lit("e").alias("_kind"),
                            "id", "hash", "from", "to", "value",
                            F.col("ts").alias("timeStamp"), "_bn", "symbol",
                            F.lit(None).cast("double").alias("cval"),
                        )
                    )
                    chips_part = (
                        chips_pop.join(F.broadcast(norm_key.select("node", "_pseq")),
                                       on="node", how="inner")
                        .select(
                            F.col("node").alias("_node"), "_pseq",
                            F.lit("c").alias("_kind"),
                            F.lit("").alias("id"), F.lit("").alias("hash"),
                            F.lit(None).cast("string").alias("from"),
                            F.lit(None).cast("string").alias("to"),
                            F.lit(None).cast("double").alias("value"),
                            F.col("ts").alias("timeStamp"),
                            F.lit(0).cast("long").alias("_bn"), "symbol",
                            F.col("val").alias("cval"),
                        )
                    )
                    parts.append(
                        edges_part.unionByName(chips_part)
                        .groupBy("_node")
                        .applyInPandas(kernel, _PUSH_OUT_SCHEMA)
                    )
                if pop_hub:
                    hub_key = pop_key.where(F.col("node").isin(pop_hub))
                    netted = self._hub_netted(hub_key, hub_nodes=pop_hub)
                    net_in = netted.select(
                        "_node", "_pseq", F.lit("n").alias("_kind"),
                        "symbol", "ts",
                        F.lit(None).cast("double").alias("cval"),
                        "cbn", "cts", "cid", "ord", "cp", "value",
                    )
                    chips_hub = (
                        chips_pop.join(F.broadcast(hub_key.select("node", "_pseq")),
                                       on="node", how="inner")
                        .select(
                            F.col("node").alias("_node"), "_pseq",
                            F.lit("c").alias("_kind"),
                            "symbol", F.col("ts"),
                            F.col("val").alias("cval"),
                            F.lit(0).cast("long").alias("cbn"),
                            F.lit(0).cast("long").alias("cts"),
                            F.lit("").alias("cid"),
                            F.lit(0).cast("long").alias("ord"),
                            F.lit(None).cast("string").alias("cp"),
                            F.lit(None).cast("double").alias("value"),
                        )
                    )
                    walk = _hub_walk_kernel(self.alpha, self.beta,
                                            self.epsilon, self.max_walk_legs)
                    parts.append(
                        net_in.unionByName(chips_hub)
                        .groupBy("_node")
                        .applyInPandas(walk, _PUSH_OUT_SCHEMA)
                    )
                pushed = parts[0]
                for extra in parts[1:]:
                    pushed = pushed.unionByName(extra)
                # r7c: LAZY checkpoint — the push kernel executes inside
                # the same job that materializes the fold (the fold's
                # two branches read it; per-partition computation is
                # block-manager-synchronized, so the kernel still runs
                # once). Eliminates one eager job per wave.
                pushed = pushed.localCheckpoint(eager=False)
                tr.mark("push")
                chip_inputs = rest.unionByName(
                    pushed.select("node", "symbol", "ts", "val"))
                chip_meta_rows = pushed.select(
                    "node", F.lit(0.0).alias("p"),
                    F.struct(
                        F.lit(wave).cast("long").alias("wave"),
                        F.col("pseq").alias("pseq"),
                        F.col("slot").alias("slot"),
                    ).alias("fk"),
                    F.col("val").alias("r"),
                ).unionByName(rest.select(
                    "node", F.lit(0.0).alias("p"),
                    F.lit(None).cast(
                        "struct<wave:long,pseq:long,slot:long>").alias("fk"),
                    F.col("val").alias("r"),
                ))
                base_meta = (
                    st.meta.join(F.broadcast(pop_key.select("node", "_r")),
                                 on="node", how="left")
                    .select(
                        "node",
                        (F.col("p") + F.coalesce(F.col("_r") * self.alpha,
                                                 F.lit(0.0))).alias("p"),
                        "fk",
                        F.lit(0.0).alias("r"),
                    )
                )
            # fused per-wave fold (r7b, ONE materialization job): branch
            # 'c' is the A10 chip merge exactly as before; branch 'm'
            # folds meta in one groupBy — sum(p) (non-base rows carry
            # 0.0, float-exact), min(fk) (identical to the old fk_new
            # pre-agg + merge: min of the same structs; null fk on
            # chip-only rows is ignored by min), and sum(r) = the node's
            # fresh chip sum, which next wave's pop reads directly.
            fk_t = "struct<wave:long,pseq:long,slot:long>"
            fold_c = (
                chip_inputs.groupBy("node", "symbol", "ts")
                .agg(F.sum("val").alias("val"))          # A10 as a DataFrame agg
                .select(
                    F.lit("c").alias("_tag"), "node", "symbol", "ts", "val",
                    F.lit(None).cast("double").alias("p"),
                    F.lit(None).cast(fk_t).alias("fk"),
                    F.lit(None).cast("double").alias("r"),
                )
            )
            fold_m = (
                base_meta.unionByName(chip_meta_rows)
                .groupBy("node")
                .agg(F.sum("p").alias("p"), F.min("fk").alias("fk"),
                     F.sum("r").alias("r"))
                .select(
                    F.lit("m").alias("_tag"), "node",
                    F.lit(None).cast("string").alias("symbol"),
                    F.lit(None).cast("long").alias("ts"),
                    F.lit(None).cast("double").alias("val"),
                    "p", "fk", "r",
                )
            )
            # r7c: LAZY checkpoint — materializes (and truncates
            # lineage) inside the NEXT wave's pop job, whose TakeOrdered
            # scans every fold partition. One Spark job per wave where
            # r7b ran three (push ckpt + fold ckpt + pop); per-job fixed
            # cost dominates the tiny per-wave stage work on this graph.
            fold = fold_c.unionByName(fold_m).localCheckpoint(eager=False)
            new_chips = fold.where(F.col("_tag") == "c").select(
                "node", "symbol", "ts", "val")
            new_meta = fold.where(F.col("_tag") == "m").select(
                "node", "p", "fk", "r")
            tr.mark("fold")
            tr.done()
            st = TtrRedirectWaveState(
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
