"""Wave-batched distributed BFS crawl engine.

One Spark job per *depth level* (wave) instead of the reference's one
node per cycle — the throughput mode of SURVEY §7. The sequential
reference order is still reproduced **exactly**: BFS over a FIFO queue
is level-synchronized, so the k-th pop of the reference equals the k-th
row of this engine's frontier log when new nodes are ordered by their
first-enqueue key ``(parent_seq, edge_rank, endpoint_slot)`` — parent
pop order × canonical scan order of the parent's transfers × (from,to)
push order (reference bfs.py:27-29).

Per wave:

1. **expand** — one equi-join of the (persisted) endpoint-exploded edge
   view against the broadcast frontier; Catalyst pushes the depth guard
   and prunes columns into the scan.
2. **emit** — transfers dedup'd by id vs all previously emitted
   (left_anti at final materialization; reference pipelines/subgraph.py:9-27).
3. **schedule** — explode (from,to) children, anti-join the seen set
   (J7), keep min first-enqueue key per fingerprint, assign dense ``seq``.
4. **fetch** — join the images payload table, repartition by
   ``host_bucket`` (hot hosts salted), run the Arrow-batched fetch
   kernel (decode + PSNR/caption invariants + token-bucket pacing).
5. **checkpoint** — frontier/seen/lineage parquet snapshot per wave;
   ``resume()`` restarts mid-crawl from any wave.

Execution-cost discipline: the new frontier NEVER touches the driver.
``seq`` is assigned distributed (engine/distseq.py: range sort →
per-partition counts → offset prefix sums → per-partition row_number);
the driver materializes only one count row per partition. Each wave's
pops are written as a parquet table (``pop_log/wave=N``) — reading that
back gives the next frontier with flat lineage — and the pop log is
exposed as a DataFrame (``CrawlState.pop_log_df``); the list form
(``.pop_log``) is a convenience property that collects on access.

Scale design (100 TB / 10^10-URL frontier): the only per-wave shuffles
are the expand join (avoidable by bucketing edges on ``endpoint``), the
per-parent rank window, the seen anti-join (hash-partitioned on the
fingerprint; a Bloom pre-filter — functions/bloom.py — cuts the probe
side before the exact join), and the two seq-assignment exchanges. The
frontier is broadcast only while small (``broadcast_frontier``), else
it joins shuffle-side with AQE skew split. Driver memory per wave is
O(n_partitions), not O(frontier) — ``driver_rows_collected`` counts it.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blockchainspider_spark.engine.distseq import assign_global_seq
from blockchainspider_spark.functions.fingerprint import node_fingerprint
from blockchainspider_spark.functions.payload import FETCH_RESULT_SCHEMA, make_fetch_kernel
from blockchainspider_spark.operators.transfers import CANONICAL_ORDER_COLS, endpoint_exploded

FRONTIER_SCHEMA = "node string, depth int, seq long, wave int"
SEEN_SCHEMA = "fingerprint string, node string, wave int"
POP_SCHEMA = "node string, depth int, seq long, wave int, fingerprint string"


@dataclass
class CrawlState:
    wave: int
    frontier: DataFrame           # nodes to expand this wave
    seen: DataFrame               # (fingerprint, node, wave)
    frontier_size: int
    next_seq: int                 # pops assigned so far (seq values 0..next_seq-1)
    pop_log_df: DataFrame         # (node, depth, seq, wave, fingerprint) parquet-backed
    lineage: list = field(default_factory=list)   # per-wave metrics dicts

    @property
    def pop_log(self) -> list[tuple[int, str, int]]:
        """Ordered pop log as (seq, node, depth) tuples. Collects the
        parquet-backed log to the driver — a deliberate user action for
        tests/small crawls, never required by the engine itself."""
        return [
            (r.seq, r.node, r.depth)
            for r in self.pop_log_df.select("seq", "node", "depth").orderBy("seq").collect()
        ]


class BfsWaveEngine:
    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        images: DataFrame | None = None,
        max_depth: int = 2,
        checkpoint_dir: str | None = None,
        qps: float | None = None,
        n_shuffle: int | None = None,
        broadcast_frontier: bool = True,
        robots_disallow: DataFrame | None = None,
        hot_host_salt: int = 4,
        lineage_detail: bool = False,
        hooks=None,
        use_bloom: bool = False,
        touch: DataFrame | None = None,
        filter_capacity: int = 1_000_000,
    ):
        self.spark = spark
        self.edges = edges
        self.images = images
        self.max_depth = max_depth
        self.checkpoint_dir = checkpoint_dir
        self.qps = qps
        self.broadcast_frontier = broadcast_frontier
        self.robots_disallow = robots_disallow
        self.hot_host_salt = hot_host_salt
        self.lineage_detail = lineage_detail
        self.hooks = hooks  # engine/plugins.WaveHooks (X2/X3 surface)
        # U5 two-phase seen-dedup: a Bloom over the seen fingerprints
        # prunes the anti-join probe side (bloom-negative candidates are
        # definitely fresh and skip the join); the exact anti-join stays
        # authoritative for bloom-positives, so results are identical
        # with the flag on or off — it only cuts shuffle. Modes:
        #   True      — one NumpyBloom closure-broadcast to tasks (fine
        #               while the filter fits an executor heap)
        #   "sharded" — functions/bloom.ShardedBloomTable: bit arrays
        #               sharded by fingerprint range as a DataFrame,
        #               probed via cogroup — the 10^10-key form (a
        #               monolithic 10^10-key filter is ~24 GB)
        #   "cuckoo"  — functions/cuckoo.ShardedCuckooTable: same sharded
        #               shape but deletable — the only backend that
        #               supports ``forget()`` (release failed fetches for
        #               re-crawl) without a full filter rebuild
        self.use_bloom = use_bloom
        # TOTAL expected seen-set keys across all shards (size ≥ the
        # crawl's final |seen|, ~2× headroom recommended for the cuckoo's
        # per-shard load ceiling). 10^10-key deployments pass 1e10 and a
        # proportionally larger n_shuffle — per-shard blobs stay
        # executor-heap-sized either way.
        self.filter_capacity = filter_capacity
        self._bloom = None
        self.n_shuffle = n_shuffle or int(spark.conf.get("spark.sql.shuffle.partitions"))
        # pop-log parquet lives under the checkpoint dir when given, else
        # a scratch dir; either way scheduling state is disk/DataFrame
        # resident, never a driver list
        self._work_dir = checkpoint_dir or tempfile.mkdtemp(prefix="bfswave-")
        # scale guard: every row the scheduler materializes on the driver
        # (per-partition count rows only); tests assert this stays
        # O(n_partitions) even when a wave carries tens of thousands of URLs
        self.driver_rows_collected = 0
        # uncheckpointed runs compact the seen union chain to parquet
        # every N waves (plan depth stays bounded on long crawls)
        self.seen_compact_every = 8
        # endpoint-exploded edge view: turns the two-sided expand join J1
        # into one equi-join; persisted — every wave re-probes it. At
        # cluster scale pass `touch` = a table bucketed by `endpoint`
        # (operators/transfers.write_bucketed_touch): the sort-merge
        # expand join then reads the edge side pre-distributed and only
        # the frontier side shuffles (pinned in test_bucketed_touch).
        if touch is not None:
            self._touch = touch
        else:
            # materialize the index at construction (r7): the same
            # convention as HaircutWaveEngine._outs / TtrRedirectWave-
            # Engine._touch — building the endpoint view is engine
            # setup, not crawl work, and leaving it lazy charged the
            # whole cache build to the first wave's expand join.
            self._touch = endpoint_exploded(edges).persist()
            self._touch.count()
        self._prev_seen: DataFrame | None = None

    # ------------------------------------------------------------------ setup

    def _pop_wave_dir(self, wave: int) -> str:
        return os.path.join(self._work_dir, "pop_log", f"wave={wave:05d}")

    def _persist_pops(self, pops: DataFrame, wave: int) -> DataFrame:
        """Materialize a wave's pop rows with flat lineage. Durable runs
        (``checkpoint_dir`` set) write the per-wave parquet that
        ``resume()`` reads back — the source of truth. Undurable runs
        used to pay the same disk round-trip into a scratch dir no
        resume can ever read (r7c: ~0.3-0.6 s of the timed crawl);
        they now localCheckpoint instead — the same fast path the
        weighted engines' PopLog has used since r3, with identical
        flat-lineage/materialization semantics."""
        if self.checkpoint_dir:
            pops.write.mode("overwrite").parquet(self._pop_wave_dir(wave))
            return self.spark.read.parquet(self._pop_wave_dir(wave))
        return pops.localCheckpoint(eager=True)

    def start(self, source: str) -> CrawlState:
        seed = self.spark.createDataFrame([(source, 0, 0, 0)], FRONTIER_SCHEMA).select(
            "node", "depth", "seq", "wave",
            node_fingerprint(F.col("node")).alias("fingerprint"),
        )
        pops = self._persist_pops(seed, 0)
        frontier = pops.select("node", "depth", "seq", "wave")
        seen = pops.select("fingerprint", "node", "wave").persist()
        state = CrawlState(
            wave=0, frontier=frontier, seen=seen, frontier_size=1,
            next_seq=1, pop_log_df=pops,
        )
        per_shard = max(4096, self.filter_capacity // self.n_shuffle)
        if self.use_bloom == "sharded":
            from blockchainspider_spark.functions.bloom import ShardedBloomTable

            self._bloom = ShardedBloomTable(
                self.spark, capacity_per_shard=per_shard, n_shards=self.n_shuffle)
            self._bloom.add(pops, "fingerprint")
        elif self.use_bloom == "cuckoo":
            from blockchainspider_spark.functions.cuckoo import ShardedCuckooTable

            self._bloom = ShardedCuckooTable(
                self.spark, capacity_per_shard=per_shard, n_shards=self.n_shuffle)
            self._bloom.add(pops, "fingerprint")
        elif self.use_bloom:
            from blockchainspider_spark.functions.bloom import NumpyBloom

            self._bloom = NumpyBloom(self.filter_capacity, 1e-4)
            self._bloom.union_from_dataframe(pops, "fingerprint")
        return state

    # ------------------------------------------------------------------ waves

    def _expand(self, frontier: DataFrame) -> DataFrame:
        f = frontier.select(
            F.col("node").alias("_parent"),
            F.col("depth").alias("_pdepth"),
            F.col("seq").alias("_pseq"),
        )
        if self.broadcast_frontier:
            f = F.broadcast(f)
        return self._touch.join(f, on=F.col("endpoint") == F.col("_parent"), how="inner")

    def run_wave(self, state: CrawlState) -> tuple[CrawlState, DataFrame, DataFrame]:
        """Advance one wave; returns (new_state, emitted_transfers, fetched).
        ``emitted_transfers`` is lazy (this wave's touched transfers,
        within-wave dedup'd); union + global dedup happens in run()."""
        t0 = time.monotonic()
        wave = state.wave + 1
        from blockchainspider_spark.engine.wave_common import WaveTrace
        tr = WaveTrace(f"bfs w{wave}")
        expansions = self._expand(state.frontier)

        emitted = expansions.select(*self.edges.columns).dropDuplicates(["id"])
        if self.hooks is not None:
            emitted = self.hooks.apply_transfers(emitted)

        # schedule path: only parents BELOW max_depth can contribute
        # children, so expand the depth-filtered frontier (r7) — the
        # per-parent ranks are unchanged (the window is per parent) and
        # on the final wave AQE collapses the empty-broadcast join to an
        # empty relation instead of scanning the whole touch view.
        # ``emitted`` above still expands the full frontier (depth-
        # max_depth pops do fetch their transfers — K1/K2 semantics).
        cand_expansions = self._expand(
            state.frontier.where(F.col("depth") < self.max_depth)
        )
        # canonical per-parent scan rank (block_number, timestamp, id asc)
        rank_w = Window.partitionBy("_parent").orderBy(
            *[F.col(c).asc() for c in CANONICAL_ORDER_COLS]
        )
        ranked = cand_expansions.withColumn("_erank", F.row_number().over(rank_w))

        candidates = (
            ranked.where(F.col("_pdepth") + 1 <= F.lit(self.max_depth))
            .select(
                F.col("_pseq"), F.col("_erank"), F.col("_pdepth"),
                F.explode(
                    F.array(
                        F.struct(F.lit(0).alias("slot"), F.col("address_from").alias("child")),
                        F.struct(F.lit(1).alias("slot"), F.col("address_to").alias("child")),
                    )
                ).alias("c"),
            )
            .select("_pseq", "_erank", "_pdepth", F.col("c.slot"), F.col("c.child"))
            .withColumn("fingerprint", node_fingerprint(F.col("child")))
        )
        if self.robots_disallow is not None:
            candidates = candidates.join(
                F.broadcast(self.robots_disallow.select(F.col("node").alias("child"))),
                on="child", how="left_anti",
            )

        n_candidates = candidates.count() if self.lineage_detail else None
        if self.use_bloom and self._bloom is not None:
            if self.use_bloom in ("sharded", "cuckoo"):
                flagged = self._bloom.might_contain(candidates, "fingerprint")
            else:
                bloom = self._bloom
                from pyspark.sql.functions import pandas_udf
                from pyspark.sql.types import BooleanType

                @pandas_udf(BooleanType())
                def maybe_seen(fps):
                    return bloom.might_contain_series(fps)

                flagged = candidates.withColumn("_maybe", maybe_seen(F.col("fingerprint")))
            definitely_fresh = flagged.where(~F.col("_maybe")).drop("_maybe")
            survivors = flagged.where(F.col("_maybe")).drop("_maybe").join(
                state.seen.select("fingerprint"), on="fingerprint", how="left_anti"
            )
            fresh = definitely_fresh.unionByName(survivors)
        else:
            fresh = candidates.join(
                state.seen.select("fingerprint"), on="fingerprint", how="left_anti"
            )
        first = fresh.groupBy("fingerprint").agg(
            F.min(F.struct("_pseq", "_erank", "slot",
                           F.col("child").alias("node"),
                           (F.col("_pdepth") + 1).alias("depth"))).alias("k")
        )

        # distributed seq assignment: range sort on the first-enqueue key
        # + per-partition row_number with prefix-sum offsets. The driver
        # sees only one count row per partition — a 10^8-row wave costs
        # the same driver memory as a 10-row wave.
        keyed = first.select(
            F.col("k._pseq").alias("_k_pseq"),
            F.col("k._erank").alias("_k_erank"),
            F.col("k.slot").alias("_k_slot"),
            F.col("k.node").alias("node"),
            F.col("k.depth").cast("int").alias("depth"),
            "fingerprint",
        )
        assignment = assign_global_seq(
            keyed, ["_k_pseq", "_k_erank", "_k_slot"],
            base_seq=state.next_seq - 1, n_partitions=self.n_shuffle,
        )
        self.driver_rows_collected += assignment.driver_rows
        n_new = assignment.total
        tr.mark("assign")

        # persist this wave's pops (the pop log) with flat lineage and
        # zero frontier rows on the driver: parquet when durable,
        # localCheckpoint otherwise (_persist_pops)
        wave_pops = self._persist_pops(
            assignment.df.select(
                "node", "depth", "seq", F.lit(wave).alias("wave"), "fingerprint"
            ),
            wave,
        )
        assignment.cleanup()
        tr.mark("poplog")

        if self.use_bloom and self._bloom is not None and n_new:
            if self.use_bloom in ("sharded", "cuckoo"):
                self._bloom.add(wave_pops, "fingerprint")
            else:
                self._bloom.union_from_dataframe(wave_pops, "fingerprint")

        new_frontier = wave_pops.select("node", "depth", "seq", "wave")
        new_seen = state.seen.unionByName(
            wave_pops.select("fingerprint", "node", "wave")
        )
        # plan hygiene for long crawls: the seen union gains one branch
        # per wave; every `seen_compact_every` waves rewrite it to parquet
        # (range-partitioned on the probe key) and read it back flat.
        # Checkpointing does this implicitly; this covers uncheckpointed
        # runs at 10^3+ waves.
        if self.checkpoint_dir is None and wave % self.seen_compact_every == 0:
            compact_dir = os.path.join(self._work_dir, f"seen_compact_{wave:05d}")
            new_seen.repartitionByRange(self.n_shuffle, "fingerprint").write.mode(
                "overwrite"
            ).parquet(compact_dir)
            new_seen = self.spark.read.parquet(compact_dir)
        new_seen = new_seen.persist()
        if self._prev_seen is not None:
            self._prev_seen.unpersist()
        self._prev_seen = state.seen

        fetched = self.fetch(new_frontier) if self.images is not None else None
        if fetched is not None and self.hooks is not None:
            fetched = self.hooks.apply_fetched(fetched)
        if fetched is not None and self.lineage_detail:
            # per-partition lineage (north rule): host bucket × depth with
            # fetch-latency stats, folded into the wave's lineage record
            host_rows = (
                fetched.groupBy("host", "depth")
                .agg(
                    F.count("*").alias("n"),
                    F.round(F.avg("fetch_ms"), 3).alias("avg_fetch_ms"),
                    F.round(F.max("fetch_ms"), 3).alias("max_fetch_ms"),
                    F.min(F.col("psnr_ok").cast("int")).alias("all_psnr_ok"),
                )
                .collect()
            )
            self._host_lineage = [r.asDict() for r in host_rows]

        tr.mark("seen")
        tr.done()
        lineage_row = {
            "wave": wave,
            "frontier_in": state.frontier_size,
            "new_nodes": n_new,
            "wall_sec": time.monotonic() - t0,
        }
        if n_candidates is not None:
            lineage_row["candidates"] = n_candidates
            lineage_row["dedup_hit_rate"] = (1 - n_new / n_candidates) if n_candidates else 0.0
        if getattr(self, "_host_lineage", None):
            lineage_row["hosts"] = self._host_lineage
            self._host_lineage = None
        state.lineage.append(lineage_row)

        new_state = CrawlState(
            wave=wave,
            frontier=new_frontier,
            seen=new_seen,
            frontier_size=n_new,
            next_seq=state.next_seq + n_new,
            pop_log_df=state.pop_log_df.unionByName(wave_pops),
            lineage=state.lineage,
        )
        if self.checkpoint_dir:
            self._checkpoint(new_state)
            new_state = self._reload(new_state.wave)
        return new_state, emitted, fetched

    # ------------------------------------------------------------------ fetch

    def fetch(self, frontier: DataFrame) -> DataFrame:
        """Join payload rows and run the decode/verify kernel, partitioned
        by host bucket (hot host-0 salted across ``hot_host_salt`` ways)."""
        payload = frontier.join(self.images, on="node", how="inner")
        host = F.regexp_extract("image_id", r"img://([^/]+)/", 1)
        salt = F.when(
            host == "host-0", F.pmod(F.xxhash64("image_id"), F.lit(self.hot_host_salt))
        ).otherwise(F.lit(0))
        payload = payload.withColumn("host_bucket", F.concat_ws("#", host, salt.cast("string")))
        payload = payload.repartition(self.n_shuffle, "host_bucket")
        return payload.mapInPandas(make_fetch_kernel(self.qps), FETCH_RESULT_SCHEMA)

    # ------------------------------------------------------------------ run

    def _compact_df(self, df: DataFrame, name: str) -> DataFrame:
        """Rewrite an accumulated union chain flat: parquet out, read
        back — one scan node replaces N union branches in the plan."""
        d = os.path.join(self._work_dir, name)
        df.write.mode("overwrite").parquet(d)
        return self.spark.read.parquet(d)

    def run(self, source: str, collect_transfers: bool = True):
        state = self.start(source)
        all_emitted: DataFrame | None = None
        all_fetched: DataFrame | None = None
        while state.frontier_size > 0 and state.wave <= self.max_depth:
            state, emitted, fetched = self.run_wave(state)
            if collect_transfers:
                all_emitted = (emitted if all_emitted is None
                               else all_emitted.unionByName(emitted))
            if fetched is not None:
                all_fetched = (fetched if all_fetched is None
                               else all_fetched.unionByName(fetched))
            # plan hygiene (same cadence as the seen compaction): the
            # emitted/fetched unions gain one branch per wave; a 100-wave
            # crawl would otherwise blow up Catalyst analysis. Rewriting
            # also pins the fetch kernel's results instead of re-running
            # them at final materialization.
            if state.wave % self.seen_compact_every == 0:
                if all_emitted is not None:
                    all_emitted = self._compact_df(
                        all_emitted, f"emitted_compact_{state.wave:05d}")
                if all_fetched is not None:
                    all_fetched = self._compact_df(
                        all_fetched, f"fetched_compact_{state.wave:05d}")
        if all_emitted is not None:
            all_emitted = all_emitted.dropDuplicates(["id"])
        return state, all_emitted, all_fetched

    # ------------------------------------------------------------------ checkpoint / resume

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.checkpoint_dir, f"wave={wave:05d}")

    def _checkpoint(self, state: CrawlState) -> None:
        d = self._wave_dir(state.wave)
        state.frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
        # seen is range-partitioned by fingerprint so the next wave's
        # anti-join reads a layout already organized on the probe key
        state.seen.repartitionByRange(self.n_shuffle, "fingerprint").write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "seen"))
        # the sharded bloom's (shard, bits) table snapshots alongside the
        # seen set so a resumed crawl keeps its pre-filter instead of
        # silently degrading to exact-anti-join-only
        if self.use_bloom in ("sharded", "cuckoo") and self._bloom is not None:
            self._bloom.bits_df.write.mode("overwrite").parquet(
                os.path.join(d, "bloom_shards")
            )
        # scalar metadata only — the pop log itself is the parquet table
        # under pop_log/wave=*, written distributed during run_wave
        meta = {
            "wave": state.wave,
            "frontier_size": state.frontier_size,
            "next_seq": state.next_seq,
            "lineage": state.lineage,
        }
        if self.use_bloom in ("sharded", "cuckoo") and self._bloom is not None:
            # the filter's geometry (shard routing + probe params) belongs
            # to the persisted bits, not to whatever session resumes —
            # resume() reconstructs from this (the ``kind`` field picks
            # the class), never from live config
            meta["bloom"] = self._bloom.meta()
        with open(os.path.join(d, "meta.json"), "w") as fh:
            json.dump(meta, fh)

    def _pop_log_upto(self, wave: int) -> DataFrame:
        paths = [self._pop_wave_dir(i) for i in range(wave + 1)
                 if os.path.exists(self._pop_wave_dir(i))]
        return self.spark.read.parquet(*paths)

    def _reload(self, wave: int) -> CrawlState:
        d = self._wave_dir(wave)
        with open(os.path.join(d, "meta.json")) as fh:
            meta = json.load(fh)
        return CrawlState(
            wave=meta["wave"],
            frontier=self.spark.read.parquet(os.path.join(d, "frontier")),
            seen=self.spark.read.parquet(os.path.join(d, "seen")),
            frontier_size=meta["frontier_size"],
            next_seq=meta["next_seq"],
            pop_log_df=self._pop_log_upto(meta["wave"]),
            lineage=meta["lineage"],
        )

    def resume(self, wave: int) -> CrawlState:
        """Restart mid-crawl from the snapshot of ``wave``. The bloom
        pre-filter (either form) is restored too — never silently
        degraded to exact-anti-join-only."""
        d = self._wave_dir(wave)
        bloom_dir = os.path.join(d, "bloom_shards")
        if self.use_bloom in ("sharded", "cuckoo") and os.path.exists(bloom_dir):
            with open(os.path.join(d, "meta.json")) as fh:
                meta = json.load(fh)
            if "bloom" not in meta:
                raise ValueError(
                    f"checkpoint {d} has bloom_shards but no filter geometry in "
                    "meta.json — refusing to guess shard routing (a wrong "
                    "n_shards yields silent false negatives)"
                )
            # the persisted ``kind`` decides the class — resuming a cuckoo
            # snapshot under use_bloom="sharded" (or vice versa) would
            # probe the blobs with the wrong layout
            kind = meta["bloom"].get("kind", "bloom")
            want = "cuckoo" if self.use_bloom == "cuckoo" else "bloom"
            if kind != want:
                raise ValueError(
                    f"checkpoint {d} holds a {kind} filter but the engine was "
                    f"constructed with use_bloom={self.use_bloom!r} — pass the "
                    "matching mode instead of reinterpreting the blobs"
                )
            bits = self.spark.read.parquet(bloom_dir).persist()
            if kind == "cuckoo":
                from blockchainspider_spark.functions.cuckoo import ShardedCuckooTable

                self._bloom = ShardedCuckooTable.from_meta(self.spark, meta["bloom"], bits)
            else:
                from blockchainspider_spark.functions.bloom import ShardedBloomTable

                self._bloom = ShardedBloomTable.from_meta(self.spark, meta["bloom"], bits)
        state = self._reload(wave)
        if self.use_bloom is True:
            from blockchainspider_spark.functions.bloom import NumpyBloom

            # the broadcast filter isn't checkpointed (it's derivable):
            # rebuild it from the reloaded seen set so the pre-filter
            # survives resume instead of staying None
            self._bloom = NumpyBloom(self.filter_capacity, 1e-4)
            self._bloom.union_from_dataframe(state.seen, "fingerprint")
        return state

    # ------------------------------------------------------------------ forget

    def forget(self, state: CrawlState, nodes: DataFrame) -> CrawlState:
        """Release nodes from the seen set so a later wave (or a resumed
        crawl) re-attempts them — the re-crawl semantic for terminally
        failed fetches (fetch_with_retries status='failed'). Returns the
        state with ``seen`` shrunk; pop-log history is untouched (a
        re-discovered node pops again under a fresh seq — lineage, not
        state).

        Only works end-to-end with the deletable filter backend
        (``use_bloom="cuckoo"``) or with no filter at all; the Bloom
        backends cannot unset bits and refuse loudly rather than leave a
        filter that contradicts the exact seen set. Nodes not currently
        seen also refuse loudly (and satisfy the cuckoo-filter contract
        that only inserted keys are deleted)."""
        if self.use_bloom and self.use_bloom != "cuckoo":
            raise ValueError(
                f"forget() needs a deletable seen filter; use_bloom="
                f"{self.use_bloom!r} is a Bloom (bits cannot be unset — the "
                "filter would keep reporting maybe-seen forever). Construct "
                'the engine with use_bloom="cuckoo" or use_bloom=False.'
            )
        doomed = nodes if "fingerprint" in nodes.columns else nodes.select(
            "*", node_fingerprint(F.col("node")).alias("fingerprint")
        )
        doomed = doomed.select("fingerprint").dropDuplicates(["fingerprint"]).persist()
        n_doomed = doomed.count()
        present = doomed.join(
            state.seen.select("fingerprint"), on="fingerprint", how="left_semi"
        )
        n_present = present.count()
        if n_present != n_doomed:
            doomed.unpersist()
            raise ValueError(
                f"forget() of {n_doomed - n_present}/{n_doomed} nodes that are "
                "not in the seen set — refusing (forgetting the never-seen is "
                "a caller bug, and the cuckoo delete contract requires "
                "previously-inserted keys)"
            )
        new_seen = state.seen.join(doomed, on="fingerprint", how="left_anti").persist()
        new_seen.count()
        if self._bloom is not None:
            self._bloom.delete(doomed, "fingerprint")
        state.seen.unpersist()
        doomed.unpersist()
        return CrawlState(
            wave=state.wave,
            frontier=state.frontier,
            seen=new_seen,
            frontier_size=state.frontier_size,
            next_seq=state.next_seq,
            pop_log_df=state.pop_log_df,
            lineage=state.lineage,
        )

    def repair(self, state: CrawlState, failed: DataFrame):
        """Forget terminally-failed fetch nodes and re-crawl them in one
        repair wave. ``failed`` carries a ``node`` column — typically the
        fetched rows where the decode invariant failed (``~psnr_ok`` /
        ``~phash_match``, functions/payload.py) or fetch_with_retries
        rows with status='failed' (engine/fetch_cache.py).

        Mechanics: the failed nodes are forgotten (seen set + cuckoo
        shards shrink — needs the deletable backend or no filter), the
        frontier is re-seeded with their pop-log PARENTS — the popped
        depth-(d-1) rows adjacent to a failed depth-d node — and one
        wave runs: the forgotten nodes re-pop under fresh seqs (the
        first-enqueue rank recomputed over the re-seeded parents) and
        re-fetch, while every other child of those parents is still
        seen and prunes away in the anti-join. Returns run_wave's
        ``(state, emitted, fetched)`` triple; the caller inspects
        ``fetched`` and loops while failures remain (each repair wave
        appends a lineage row tagged ``repair: true``, so retry budgets
        stay observable — tools/submit_crawl.py --repair-failed N).

        Refuses loudly on: a node that never popped (caller bug), a
        depth-0 seed (it has no parent, and the engine never fetches the
        seed — re-run the crawl instead), and a failed node none of
        whose parents are still in the pop log (nothing can re-discover
        it; silent drop would read as 'repaired')."""
        doomed = failed.select("node").dropDuplicates(["node"]).persist()
        n_doomed = doomed.count()
        if not n_doomed:
            raise ValueError("repair() with an empty failed set — caller bug")
        info = (
            state.pop_log_df.join(doomed, on="node", how="left_semi")
            .select("node", "depth").dropDuplicates(["node", "depth"]).persist()
        )
        n_popped = info.select("node").dropDuplicates().count()
        if n_popped != n_doomed:
            raise ValueError(
                f"repair() of {n_doomed - n_popped}/{n_doomed} nodes that never "
                "popped — only fetched (hence popped) nodes can fail a fetch"
            )
        if info.where(F.col("depth") == 0).count():
            raise ValueError(
                "repair() of the depth-0 seed — the seed has no parent to "
                "re-pop it from (and the engine never fetches the seed); "
                "re-run the crawl instead"
            )
        state = self.forget(state, doomed)

        # parents: popped rows exactly one depth above, adjacent via the
        # endpoint-exploded view (same join shape as the expand, reversed)
        d = info.select(F.col("node").alias("_dnode"), F.col("depth").alias("_ddepth"))
        pairs = (
            self._touch.join(F.broadcast(d), on=F.col("endpoint") == F.col("_dnode"))
            .select(
                "_dnode", "_ddepth",
                F.explode(F.array("address_from", "address_to")).alias("_nbr"),
            )
            .where(F.col("_nbr") != F.col("_dnode"))
        )
        par = pairs.join(
            state.pop_log_df.select(
                F.col("node").alias("_nbr"), F.col("depth").alias("_pdepth"),
                "seq", "wave",
            ),
            on="_nbr", how="inner",
        ).where(F.col("_pdepth") == F.col("_ddepth") - 1).persist()
        n_covered = par.select("_dnode").dropDuplicates().count()
        if n_covered != n_doomed:
            par.unpersist(); info.unpersist(); doomed.unpersist()
            raise ValueError(
                f"repair(): {n_doomed - n_covered}/{n_doomed} failed nodes have "
                "no popped parent left to re-discover them (their parents were "
                "forgotten without repair?) — refusing rather than silently "
                "dropping them from the re-crawl"
            )
        # one frontier row per parent; a node that popped more than once
        # (earlier repairs) re-seeds under its first (min-seq) pop row so
        # the recomputed first-enqueue ranks stay deterministic
        frontier = (
            par.groupBy(F.col("_nbr").alias("node"))
            .agg(F.min(F.struct("seq", F.col("_pdepth").alias("depth"), "wave")).alias("k"))
            .select("node", F.col("k.depth").alias("depth"),
                    F.col("k.seq").alias("seq"), F.col("k.wave").alias("wave"))
            .persist()
        )
        n_parents = frontier.count()
        par.unpersist(); info.unpersist(); doomed.unpersist()

        seeded = CrawlState(
            wave=state.wave, frontier=frontier, seen=state.seen,
            frontier_size=n_parents, next_seq=state.next_seq,
            pop_log_df=state.pop_log_df, lineage=state.lineage,
        )
        out_state, emitted, fetched = self.run_wave(seeded)
        out_state.lineage[-1]["repair"] = True
        return out_state, emitted, fetched
