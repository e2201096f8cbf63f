"""Exact-engine mid-crawl resume + Bloom-prefiltered seen dedup."""

import pytest

from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
from blockchainspider_spark.engine.exact import ExactCrawlEngine


@pytest.mark.parametrize("strategy,params", [
    ("Haircut", {"min_weight": 1e-2}),
    ("TTRWeight", {"epsilon": 5e-3}),
    ("BFS", {"depth": 2}),
])
def test_exact_engine_resume_identical(spark, edges_df, source, tmp_path, strategy, params):
    """Kill after wave k, resume from the snapshot: byte-identical final
    pop log, emitted ids and ranks (the north rule's resume contract)."""
    full = ExactCrawlEngine(spark, edges_df, strategy, params).run(source, max_steps=25)

    ckpt = str(tmp_path / strategy)
    import os

    os.makedirs(ckpt, exist_ok=True)
    engine = ExactCrawlEngine(spark, edges_df, strategy, params, checkpoint_dir=ckpt)
    engine.run(source, max_steps=6)  # "crash" after step 6
    resumed = engine.resume_latest(max_steps=25)

    assert resumed.pop_log == full.pop_log
    assert resumed.emitted_ids == full.emitted_ids
    assert resumed.ranks.keys() == full.ranks.keys()
    for k in full.ranks:
        assert abs(resumed.ranks[k] - full.ranks[k]) <= 1e-12


def test_sharded_bloom_semantics(spark):
    """ShardedBloomTable: no false negatives ever; false positives rare;
    incremental adds accumulate; blobs never reach the driver."""
    from pyspark.sql import functions as F

    from blockchainspider_spark.functions.bloom import ShardedBloomTable

    bloom = ShardedBloomTable(spark, capacity_per_shard=10_000, n_shards=8)
    keys1 = spark.range(0, 3000).select(F.sha1(F.concat(F.lit("a"), F.col("id"))).alias("fp"))
    keys2 = spark.range(0, 2000).select(F.sha1(F.concat(F.lit("b"), F.col("id"))).alias("fp"))
    bloom.add(keys1, "fp")
    bloom.add(keys2, "fp")

    members = keys1.unionByName(keys2)
    got = bloom.might_contain(members, "fp")
    assert got.where(~F.col("_maybe")).count() == 0  # no false negatives

    absent = spark.range(0, 3000).select(F.sha1(F.concat(F.lit("z"), F.col("id"))).alias("fp"))
    fp_rate = bloom.might_contain(absent, "fp").where(F.col("_maybe")).count() / 3000
    assert fp_rate < 0.01  # fpp 1e-4 design point, generous bound

    # the bits table stays a DataFrame with one row per touched shard
    assert bloom.bits_df.count() <= 8


def test_sharded_bloom_prefilter_identical_crawl(spark, edges_df, source):
    """use_bloom='sharded' (cogroup-probed, never broadcast) must also be
    result-invisible."""
    plain, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2).run(
        source, collect_transfers=False
    )
    sharded, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2, use_bloom="sharded").run(
        source, collect_transfers=False
    )
    assert sharded.pop_log == plain.pop_log


def test_sharded_bloom_survives_resume(spark, edges_df, source, tmp_path):
    """A resumed sharded-bloom crawl reloads its shard table from the
    checkpoint and still reproduces the identical pop log."""
    full, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2).run(
        source, collect_transfers=False
    )
    ckpt = str(tmp_path / "shard-ckpt")
    engine = BfsWaveEngine(spark, edges_df, max_depth=2,
                           checkpoint_dir=ckpt, use_bloom="sharded")
    state = engine.start(source)
    state, _, _ = engine.run_wave(state)
    # drop the in-memory bloom entirely; resume must reload it from disk
    engine._bloom = None
    resumed = engine.resume(1)
    assert engine._bloom is not None and engine._bloom.bits_df.count() > 0
    while resumed.frontier_size > 0 and resumed.wave <= 2:
        resumed, _, _ = engine.run_wave(resumed)
    assert resumed.pop_log == full.pop_log


def test_sharded_bloom_resume_geometry_from_meta(spark, edges_df, source, tmp_path):
    """The bloom's shard routing must come from the checkpoint's recorded
    geometry, not the resuming session's shuffle-partition count — a
    session resuming under a different n_shuffle would otherwise hash
    probes to the wrong shard (silent false negatives → duplicate pops)."""
    from pyspark.sql import functions as F

    ckpt = str(tmp_path / "geom-ckpt")
    engine = BfsWaveEngine(spark, edges_df, max_depth=2,
                           checkpoint_dir=ckpt, use_bloom="sharded", n_shuffle=8)
    state = engine.start(source)
    state, _, _ = engine.run_wave(state)
    orig_meta = engine._bloom.meta()

    # resume from a differently-configured engine (n_shuffle 3 ≠ 8)
    engine2 = BfsWaveEngine(spark, edges_df, max_depth=2,
                            checkpoint_dir=ckpt, use_bloom="sharded", n_shuffle=3)
    resumed = engine2.resume(1)
    assert engine2._bloom.meta() == orig_meta, "geometry must survive the session change"
    # zero false negatives against the reloaded seen set proves probes
    # still route to the shards the bits were written under
    flagged = engine2._bloom.might_contain(resumed.seen, "fingerprint")
    assert flagged.where(~F.col("_maybe")).count() == 0


def test_broadcast_bloom_rebuilt_on_resume(spark, edges_df, source, tmp_path):
    """use_bloom=True: resume() rebuilds the broadcast NumpyBloom from the
    reloaded seen set instead of leaving the pre-filter silently off."""
    full, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2, use_bloom=True).run(
        source, collect_transfers=False
    )
    ckpt = str(tmp_path / "np-ckpt")
    engine = BfsWaveEngine(spark, edges_df, max_depth=2,
                           checkpoint_dir=ckpt, use_bloom=True)
    state = engine.start(source)
    state, _, _ = engine.run_wave(state)
    engine._bloom = None
    resumed = engine.resume(1)
    assert engine._bloom is not None, "pre-filter must survive resume"
    # every reloaded fingerprint is (correctly) bloom-positive
    fps = [r.fingerprint for r in resumed.seen.collect()]
    assert all(engine._bloom.might_contain(fp) for fp in fps)
    while resumed.frontier_size > 0 and resumed.wave <= 2:
        resumed, _, _ = engine.run_wave(resumed)
    assert resumed.pop_log == full.pop_log


def test_bloom_prefilter_identical_crawl(spark, edges_df, source):
    """use_bloom changes the physical plan (pre-filter before the exact
    anti-join) but never the result."""
    plain, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2).run(
        source, collect_transfers=False
    )
    bloomed, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2, use_bloom=True).run(
        source, collect_transfers=False
    )
    assert bloomed.pop_log == plain.pop_log
    assert {r.fingerprint for r in bloomed.seen.collect()} == {
        r.fingerprint for r in plain.seen.collect()
    }
