"""BfsWaveEngine with the deletable cuckoo seen-filter backend.

The filter contract is identical to the Bloom's (prunes, never decides
— result-invisible), plus the one thing Bloom can't do: ``forget()``
releases failed fetches for re-crawl, and a later wave re-pops them
under a fresh seq.
"""

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine, CrawlState


def test_cuckoo_prefilter_identical_crawl(spark, edges_df, source):
    plain, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2).run(
        source, collect_transfers=False
    )
    cuckooed, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2, use_bloom="cuckoo").run(
        source, collect_transfers=False
    )
    assert cuckooed.pop_log == plain.pop_log
    assert {r.fingerprint for r in cuckooed.seen.collect()} == {
        r.fingerprint for r in plain.seen.collect()
    }


def test_cuckoo_survives_resume(spark, edges_df, source, tmp_path):
    """Resume reloads the cuckoo shard table (dispatched on the persisted
    ``kind``) and reproduces the identical pop log."""
    full, _, _ = BfsWaveEngine(spark, edges_df, max_depth=2).run(
        source, collect_transfers=False
    )
    ckpt = str(tmp_path / "cuckoo-ckpt")
    engine = BfsWaveEngine(spark, edges_df, max_depth=2,
                           checkpoint_dir=ckpt, use_bloom="cuckoo")
    state = engine.start(source)
    state, _, _ = engine.run_wave(state)
    engine._bloom = None
    resumed = engine.resume(1)
    assert engine._bloom is not None and engine._bloom.bits_df.count() > 0
    assert type(engine._bloom).__name__ == "ShardedCuckooTable"
    while resumed.frontier_size > 0 and resumed.wave <= 2:
        resumed, _, _ = engine.run_wave(resumed)
    assert resumed.pop_log == full.pop_log


def test_resume_kind_mismatch_refuses(spark, edges_df, source, tmp_path):
    """A cuckoo snapshot resumed under use_bloom='sharded' (or the
    reverse) must refuse instead of probing blobs with the wrong layout."""
    ckpt = str(tmp_path / "kind-ckpt")
    engine = BfsWaveEngine(spark, edges_df, max_depth=2,
                           checkpoint_dir=ckpt, use_bloom="cuckoo")
    state = engine.start(source)
    engine.run_wave(state)
    wrong = BfsWaveEngine(spark, edges_df, max_depth=2,
                          checkpoint_dir=ckpt, use_bloom="sharded")
    with pytest.raises(ValueError, match="holds a cuckoo filter"):
        wrong.resume(1)


def test_forget_then_recrawl_repops_with_fresh_seq(spark, edges_df, source):
    """forget(X) → re-expanding X's parent re-pops exactly X, at the next
    seq — the re-crawl semantic for a terminally failed fetch."""
    engine = BfsWaveEngine(spark, edges_df, max_depth=2, use_bloom="cuckoo")
    state, _, _ = engine.run(source, collect_transfers=False)
    victim = next((n for s, n, d in state.pop_log if d == 1), None)
    assert victim is not None
    old_next_seq = state.next_seq

    state = engine.forget(state, spark.createDataFrame([(victim,)], "node string"))
    assert state.seen.where(F.col("node") == victim).count() == 0
    # the filter really forgot too: the victim's fingerprint is no longer
    # maybe-seen (16-bit fp collisions are possible in principle, but the
    # fixture's 60 nodes make a collision astronomically unlikely)
    vic_fp = state.pop_log_df.where(F.col("node") == victim).select("fingerprint")
    assert engine._bloom.might_contain(vic_fp, "fingerprint").where(
        F.col("_maybe")).count() == 0

    # re-expand the source: every child but the victim is still seen
    refront = state.pop_log_df.where(F.col("seq") == 0).select(
        "node", "depth", "seq", "wave")
    state = CrawlState(
        wave=state.wave, frontier=refront, seen=state.seen, frontier_size=1,
        next_seq=state.next_seq, pop_log_df=state.pop_log_df, lineage=state.lineage,
    )
    state, _, _ = engine.run_wave(state)
    repopped = [(s, n, d) for s, n, d in state.pop_log if s >= old_next_seq]
    assert repopped == [(old_next_seq, victim, 1)]


def test_forget_refuses_bloom_backends(spark, edges_df, source):
    engine = BfsWaveEngine(spark, edges_df, max_depth=1, use_bloom="sharded")
    state, _, _ = engine.run(source, collect_transfers=False)
    victim = next(n for _, n, d in state.pop_log if d == 1)
    with pytest.raises(ValueError, match="deletable"):
        engine.forget(state, spark.createDataFrame([(victim,)], "node string"))


def test_forget_refuses_unseen_nodes(spark, edges_df, source):
    engine = BfsWaveEngine(spark, edges_df, max_depth=1, use_bloom="cuckoo")
    state, _, _ = engine.run(source, collect_transfers=False)
    with pytest.raises(ValueError, match="not in the seen set"):
        engine.forget(state, spark.createDataFrame([("0xnot-a-node",)], "node string"))


def test_forget_works_without_filter(spark, edges_df, source):
    """use_bloom=False: the exact seen set alone shrinks."""
    engine = BfsWaveEngine(spark, edges_df, max_depth=1)
    state, _, _ = engine.run(source, collect_transfers=False)
    victim = next(n for _, n, d in state.pop_log if d == 1)
    before = state.seen.count()
    state = engine.forget(state, spark.createDataFrame([(victim,)], "node string"))
    assert state.seen.count() == before - 1
