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


# ------------------------------------------------------------------ repair


def _corrupt(images_pdf, victim):
    """Swap the victim's payload bytes for another image's — decoded
    pixels no longer match the reference derived from its image_id, so
    the fetch kernel flags psnr_ok=False / phash_match=False."""
    pdf = images_pdf.copy()
    vi = pdf.index[pdf["node"] == victim][0]
    other = pdf.index[pdf["node"] != victim][0]
    pdf.loc[vi, "bytes"] = pdf.loc[other, "bytes"]
    pdf.loc[vi, "fmt"] = pdf.loc[other, "fmt"]  # magic check must still pass
    return pdf


def test_repair_refetches_exactly_the_failed_node(spark, edges_df, images_pdf, source):
    """A transiently-corrupt fetch: the crawl flags it, repair() forgets
    it, re-seeds its parents, and the repair wave re-pops + re-fetches
    exactly that node (now green) under a fresh seq."""
    probe = BfsWaveEngine(spark, edges_df, max_depth=2)
    st, _, _ = probe.run(source, collect_transfers=False)
    victim = next(n for _, n, d in st.pop_log if d == 1)

    engine = BfsWaveEngine(
        spark, edges_df, images=spark.createDataFrame(_corrupt(images_pdf, victim)),
        max_depth=2, use_bloom="cuckoo",
    )
    state, _, fetched = engine.run(source, collect_transfers=False)
    bad = fetched.where(~F.col("psnr_ok") | ~F.col("phash_match")).select("node")
    bad = bad.persist()
    assert {r.node for r in bad.collect()} == {victim}
    before_pops = state.next_seq

    # the transient failure clears before the repair wave re-fetches
    engine.images = spark.createDataFrame(images_pdf)
    state, _, refetched = engine.repair(state, bad)
    rows = refetched.collect()
    assert [r.node for r in rows] == [victim]
    assert rows[0].psnr_ok and rows[0].phash_match
    assert state.next_seq == before_pops + 1
    assert state.lineage[-1].get("repair") is True
    repop = [t for t in state.pop_log if t[0] >= before_pops]
    assert repop == [(before_pops, victim, 1)]
    # and the node is seen again — a later wave won't re-pop it
    assert state.seen.where(F.col("node") == victim).count() == 1


def test_repair_depth2_victim_keeps_depth(spark, edges_df, images_pdf, source):
    """A failed depth-2 node re-pops at depth 2 (parents pinned to
    depth 1), even when it is also adjacent to depth-2 pops."""
    probe = BfsWaveEngine(spark, edges_df, max_depth=2)
    st, _, _ = probe.run(source, collect_transfers=False)
    victim = next(n for _, n, d in st.pop_log if d == 2)

    engine = BfsWaveEngine(
        spark, edges_df, images=spark.createDataFrame(_corrupt(images_pdf, victim)),
        max_depth=2, use_bloom="cuckoo",
    )
    state, _, fetched = engine.run(source, collect_transfers=False)
    bad = fetched.where(~F.col("psnr_ok")).select("node")
    engine.images = spark.createDataFrame(images_pdf)
    before_pops = state.next_seq
    state, _, refetched = engine.repair(state, bad)
    assert [(r.node, r.depth) for r in refetched.collect()] == [(victim, 2)]
    assert state.pop_log[-1] == (before_pops, victim, 2)


def test_repair_refuses_seed_and_never_popped(spark, edges_df, images_df, source):
    engine = BfsWaveEngine(spark, edges_df, images=images_df, max_depth=1,
                           use_bloom="cuckoo")
    state, _, _ = engine.run(source, collect_transfers=False)
    with pytest.raises(ValueError, match="depth-0 seed"):
        engine.repair(state, spark.createDataFrame([(source,)], "node string"))
    with pytest.raises(ValueError, match="never"):
        engine.repair(state, spark.createDataFrame([("0xghost",)], "node string"))
    with pytest.raises(ValueError, match="empty failed set"):
        engine.repair(state, spark.createDataFrame([], "node string"))
