"""Wave-batched Spark BFS engine vs the sequential golden oracle.

The crawl-order contract (BASELINE.json north rule): exact pop sequence,
exact seen membership, exact emitted-transfer set, payload invariants,
and byte-identical resume from a mid-crawl snapshot.
"""

import pytest

from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
from blockchainspider_spark.oracle.crawl import run_crawl


@pytest.fixture(scope="module")
def oracle_result(edges_pdf, source):
    return run_crawl(edges_pdf, source, "BFS", {"depth": 2})


@pytest.fixture(scope="module")
def engine_run(spark, edges_df, images_df, source):
    engine = BfsWaveEngine(spark, edges_df, images=images_df, max_depth=2, lineage_detail=True)
    return engine.run(source)


def test_pop_order_exact(engine_run, oracle_result):
    state, _, _ = engine_run
    got = [(seq, node) for seq, node, _ in state.pop_log]
    want = [(step, node) for step, node, _ in oracle_result.pop_log]
    assert got == want


def test_depth_context_exact(engine_run, oracle_result):
    state, _, _ = engine_run
    got = {node: depth for _, node, depth in state.pop_log}
    want = {node: ctx.get("depth", 0) for _, node, ctx in oracle_result.pop_log}
    assert got == want


def test_seen_membership_exact(engine_run, oracle_result):
    state, _, _ = engine_run
    seen_nodes = {r.node for r in state.seen.select("node").collect()}
    assert seen_nodes == oracle_result.seen


def test_emitted_transfers_exact(engine_run, oracle_result):
    _, emitted, _ = engine_run
    got = {r.id for r in emitted.select("id").collect()}
    assert got == set(oracle_result.edges_emitted)


def test_payload_invariants(engine_run):
    state, _, fetched = engine_run
    rows = fetched.collect()
    assert len(rows) == len(state.pop_log) - 1  # all non-seed pops fetched
    assert all(r.phash_match for r in rows), "decoded perceptual hash must match"
    assert all(r.psnr_ok for r in rows), "PSNR >= 40 dB (lossy) / inf (lossless)"
    assert all(len(r.caption_sha) == 64 for r in rows)


def test_lineage_metrics(engine_run):
    state, _, _ = engine_run
    assert len(state.lineage) >= 2
    for row in state.lineage:
        assert 0.0 <= row["dedup_hit_rate"] <= 1.0
        assert row["wall_sec"] > 0
    # per-partition lineage: host bucket × depth with latency stats
    hosts = state.lineage[0].get("hosts")
    assert hosts and all(h["all_psnr_ok"] == 1 for h in hosts)
    assert all(h["avg_fetch_ms"] > 0 for h in hosts)


def test_big_wave_never_lands_on_driver(spark):
    """Scale contract: a wave whose frontier is far larger than any
    sensible driver collect must keep the scheduler's driver
    materialization at O(n_partitions) count rows (the distributed seq
    path — no global window, no frontier collect)."""
    import pandas as pd

    n_children = 20_000
    edges = pd.DataFrame({
        "id": [f"e{i}" for i in range(n_children)],
        "hash": "0xh",
        "address_from": "0xseed",
        "address_to": [f"0xchild{i:06d}" for i in range(n_children)],
        "value": "1", "token_id": "",
        "timestamp": range(n_children), "block_number": range(n_children),
        "contract_address": "0x" + "0" * 40, "symbol": "native",
        "decimals": 18, "gas": "0", "gas_price": "0",
    })
    engine = BfsWaveEngine(spark, spark.createDataFrame(edges), max_depth=1)
    state, _, _ = engine.run("0xseed", collect_transfers=False)
    assert state.next_seq == n_children + 1
    # driver saw only per-partition count rows, not the 20k frontier rows
    assert engine.driver_rows_collected <= 4 * engine.n_shuffle
    # seq is dense, contiguous, and ordered by the first-enqueue key
    rows = state.pop_log_df.where("wave = 1").select("seq", "node").collect()
    seqs = sorted(r.seq for r in rows)
    assert seqs == list(range(1, n_children + 1))
    by_seq = {r.seq: r.node for r in rows}
    assert by_seq[1] == "0xchild000000" and by_seq[n_children] == f"0xchild{n_children-1:06d}"


def test_seen_compaction_on_deep_crawl(spark):
    """Uncheckpointed long crawls compact the seen union chain every N
    waves; the crawl result is unchanged by compaction."""
    import pandas as pd

    chain = pd.DataFrame({
        "id": [f"e{i}" for i in range(12)],
        "hash": "0xh",
        "address_from": [f"0xn{i}" for i in range(12)],
        "address_to": [f"0xn{i+1}" for i in range(12)],
        "value": "1", "token_id": "",
        "timestamp": range(12), "block_number": range(12),
        "contract_address": "0x" + "0" * 40, "symbol": "native",
        "decimals": 18, "gas": "0", "gas_price": "0",
    })
    edges = spark.createDataFrame(chain)
    compacting = BfsWaveEngine(spark, edges, max_depth=12)
    compacting.seen_compact_every = 3
    got, _, _ = compacting.run("0xn0", collect_transfers=False)
    plain_engine = BfsWaveEngine(spark, edges, max_depth=12)
    plain_engine.seen_compact_every = 10_000  # effectively off
    want, _, _ = plain_engine.run("0xn0", collect_transfers=False)
    assert got.pop_log == want.pop_log
    assert got.next_seq == 13  # the whole chain was reached


def test_emitted_compaction_bounds_plan_depth(spark):
    """The per-wave emitted-transfers union compacts on the same cadence
    as seen: a 20-wave crawl's emitted plan stays O(compact interval)
    union branches deep instead of one per wave, and the final
    transfer set is unchanged."""
    import pandas as pd

    n = 20
    chain = pd.DataFrame({
        "id": [f"e{i}" for i in range(n)],
        "hash": "0xh",
        "address_from": [f"0xn{i}" for i in range(n)],
        "address_to": [f"0xn{i+1}" for i in range(n)],
        "value": "1", "token_id": "",
        "timestamp": range(n), "block_number": range(n),
        "contract_address": "0x" + "0" * 40, "symbol": "native",
        "decimals": 18, "gas": "0", "gas_price": "0",
    })
    edges = spark.createDataFrame(chain)
    compacting = BfsWaveEngine(spark, edges, max_depth=n)
    compacting.seen_compact_every = 4
    _, got_emitted, _ = compacting.run("0xn0")
    plain = BfsWaveEngine(spark, edges, max_depth=n)
    plain.seen_compact_every = 10_000  # effectively off
    _, want_emitted, _ = plain.run("0xn0")

    got_plan = got_emitted._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    want_plan = want_emitted._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    # the compacted plan is one parquet scan plus at most the waves run
    # since the last compaction (here: the trailing empty-frontier wave
    # 21); the plain engine accumulated one branch per wave
    assert got_plan.count("Relation") <= compacting.seen_compact_every + 1
    assert want_plan.count("Relation") >= n
    assert ({r.id for r in got_emitted.select("id").collect()}
            == {r.id for r in want_emitted.select("id").collect()}
            == {f"e{i}" for i in range(n)})


def test_checkpoint_resume(spark, edges_df, images_df, source, oracle_result, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    engine = BfsWaveEngine(spark, edges_df, images=images_df, max_depth=2, checkpoint_dir=ckpt)
    # run only wave 1, drop everything, resume from the snapshot
    state = engine.start(source)
    state, _, _ = engine.run_wave(state)
    resumed = engine.resume(1)
    assert resumed.pop_log == state.pop_log
    while resumed.frontier.limit(1).count() > 0 and resumed.wave <= 2:
        resumed, _, _ = engine.run_wave(resumed)
    want = [(step, node) for step, node, _ in oracle_result.pop_log]
    got = [(seq, node) for seq, node, _ in resumed.pop_log]
    assert got == want, "resume from snapshot reproduces the identical crawl"
