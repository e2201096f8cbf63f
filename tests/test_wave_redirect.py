"""Wave-batched TTRRedirect vs the sequential exact engine.

The wave engine keeps chips in a DataFrame, pops top-k via one
TakeOrderedAndProject, runs A9 (seed symbol sums) and A10 (chip merges)
as DataFrame aggregations, and executes the J8 netting + temporal
distribution + A11 swap walk as one applyInPandas kernel per popped
node — sharing the per-node numeric core with the exact engine, while
the oracle/ ports stay the independent implementation (pinned against
both in tests/test_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_redirect import TtrRedirectWaveEngine

EPS = 5e-3


@pytest.fixture(scope="module")
def seq(spark, edges_df, source):
    return ExactCrawlEngine(spark, edges_df, "TTRRedirect", {"epsilon": EPS}).run(
        source, max_steps=10
    )


@pytest.fixture(scope="module")
def wave(spark, edges_df, source):
    return TtrRedirectWaveEngine(spark, edges_df, epsilon=EPS).run(
        source, max_pops=11
    )


def test_k1_pop_order_matches_sequential(seq, wave):
    want = [(s, n) for s, n, _ in seq.pop_log]
    assert wave.pop_log[: len(want)] == want


def test_k1_pop_residuals_match_sequential(seq, wave):
    """Chip-sum residuals at pop time agree to float-reassociation
    tolerance (the DataFrame sum reorders additions)."""
    want = {s: ctx.get("residual") for s, _, ctx in seq.pop_log if ctx}
    got = {r.seq: r.residual for r in wave.pop_log_df.collect()}
    for s, res in want.items():
        assert abs(got[s] - res) < 1e-9, s


def test_k1_ranks_match_sequential(spark, edges_df, source):
    """Natural-termination run: p-mass per node equals the sequential
    engine to 1e-9 (same push math, float order aside)."""
    eps = 2e-2
    seq = ExactCrawlEngine(spark, edges_df, "TTRRedirect", {"epsilon": eps}).run(source)
    wave = TtrRedirectWaveEngine(spark, edges_df, epsilon=eps).run(source)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    ranks = wave.ranks()
    want = {k: v for k, v in seq.ranks.items() if v > 0}
    assert set(ranks) == set(want)
    for node, p in ranks.items():
        assert abs(p - want[node]) < 1e-9, node


def test_batched_k3_terminates_and_is_dense(spark, edges_df, source):
    wave = TtrRedirectWaveEngine(spark, edges_df, epsilon=EPS, k=3).run(
        source, max_pops=9
    )
    seqs = [s for s, _ in wave.pop_log]
    assert seqs == list(range(len(seqs)))
    assert all(rec["pops"] <= 3 for rec in wave.lineage)
    # chips are merged per (node, symbol, ts): no duplicate keys survive
    dup = (
        wave.chips.groupBy("node", "symbol", "ts").count()
        .where(F.col("count") > 1).count()
    )
    assert dup == 0
