"""Wave-batched TTRTime vs the sequential exact engine.

The chips (timestamp → residual) flow — temporal eligibility via
searchsorted/cumsum in the sequential kernel — is recomputed as two
range-frame window passes over a per-node chips∪edges union; k=1 must
reproduce the sequential pop order exactly (including the seed wave,
re-pops, sentinel chips) and the p-mass ranks to 1e-9."""

import pytest

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_weighted import TtrTimeWaveEngine

EPS = 5e-2


@pytest.fixture(scope="module")
def seq(spark, edges_df, source):
    return ExactCrawlEngine(spark, edges_df, "TTRTime", {"epsilon": EPS}).run(source)


def test_k1_pop_order_and_ranks_match_sequential(spark, edges_df, source, seq):
    wave = TtrTimeWaveEngine(spark, edges_df, epsilon=EPS).run(source)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    ranks = wave.ranks()
    want = {k: v for k, v in seq.ranks.items() if v > 0}
    assert set(ranks) == set(want)
    for node, p in ranks.items():
        assert abs(p - want[node]) < 1e-9, node


def test_repops_and_seed_wave(spark, edges_df, source, seq):
    """The source re-pops right after the seed wave (its seeded chips
    hold (1-α) mass), and at least one other node re-pops later."""
    pops = [n for _, n, _ in seq.pop_log]
    wave = TtrTimeWaveEngine(spark, edges_df, epsilon=EPS).run(source)
    got = [n for _, n in wave.pop_log]
    assert got == pops
    assert got[0] == got[1] == source
    assert len(got) > len(set(got))


def test_batched_k3_terminates_and_is_dense(spark, edges_df, source):
    wave = TtrTimeWaveEngine(spark, edges_df, epsilon=EPS, k=3).run(
        source, max_pops=12
    )
    seqs = [s for s, _ in wave.pop_log]
    assert seqs == list(range(len(seqs)))
    assert all(rec["pops"] <= 3 for rec in wave.lineage)
