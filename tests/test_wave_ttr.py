"""Wave-batched TTRBase/TTRWeight vs the sequential exact engine.

k=1 must reproduce the sequential pop order EXACTLY — including
re-pops (TTR has no visited set: a node that regains residual above
epsilon pops again) and the forward-before-backward insertion-order
tiebreak — plus the p-mass ranks to 1e-9."""

import pytest

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_weighted import TtrWaveEngine


@pytest.mark.parametrize("strategy,weighted,eps", [
    ("TTRBase", False, 5e-2),
    ("TTRWeight", True, 5e-2),
])
def test_k1_pop_order_and_ranks_match_sequential(spark, edges_df, source,
                                                 strategy, weighted, eps):
    # natural termination on both sides: a max_steps cut would leave the
    # sequential engine's final pop un-pushed (its p credit missing),
    # while the wave engine always pushes what it pops
    seq = ExactCrawlEngine(spark, edges_df, strategy, {"epsilon": eps}).run(source)
    wave = TtrWaveEngine(spark, edges_df, weighted=weighted, epsilon=eps).run(source)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    ranks = wave.ranks()
    assert set(ranks) == set(seq.ranks)
    for node, p in ranks.items():
        assert abs(p - seq.ranks[node]) < 1e-9, node


def test_repops_happen(spark, edges_df, source):
    """The fixture graph has cycles: with a small epsilon at least one
    node must pop more than once (the no-visited-set contract)."""
    wave = TtrWaveEngine(spark, edges_df, weighted=False, epsilon=1e-2).run(
        source, max_pops=60
    )
    nodes = [n for _, n in wave.pop_log]
    assert len(nodes) > len(set(nodes)), "expected at least one re-pop"


def test_batched_k4_terminates_and_is_dense(spark, edges_df, source):
    # 37 = seed wave (1 pop) + 9 full k=4 waves — budgets must land on
    # a wave boundary now that mid-batch cuts raise (VERDICT r4)
    wave = TtrWaveEngine(spark, edges_df, weighted=False, epsilon=5e-3, k=4).run(
        source, max_pops=37
    )
    seqs = [s for s, _ in wave.pop_log]
    assert seqs == list(range(len(seqs)))
    assert all(rec["pops"] <= 4 for rec in wave.lineage)
