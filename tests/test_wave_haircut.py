"""Wave-batched Haircut vs the sequential exact engine.

The k=1 pin is the strong contract: the DataFrame-resident top-k pop
(weight desc, first-touch-key tiebreak) must reproduce the sequential
engine's pop ORDER exactly — same argmax, same insertion-order
tiebreak, same min_weight eligibility (strategies_vec.VecHaircut /
reference strategies/txs/haircut.py semantics)."""

import pytest

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_haircut import HaircutWaveEngine


@pytest.fixture(scope="module")
def sequential(spark, edges_df, source):
    return ExactCrawlEngine(spark, edges_df, "Haircut", {"min_weight": 1e-2}).run(source)


def test_k1_pop_order_identical_to_sequential(spark, edges_df, source, sequential):
    wave = HaircutWaveEngine(spark, edges_df, k=1, min_weight=1e-2).run(source)
    seq_pops = [(s, n) for s, n, _ in sequential.pop_log]
    assert wave.pop_log == seq_pops
    assert wave.seen == sequential.seen


def test_k1_respects_max_pops(spark, edges_df, source, sequential):
    wave = HaircutWaveEngine(spark, edges_df, k=1, min_weight=1e-2).run(source, max_pops=5)
    assert wave.pop_log == [(s, n) for s, n, _ in sequential.pop_log][:5]


def test_batched_k_pops_are_valid_and_terminate(spark, edges_df, source, sequential):
    """k=4: each wave pops ≤k distinct unvisited nodes; seqs are dense;
    the crawl terminates. Batch semantics (all k pops read the pre-wave
    state) are the documented k>1 divergence — the SET is still pinned
    to stay within the sequential crawl's reachable ball."""
    wave = HaircutWaveEngine(spark, edges_df, k=4, min_weight=1e-2).run(source)
    pops = wave.pop_log
    seqs = [s for s, _ in pops]
    nodes = [n for _, n in pops]
    assert seqs == list(range(len(pops)))
    assert len(set(nodes)) == len(nodes), "no node pops twice"
    assert all(rec["pops"] <= 4 for rec in wave.lineage)
    # reachability: every batched pop is reachable from the source in the
    # directed graph (weight only flows along out-edges)
    rows = edges_df.select("address_from", "address_to").collect()
    adj = {}
    for r in rows:
        adj.setdefault(r.address_from, set()).add(r.address_to)
    reach, stack = {source}, [source]
    while stack:
        for nxt in adj.get(stack.pop(), ()):
            if nxt not in reach:
                reach.add(nxt)
                stack.append(nxt)
    assert set(nodes) <= reach
