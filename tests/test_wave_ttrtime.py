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


def test_hub_pop_is_straggler_not_abort(spark):
    """Scale-surface audit (round 6): TTRTime's push runs as per-node
    JVM range-frame windows, so a popped hub concentrates its slice in
    ONE window group — a spillable sorted straggler, NOT the Python
    kernel + hard abort the redirect engine had before round 6. Pin
    the distinction: a 100k-edge hub pop COMPLETES and accounts its
    chips."""
    from pyspark.sql import functions as F

    n_leaves = 100_000
    s, h = "0x" + "e" * 40, "0x" + "f" * 40
    leaves = spark.range(n_leaves).select(
        F.sha1(F.concat_ws("_", F.lit("tth"), "id")).alias("id"),
        F.sha1(F.concat_ws("#", F.lit("tth"), "id")).alias("hash"),
        F.lit(h).alias("address_from"),
        F.concat(F.lit("leaf"), F.col("id")).alias("address_to"),
        F.lit("1.0").alias("value"), F.lit("").alias("token_id"),
        (F.lit(200) + F.col("id")).cast("long").alias("timestamp"),
        (F.lit(10) + F.col("id")).cast("long").alias("block_number"),
        F.lit("0x" + "0" * 40).alias("contract_address"),
        F.lit("native").alias("symbol"),
        F.lit(18).alias("decimals"),
        F.lit("0").alias("gas"), F.lit("0").alias("gas_price"),
    )
    # two s->h edges: TTRTime chips flow only across edges STRICTLY
    # later than the chip, so the ts=100 seed chip needs the ts=150
    # edge to reach the hub
    feed = spark.createDataFrame(
        [("0xseed", "hseed", s, h, "1.0", "", 100, 1,
          "0x" + "0" * 40, "native", 18, "0", "0"),
         ("0xseed2", "hseed2", s, h, "1.0", "", 150, 2,
          "0x" + "0" * 40, "native", 18, "0", "0")],
        leaves.schema,
    )
    edges = feed.unionByName(leaves).repartition(16).persist()
    edges.count()
    got = TtrTimeWaveEngine(spark, edges, epsilon=1e-6).run(s, max_pops=6)
    pops = [n for _, n in got.pop_log]
    assert pops[0] == s and h in pops, pops
    # h's push flowed mass to the temporally-later leaves
    assert got.chips.where(F.col("node").startswith("leaf")).count() > 0
    edges.unpersist()
