"""Direct tests of the dense distributed seq assignment (engine/distseq)
— both the small-wave single-task path and the big-wave range-exchange
path must produce the identical dense global ordering."""

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.engine.distseq import assign_global_seq


@pytest.fixture(scope="module")
def keyed(spark):
    # non-monotone keys across partitions: id*2641 % 9973 is a bijection
    # on 0..9972, so sort order ≠ input order and keys are unique
    df = spark.range(0, 9973).select(
        ((F.col("id") * 2641) % 9973).alias("k1"),
        F.concat(F.lit("n"), F.col("id")).alias("node"),
    ).repartition(7)
    df.persist().count()
    return df


def expected(spark, keyed, base):
    rows = sorted((r.k1, r.node) for r in keyed.collect())
    return {node: base + i + 1 for i, (_, node) in enumerate(rows)}


@pytest.mark.parametrize("threshold,label", [(0, "big"), (10**6, "small")])
def test_both_paths_assign_the_dense_global_order(spark, keyed, threshold, label):
    asg = assign_global_seq(keyed, ["k1"], base_seq=41, n_partitions=5,
                            small_threshold=threshold)
    got = {r.node: r.seq for r in asg.df.select("node", "seq").collect()}
    asg.cleanup()
    assert asg.total == 9973
    assert got == expected(spark, keyed, 41), f"{label} path order wrong"
    if label == "small":
        assert asg.driver_rows == 1
    else:
        assert asg.driver_rows <= 1 + 5  # count scalar + per-partition rows


def test_empty_input(spark):
    empty = spark.createDataFrame([], "k1 long, node string")
    asg = assign_global_seq(empty, ["k1"])
    assert asg.total == 0
    assert asg.df.count() == 0
    assert "seq" in asg.df.columns
