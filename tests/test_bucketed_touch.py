"""Bucketed edge-table layout: the 100-TB expand-join story, verified.

When the frontier outgrows broadcast, the expand join becomes a
sort-merge join on `endpoint`. With the touch view materialized as a
bucketed table (operators/transfers.write_bucketed_touch), the edge side
reads pre-hash-distributed: the physical plan must contain NO exchange
on the scan side — only the frontier side shuffles — and the crawl
result must be byte-identical to the default (persisted-view) engine."""

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
from blockchainspider_spark.operators.transfers import write_bucketed_touch


@pytest.fixture(scope="module")
def bucketed_touch(spark, edges_df, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("bucketed") / "touch")
    return write_bucketed_touch(edges_df, "touch_bucketed_test", n_buckets=8, path=loc)


def test_bucketed_scan_side_has_no_exchange(spark, bucketed_touch):
    """Sort-merge join against the bucketed table: the scan side carries
    bucket metadata and needs no Exchange; only the probe side shuffles."""
    frontier = spark.range(0, 1000).select(
        F.concat(F.lit("0x"), F.md5(F.col("id").cast("string"))).alias("_parent")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_touch.join(
            frontier, on=F.col("endpoint") == F.col("_parent"), how="inner"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "SelectedBucketsCount" in plan, "scan must carry bucket pruning metadata"
    # exactly ONE exchange: the frontier side; the bucketed scan side
    # must read pre-distributed
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]


def test_crawl_identical_with_bucketed_touch(spark, edges_df, source, bucketed_touch):
    """Same pop log whether the touch view is the in-memory persisted
    explode or the bucketed table, with or without broadcast frontiers."""
    default_engine = BfsWaveEngine(spark, edges_df, max_depth=2)
    plain, _, _ = default_engine.run(source, collect_transfers=False)
    bucketed_engine = BfsWaveEngine(
        spark, edges_df, max_depth=2, touch=bucketed_touch,
        broadcast_frontier=False,
    )
    bucketed, _, _ = bucketed_engine.run(source, collect_transfers=False)
    assert bucketed.pop_log == plain.pop_log
