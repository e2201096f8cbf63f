"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship distributed BFS crawl over a graph
derived from the sf0.001 tables; ``queries()``/``oracle_sql()`` expose
the operator-gate suite (SURVEY.md §2 IDs in the names) checked against
DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wave-batched BFS crawl (depth 2) over the customer↔part
    bipartite graph of sf0.001; returns the crawl-order log
    (seq, node, depth) — the north rule's pop-order contract."""
    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
    from blockchainspider_spark.entry_queries import _bipartite_edges

    sf_dir = "/root/testdata/sf0.001"
    edges = _bipartite_edges(spark, sf_dir).withColumnRenamed("src", "address_from") \
        .withColumnRenamed("dst", "address_to")
    from pyspark.sql import functions as F

    edges = edges.select(
        F.sha1(F.concat_ws("_", "address_from", "address_to")).alias("id"),
        F.lit("0x0").alias("hash"),
        "address_from",
        "address_to",
        F.lit("1").alias("value"),
        F.lit("").alias("token_id"),
        F.lit(0).cast("long").alias("timestamp"),
        F.lit(0).cast("long").alias("block_number"),
        F.lit("0x" + "0" * 40).alias("contract_address"),
        F.lit("native").alias("symbol"),
        F.lit(18).alias("decimals"),
        F.lit("0").alias("gas"),
        F.lit("0").alias("gas_price"),
    ).dropDuplicates(["id"])
    engine = BfsWaveEngine(spark, edges, images=None, max_depth=2)
    state, _, _ = engine.run("c1", collect_transfers=False)
    return spark.createDataFrame(
        [(int(s), n, int(d)) for s, n, d in state.pop_log],
        "seq long, node string, depth int",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blockchainspider_spark.entry_queries import build_suite

    q, _ = build_suite()
    try:
        from blockchainspider_spark.entry_crawl import build_crawl_suite
        from blockchainspider_spark.entry_dedup import build_dedup_suite
        from blockchainspider_spark.entry_etl import build_etl_suite

        for build in (build_dedup_suite, build_crawl_suite, build_etl_suite):
            extra, _ = build()
            q.update(extra)
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    from blockchainspider_spark.entry_queries import build_suite

    _, o = build_suite()
    try:
        from blockchainspider_spark.entry_crawl import build_crawl_suite
        from blockchainspider_spark.entry_dedup import build_dedup_suite
        from blockchainspider_spark.entry_etl import build_etl_suite

        for build in (build_dedup_suite, build_crawl_suite, build_etl_suite):
            _, extra = build()
            o.update(extra)
    except ImportError:
        pass
    return o
