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
    from pyspark.sql import functions as F

    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
    from blockchainspider_spark.entry_crawl import _edges_as_transfers

    sf_dir = "/root/testdata/sf0.001"
    engine = BfsWaveEngine(spark, _edges_as_transfers(spark, sf_dir), max_depth=2)
    state, _, _ = engine.run("c1", collect_transfers=False)
    return state.pop_log_df.select("seq", "node", F.col("depth").cast("int").alias("depth"))


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
