"""SparkSession factory tuned for the crawl engine.

Defaults follow the scale notes in SURVEY.md §4: AQE on (skew-join +
partition coalescing), Arrow-batched Python exchange, modest shuffle
partition count for local[*] testing (override for clusters via
``spark.sql.shuffle.partitions`` in ``extra_conf``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "blockchainspider-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback
    ``local[*]``) so the same entrypoint runs under ``spark-submit`` on a
    real cluster (where ``master`` is supplied externally and must be
    passed as ``None``).
    """
    # pin per-process BLAS threading: Python workers run one per task
    # slot, and nested BLAS pools oversubscribe the box (measured: the
    # payload kernel stops scaling entirely with default OpenBLAS threads)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": DEFAULT_SHUFFLE_PARTITIONS,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # guide §3.1: let the planner pick shuffled-hash over sort-merge
        # when one side builds a per-partition hash map — skips both
        # sort passes on the fact⋈fact joins (orders⋈lineitem). Safe
        # here and on the target cluster profile (build side is bounded
        # by advisory partition size; AQE skew split still applies).
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # local-mode driver == executor JVM: size the heap to the host
        # (128 GiB sandbox / driver contract) so the persisted engine
        # indexes (touch/out-edge views) don't evict into GC storms at
        # sf≥1 — measured 1.5-4x wave-time inflation at 8g (r7).
        # Clusters override via env or extra_conf as before.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "spark.ui.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Read the driver-generated parquet tables and register temp views."""
    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
