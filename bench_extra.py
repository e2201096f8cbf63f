"""Round-7 optimization harness (guide §1): per-query noop-sink timing,
``explain("formatted")`` capture, and per-wave crawl traces.

NOT the driver bench — ``bench.py`` stays frozen. This file exists so
OPTIMIZATION_r07.md can cite isolated measurements:

  python bench_extra.py queries [name ...]     # noop-sink best-of-2 per query
  python bench_extra.py explain TAG [name ...] # plans/r07/<name>_<TAG>.txt
  python bench_extra.py crawl|haircut|redirect # bench.py crawl fns, wave trace on
  python bench_extra.py steady                 # bench_scaling.run_level(CPUS)

Env: SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's r6 measurement
scale), SPARK_GRAFT_CPUS (default 32). SPARK_GRAFT_WAVE_TRACE=1 makes
the wave engines print per-wave wall-clock splits to stderr.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def _spark():
    from blockchainspider_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{CPUS}]", extra_conf={
        "spark.sql.shuffle.partitions": str(max(int(CPUS), 16)),
    })
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _suite():
    from blockchainspider_spark.entry_dedup import build_dedup_suite
    from blockchainspider_spark.entry_queries import build_suite

    queries, _ = build_suite()
    dq, _ = build_dedup_suite()
    queries.update(dq)
    return queries


HEADLINE = [
    "flagship_pricing_rollup", "j1_frontier_expand", "a2_weight_scatter",
    "a8_swap_cancel", "w1_cumulative_flow", "crawl_bfs_seen",
    "d3_lsh_near_dup", "d6_embedding_neardup", "sim_ann_topk",
    "t2_quality_score", "d7_dup_spans", "t12_lm_score",
]


def _warmup(spark):
    from pyspark.sql import functions as F  # noqa: F401

    for t in ("lineitem", "orders", "documents", "embeddings", "events", "customer"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    spark.range(2048).selectExpr("cast(id as string) as node").mapInPandas(
        lambda it: it, "node string"
    ).count()


def cmd_queries(names):
    spark = _spark()
    queries = _suite()
    _warmup(spark)
    for name in names or HEADLINE:
        fn = queries[name]
        walls = []
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        print(f"{name}: noop best-of-2 {min(walls):.3f}s ({walls[0]:.2f}/{walls[1]:.2f})")


def cmd_explain(tag, names):
    spark = _spark()
    queries = _suite()
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names or HEADLINE:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
        spark.catalog.clearCache()


def cmd_crawl(which):
    os.environ.setdefault("SPARK_GRAFT_WAVE_TRACE", "1")
    import bench

    bench.SF_DIR = SF_DIR
    spark = _spark()
    _warmup(spark)
    import tempfile
    with tempfile.TemporaryDirectory() as wtmp:
        spark.range(16).write.mode("overwrite").parquet(os.path.join(wtmp, "w"))
    if which == "crawl":
        for i in range(2):
            ups, wall, n = bench.crawl_bench(spark)
            print(f"crawl_bfs_wavebatched[{i}]: {wall:.2f}s ({n} urls, {ups:.0f}/s)")
    elif which == "haircut":
        for i in range(2):
            wall, pops = bench.haircut_bench(spark)
            print(f"crawl_haircut_wavebatched[{i}]: {wall:.2f}s ({pops} pops)")
    elif which == "redirect":
        for i in range(2):
            wall, pops = bench.redirect_bench(spark)
            print(f"crawl_redirect_wavebatched[{i}]: {wall:.2f}s ({pops} pops)")


def cmd_steady():
    from tools.bench_scaling import run_level

    print(run_level(int(CPUS)))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "explain":
        cmd_explain(sys.argv[2], sys.argv[3:])
    elif cmd in ("crawl", "haircut", "redirect"):
        cmd_crawl(cmd)
    elif cmd == "steady":
        cmd_steady()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
