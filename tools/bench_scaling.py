"""Scaling-efficiency evidence: the identical crawl job at N and 4N cores.

The BASELINE.json rule asks for ≥0.8 throughput scaling efficiency from
N to 4N executors. This sandbox has one machine, so (per the driver's
round instructions) we evidence it by running the same job at two local
parallelism levels — local[8] vs local[32] — on the same input and
reporting throughput at both plus eff = thr(4N) / (4 × thr(N)).

Workload = the primary metric's definition: frontier URLs processed/sec
through fetch + dedup + schedule. Edges are generated distributed
(spark.range + hash endpoints, no driver materialization); the fetch
kernel does real per-URL CPU work (synthesize reference pixels from the
URL id, lossy encode, decode, perceptual hash, PSNR check) inside
mapInPandas, exactly like the engine's payload path.

Usage:
  python tools/bench_scaling.py            # full run, writes BENCH/BASELINE.md
  python tools/bench_scaling.py --worker 8 # one level, prints JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES = 60_000
N_EDGES = 2_000_000
MAX_DEPTH = 2
LEVELS = (8, 32)

SYNTH_FETCH_SCHEMA = "node string, phash long, psnr_ok boolean"


def synth_fetch_kernel(batches):
    """Per-URL fetch+decode+verify work, derived purely from the node id."""
    import pandas as pd

    from blockchainspider_spark.fixtures.generators import _pixels_for
    from blockchainspider_spark.functions.imagecodec import (
        phash64, psnr, qjpeg_decode, qjpeg_encode,
    )

    for pdf in batches:
        out = {"node": [], "phash": [], "psnr_ok": []}
        for node in pdf["node"]:
            px = _pixels_for(node, 24, 24)
            decoded = qjpeg_decode(qjpeg_encode(px))
            out["node"].append(node)
            out["phash"].append(phash64(decoded))
            out["psnr_ok"].append(bool(psnr(px, decoded) >= 40.0))
        yield pd.DataFrame(out)


def run_level(ncpus: int) -> dict:
    from pyspark.sql import functions as F

    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
    from blockchainspider_spark.session import get_spark

    spark = get_spark(f"scale-{ncpus}", master=f"local[{ncpus}]", extra_conf={
        "spark.sql.shuffle.partitions": str(ncpus * 2),
    })
    spark.sparkContext.setLogLevel("ERROR")

    edges = (
        spark.range(N_EDGES)
        .select(
            F.sha1(F.concat(F.lit("e"), F.col("id"))).alias("id"),
            F.lit("0x0").alias("hash"),
            F.concat(F.lit("n"), F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(N_NODES))).alias("address_from"),
            F.concat(F.lit("n"), F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(N_NODES))).alias("address_to"),
            F.lit("1").alias("value"),
            F.lit("").alias("token_id"),
            (F.col("id") % 1000).alias("timestamp"),
            (F.col("id") % 500).alias("block_number"),
            F.lit("0x" + "0" * 40).alias("contract_address"),
            F.lit("native").alias("symbol"),
            F.lit(18).alias("decimals"),
            F.lit("0").alias("gas"),
            F.lit("0").alias("gas_price"),
        )
    )
    edges = edges.persist()
    edges.count()  # materialize outside the timed window

    t0 = time.monotonic()
    engine = BfsWaveEngine(spark, edges, images=None, max_depth=MAX_DEPTH)
    state, _, _ = engine.run("n0", collect_transfers=False)
    frontier_nodes = spark.createDataFrame(
        [(n,) for _, n, _ in state.pop_log], "node string"
    ).repartition(ncpus * 2)
    n_fetched = frontier_nodes.mapInPandas(synth_fetch_kernel, SYNTH_FETCH_SCHEMA).count()
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "cpus": ncpus,
        "urls": len(state.pop_log),
        "fetched": n_fetched,
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(len(state.pop_log) / wall, 2),
    }


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return

    results = {}
    for n in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
        print(results[n])

    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    ratio = LEVELS[1] / LEVELS[0]
    eff = hi["urls_per_sec"] / (ratio * lo["urls_per_sec"])
    report = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Per BASELINE.json the rule requires ≥0.8 throughput scaling efficiency
from N to 4N executors. Sandbox evidence (single machine, same job, same
input) per the round instructions: local[{LEVELS[0]}] vs local[{LEVELS[1]}].

Workload: wave-batched BFS crawl (fetch + dedup + schedule) over a
Spark-generated graph of {N_EDGES:,} edges / {N_NODES:,} nodes, depth {MAX_DEPTH};
fetch = per-URL synthesize→lossy-encode→decode→phash→PSNR inside
mapInPandas (the engine's real payload path).

| parallelism | frontier URLs | wall (s) | URLs/sec |
|---|---|---|---|
| local[{LEVELS[0]}] (N)  | {lo['urls']:,} | {lo['wall_sec']} | {lo['urls_per_sec']} |
| local[{LEVELS[1]}] (4N) | {hi['urls']:,} | {hi['wall_sec']} | {hi['urls_per_sec']} |

**Scaling efficiency: eff = thr(4N) / (4 × thr(N)) = {eff:.3f}**
(target ≥ 0.8: {"MET" if eff >= 0.8 else "NOT MET"})

Both runs produce identical frontier URL counts (same input, same
dedup/schedule semantics) — parallelism changes throughput only.
"""
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write(report)
    print(report)


if __name__ == "__main__":
    main()
