"""spark-submit entrypoint for the crawl engine.

Cluster usage (the north rule's execution mode):

    cd /root/repo && zip -r /tmp/bss.zip blockchainspider_spark
    spark-submit --py-files /tmp/bss.zip tools/submit_crawl.py \
        --edges <parquet path> --images <parquet path> \
        --source 0xSEED --strategy BFS --depth 2 \
        --checkpoint /path/ckpt --out /path/out [--resume-wave K] [--qps 10]

Local smoke (this sandbox):

    python tools/submit_crawl.py --demo

The script only uses ``SparkSession.builder.getOrCreate()`` — master,
executor counts and memory come from spark-submit, so the same file runs
at N and 4N executors unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges")
    ap.add_argument("--images")
    ap.add_argument("--source")
    ap.add_argument("--strategy", default="BFS")
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--qps", type=float, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume-wave", type=int, default=None)
    ap.add_argument("--bloom", choices=["off", "broadcast", "sharded", "cuckoo"],
                    default="off",
                    help="URL-seen pre-filter mode (sharded = 10^10-key Bloom; "
                         "cuckoo = deletable sharded form, required for "
                         "--repair-failed with a filter on)")
    ap.add_argument("--repair-failed", type=int, default=0, metavar="N",
                    help="after a BFS crawl, forget nodes whose fetch failed "
                         "the decode invariant (psnr_ok/phash_match) and "
                         "re-crawl them, up to N repair waves (needs "
                         "--bloom cuckoo or off)")
    ap.add_argument("--wave-k", type=int, default=None,
                    help="run the weighted strategy wave-BATCHED with k pops "
                         "per wave (Haircut/TTRBase/TTRWeight/APPR; k=1 "
                         "reproduces the sequential order for Haircut/TTR)")
    ap.add_argument("--epsilon", type=float, default=None,
                    help="residual threshold for wave-batched TTR/APPR")
    ap.add_argument("--recrawl", type=int, default=0, metavar="N",
                    help="after a BFS crawl, run N conditional-revalidation "
                         "waves over the crawled URL set (RevalidatingFetcher: "
                         "ETag/If-None-Match, 304 serves cache, 200 upserts); "
                         "demo origin changes ~1/3 of bodies from wave 2 on")
    ap.add_argument("--warc-out", default=None, metavar="DIR",
                    help="after a BFS crawl, archive the fetched pages as "
                         "WARC 1.1 gzip-member shards under DIR/warc plus a "
                         "SURT-sorted CDX index parquet under DIR/cdx "
                         "(sources/warc.py); the summary reports the "
                         "read-back record count")
    ap.add_argument("--demo", action="store_true")
    args = ap.parse_args()
    if not args.demo and (not args.edges or not args.source):
        ap.error("--edges and --source are required (or use --demo)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bss-crawl").getOrCreate()

    if args.demo:
        from blockchainspider_spark.fixtures.generators import make_edges, make_images, node_address

        edges = spark.createDataFrame(make_edges(60, 400, seed=42))
        images = spark.createDataFrame(
            make_images(image_ids=[node_address(i) for i in range(60)], seed=42)
        )
        source = node_address(0)
    else:
        edges = spark.read.parquet(args.edges)
        images = spark.read.parquet(args.images) if args.images else None
        source = args.source

    if args.strategy == "BFS":
        from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine

        use_bloom = {"off": False, "broadcast": True, "sharded": "sharded",
                     "cuckoo": "cuckoo"}[args.bloom]
        engine = BfsWaveEngine(
            spark, edges, images=images, max_depth=args.depth,
            checkpoint_dir=args.checkpoint, qps=args.qps, lineage_detail=True,
            use_bloom=use_bloom,
        )
        if args.resume_wave is not None:
            state = engine.resume(args.resume_wave)
            while state.frontier_size > 0 and state.wave <= args.depth:
                state, _, _ = engine.run_wave(state)
            emitted = fetched = None
        else:
            state, emitted, fetched = engine.run(source)
        repair_waves = 0
        if args.repair_failed and fetched is not None:
            from pyspark.sql import functions as F

            for _ in range(args.repair_failed):
                bad = fetched.where(
                    ~F.col("psnr_ok") | ~F.col("phash_match")
                ).select("node")
                if not bad.count():
                    break
                state, _, fetched = engine.repair(state, bad)
                repair_waves += 1
        summary = {"pops": state.next_seq, "lineage": state.lineage}
        if args.repair_failed:
            summary["repair_waves"] = repair_waves
        if args.recrawl:
            import hashlib

            import pandas as pd
            from pyspark.sql import functions as F

            from blockchainspider_spark.engine.fetch_cache import (
                REVAL_FETCH_SCHEMA,
                RevalidatingFetcher,
            )

            epoch = {"n": 0}

            def origin(reqs):
                ep = epoch["n"]

                def kernel(batches):
                    for pdf in batches:
                        out = {"cache_key": [], "status": [], "etag": [],
                               "last_modified": [], "response": []}
                        for r in pdf.itertuples(index=False):
                            key = r.cache_key
                            h = int(hashlib.md5(key.encode()).hexdigest()[:4], 16)
                            ver = 2 if ep >= 1 and h % 3 == 0 else 1
                            body = f"{key}#{ver}"
                            etag = hashlib.md5(body.encode()).hexdigest()[:8]
                            out["cache_key"].append(key)
                            if r.if_none_match == etag:
                                out["status"].append(304)
                                out["etag"].append(None)
                                out["last_modified"].append(None)
                                out["response"].append(None)
                            else:
                                out["status"].append(200)
                                out["etag"].append(etag)
                                out["last_modified"].append(ver)
                                out["response"].append(body)
                        yield pd.DataFrame(out)

                return reqs.mapInPandas(kernel, REVAL_FETCH_SCHEMA)

            fetcher = RevalidatingFetcher(spark, origin)
            urls = state.pop_log_df.select(F.col("node").alias("cache_key"))
            summary["recrawl"] = []
            for _ in range(args.recrawl):
                fetcher.fetch(urls)   # stats collected inside fetch()
                s = fetcher.stats[-1]
                summary["recrawl"].append(
                    {"miss": s.misses, "revalidated": s.revalidated,
                     "changed": s.changed})
                epoch["n"] += 1
        if args.warc_out and fetched is not None:
            from pyspark.sql import functions as F

            from blockchainspider_spark.sources.warc import (
                cdx_index, read_warc, write_warc,
            )

            pages = (
                fetched.select("node").distinct()
                .join(images.select("node", F.col("image_id").alias("url"),
                                    "bytes", "fmt"), on="node")
                .select("url", F.lit(200).alias("status"),
                        F.concat(F.lit("image/"), F.col("fmt")).alias("content_type"),
                        F.col("bytes").alias("payload")))
            warc_dir = os.path.join(args.warc_out, "warc")
            write_warc(pages, warc_dir)
            # read back through the production parser (digest verify on)
            records = read_warc(spark, warc_dir)
            cdx_index(records).write.mode("overwrite").parquet(
                os.path.join(args.warc_out, "cdx"))
            summary["warc"] = {
                "records": records.where("warc_type = 'response'").count(),
                "shards": records.select("filename").distinct().count(),
            }
        print(json.dumps(summary, default=str))
        if args.out:
            if emitted is not None:
                emitted.write.mode("overwrite").parquet(os.path.join(args.out, "transfers"))
            if fetched is not None:
                fetched.write.mode("overwrite").parquet(os.path.join(args.out, "fetched"))
            # pop log is already a distributed DataFrame — write it
            # directly, never through a driver list
            state.pop_log_df.select("seq", "node", "depth").write.mode(
                "overwrite"
            ).parquet(os.path.join(args.out, "pop_log"))
    elif args.wave_k is not None:
        # wave-batched weighted crawl: weights/residuals DataFrame-resident,
        # k pops per Spark wave
        kw = {"k": args.wave_k, "checkpoint_dir": args.checkpoint}
        eps = {"epsilon": args.epsilon} if args.epsilon else {}
        if args.strategy == "Haircut":
            from blockchainspider_spark.engine.wave_haircut import HaircutWaveEngine

            engine = HaircutWaveEngine(spark, edges, **kw)
        elif args.strategy in ("TTRBase", "TTRWeight"):
            from blockchainspider_spark.engine.wave_weighted import TtrWaveEngine

            engine = TtrWaveEngine(
                spark, edges, weighted=args.strategy == "TTRWeight", **kw, **eps)
        elif args.strategy == "APPR":
            from blockchainspider_spark.engine.wave_weighted import ApprWaveEngine

            engine = ApprWaveEngine(spark, edges, **kw, **eps)
        elif args.strategy == "TTRTime":
            from blockchainspider_spark.engine.wave_weighted import TtrTimeWaveEngine

            engine = TtrTimeWaveEngine(spark, edges, **kw, **eps)
        elif args.strategy == "TTRRedirect":
            from blockchainspider_spark.engine.wave_redirect import TtrRedirectWaveEngine

            engine = TtrRedirectWaveEngine(spark, edges, **kw, **eps)
        else:
            ap.error(f"no wave-batched form for strategy {args.strategy}")
        if args.resume_wave is not None:
            # resume from the newest durable wave snapshot (requires
            # --checkpoint from the interrupted run)
            if args.strategy in ("TTRTime", "TTRRedirect"):
                state = engine.resume(source, max_pops=10_000)
            else:
                state = engine.resume(max_pops=10_000)
        else:
            state = engine.run(source, max_pops=10_000)
        print(json.dumps({"pops": state.next_seq, "lineage": state.lineage}, default=str))
        if args.out:
            state.pop_log_df.write.mode("overwrite").parquet(
                os.path.join(args.out, "pop_log")
            )
    else:
        from blockchainspider_spark.engine.exact import ExactCrawlEngine

        engine = ExactCrawlEngine(
            spark, edges, args.strategy, {"depth": args.depth},
            checkpoint_dir=args.checkpoint,
        )
        result = engine.run(source, max_steps=10_000)
        print(json.dumps({"pops": len(result.pop_log), "seen": len(result.seen)}))

    spark.stop()


if __name__ == "__main__":
    main()
