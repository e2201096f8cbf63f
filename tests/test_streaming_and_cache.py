"""Tail-follow cursor, retry waves, fetch cache, politeness, robots."""

import time

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.engine.fetch_cache import CachedFetcher, fetch_with_retries
from blockchainspider_spark.fixtures.chain import make_chain
from blockchainspider_spark.streaming.tail_follow import TailFollowSource


@pytest.fixture(scope="module")
def blocks_df(spark):
    blocks, *_ = make_chain(n_blocks=30, txs_per_block=2, seed=3)
    return spark.createDataFrame(blocks)


def test_tail_follow_advances_and_resumes(spark, blocks_df, tmp_path):
    ckpt = str(tmp_path / "cursor.json")
    head = {"h": 1_000_009}
    src = TailFollowSource(blocks_df, lambda: head["h"], ckpt, start_block=1_000_000, max_batch=6)

    b1 = src.poll()
    assert [r.block_number for r in b1.collect()] == list(range(1_000_000, 1_000_006))
    b2 = src.poll()
    assert [r.block_number for r in b2.collect()] == list(range(1_000_006, 1_000_010))
    assert src.poll() is None, "caught up with head"

    head["h"] = 1_000_014
    # simulate restart: new instance reads the checkpointed cursor
    src2 = TailFollowSource(blocks_df, lambda: head["h"], ckpt, start_block=1_000_000, max_batch=6)
    b3 = src2.poll()
    assert [r.block_number for r in b3.collect()] == list(range(1_000_010, 1_000_015))


def test_retry_waves(spark):
    reqs = spark.createDataFrame([(i,) for i in range(10)], "req_id long")

    def attempt_fn(batch, attempt):
        # req_id % 3 == 0 succeed immediately; %3==1 succeed on attempt 1;
        # %3==2 never succeed
        return batch.withColumn(
            "ok",
            (F.col("req_id") % 3 == 0)
            | ((F.col("req_id") % 3 == 1) & (F.lit(attempt) >= 1)),
        )

    out = fetch_with_retries(reqs, attempt_fn, max_retry=2).collect()
    by_id = {r.req_id: r for r in out}
    assert len(by_id) == 10
    assert all(by_id[i].status == "ok" and by_id[i].attempts == 1 for i in (0, 3, 6, 9))
    assert all(by_id[i].status == "ok" and by_id[i].attempts == 2 for i in (1, 4, 7))
    assert all(by_id[i].status == "failed" for i in (2, 5, 8))


def test_fetch_cache_hit_rate(spark):
    calls = []

    def fetch_fn(misses):
        rows = misses.select("cache_key").collect()
        calls.append(len(rows))
        return spark.createDataFrame(
            [(r.cache_key, f"resp:{r.cache_key}") for r in rows],
            "cache_key string, response string",
        )

    fetcher = CachedFetcher(spark, fetch_fn)
    r1 = fetcher.fetch(spark.createDataFrame([("a",), ("b",), ("c",)], "cache_key string"))
    assert r1.count() == 3 and calls == [3]
    assert fetcher.stats[-1].hit_rate == 0.0

    r2 = fetcher.fetch(spark.createDataFrame([("b",), ("c",), ("d",)], "cache_key string"))
    got = {r.cache_key: r.response for r in r2.collect()}
    assert got == {"b": "resp:b", "c": "resp:c", "d": "resp:d"}
    assert calls == [3, 1], "only the miss is fetched"
    assert abs(fetcher.stats[-1].hit_rate - 2 / 3) < 1e-9


def test_fetch_cache_incremental_maintenance(spark):
    """Per-wave cache maintenance is O(delta), not O(|cache|): the cache
    plan's union depth stays bounded by ``compact_every`` (the delta
    chain is rewritten to parquet), and every compaction resets the
    delta list — so a 10^4-wave crawl never re-materializes the full
    cache per wave."""

    def fetch_fn(misses):
        return misses.select(
            "cache_key", F.concat(F.lit("resp:"), F.col("cache_key")).alias("response")
        )

    fetcher = CachedFetcher(spark, fetch_fn, compact_every=3)
    union_depths = []
    for wave in range(7):
        # each wave: 2 fresh keys + 1 overlap with the previous wave
        keys = [(f"k{wave}-0",), (f"k{wave}-1",)]
        if wave:
            keys.append((f"k{wave-1}-0",))
        out = fetcher.fetch(spark.createDataFrame(keys, "cache_key string"))
        assert out.count() == len(keys)
        plan = fetcher.cache._jdf.queryExecution().optimizedPlan().toString()
        union_depths.append(plan.count("Union"))
    # union depth is periodic (resets to a flat parquet scan at every
    # compaction), never monotone-growing with wave count
    assert union_depths[2] == 0 and union_depths[5] == 0, union_depths
    assert union_depths[3] == union_depths[0] and union_depths[4] == union_depths[1], (
        "post-compaction cycle must repeat the first cycle's plan shape: %s" % union_depths
    )
    # overlapping keys were hits (1 per wave after the first)
    assert [s.hits for s in fetcher.stats] == [0] + [1] * 6
    assert [s.misses for s in fetcher.stats] == [2] * 7
    # post-compaction cache still serves correct responses
    final = fetcher.fetch(spark.createDataFrame([("k0-1",), ("zz",)], "cache_key string"))
    got = {r.cache_key: r.response for r in final.collect()}
    assert got == {"k0-1": "resp:k0-1", "zz": "resp:zz"}
    assert fetcher._cache_size == 15


def test_politeness_pacing(spark, edges_df, images_df, source):
    """qps pacing must serialize same-host fetches: ≥ (n−1)/qps seconds."""
    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine

    hot = images_df.where(F.col("image_id").startswith("img://host-0/")).limit(6)
    n = hot.count()
    frontier = hot.select(
        "node", F.lit(1).alias("depth"), F.lit(0).cast("long").alias("seq"),
        F.lit(1).alias("wave"),
    )
    engine = BfsWaveEngine(spark, edges_df, images=images_df, qps=25.0, hot_host_salt=1)
    t0 = time.monotonic()
    rows = engine.fetch(frontier).collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == n
    assert elapsed >= (n - 1) / 25.0, f"pacing violated: {elapsed:.3f}s for {n} fetches"


def test_proxy_funnel_pacing(spark, images_df):
    """S17: with a proxy, fetches of DIFFERENT hosts share one token
    bucket (the Tor middleware's single-bottleneck semantics) — total
    wall ≥ (n−1)/qps even though per-host pacing alone would not pace
    distinct hosts against each other."""
    from blockchainspider_spark.functions.payload import (
        FETCH_RESULT_SCHEMA,
        make_fetch_kernel,
    )

    multi = images_df.limit(6).select(
        "node", "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        F.lit(1).alias("depth"), F.lit(0).cast("long").alias("seq"),
        F.lit(1).alias("wave"), F.lit("mix").alias("host_bucket"),
    ).coalesce(1)
    n = multi.count()
    assert multi.select(F.regexp_extract("image_id", r"img://([^/]+)/", 1)).distinct().count() > 1

    t0 = time.monotonic()
    rows = multi.mapInPandas(
        make_fetch_kernel(qps=25.0, proxy="socks5://tor:9050"), FETCH_RESULT_SCHEMA
    ).collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == n
    assert elapsed >= (n - 1) / 25.0, f"proxy funnel not paced: {elapsed:.3f}s"


def test_robots_gate(spark, edges_df, source, edges_pdf):
    """Disallowed nodes never enter the frontier when the gate is on."""
    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
    from blockchainspider_spark.oracle.crawl import run_crawl

    plain = run_crawl(edges_pdf, source, "BFS", {"depth": 2})
    blocked_node = sorted(plain.seen - {source})[0]
    robots = spark.createDataFrame([(blocked_node,)], "node string")
    engine = BfsWaveEngine(spark, edges_df, max_depth=2, robots_disallow=robots)
    state, _, _ = engine.run(source, collect_transfers=False)
    got_nodes = {n for _, n, _ in state.pop_log}
    assert blocked_node not in got_nodes
    assert source in got_nodes


def test_politeness_budget_does_not_change_order(spark, edges_df, images_df, source):
    """North rule: crawl order + seen set match under the same politeness
    budget — pacing throttles wall-clock only, never scheduling."""
    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine

    fast, _, _ = BfsWaveEngine(spark, edges_df, images=images_df, max_depth=1).run(source)
    slow, _, _ = BfsWaveEngine(
        spark, edges_df, images=images_df, max_depth=1, qps=50.0
    ).run(source)
    assert fast.pop_log == slow.pop_log
    assert {r.node for r in fast.seen.collect()} == {r.node for r in slow.seen.collect()}


def test_hot_host_salting_splits_partitions(spark, edges_df, images_df):
    """Skew mitigation: the hot host's fetches spread over >1 salt bucket."""
    from pyspark.sql import functions as F

    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine

    engine = BfsWaveEngine(spark, edges_df, images=images_df, hot_host_salt=4)
    frontier = images_df.where(F.col("image_id").startswith("img://host-0/")).select(
        "node", F.lit(1).alias("depth"), F.lit(0).cast("long").alias("seq"),
        F.lit(1).alias("wave"),
    )
    payload = frontier.join(engine.images, on="node", how="inner")
    host = F.regexp_extract("image_id", r"img://([^/]+)/", 1)
    salt = F.when(
        host == "host-0", F.pmod(F.xxhash64("image_id"), F.lit(engine.hot_host_salt))
    ).otherwise(F.lit(0))
    buckets = payload.withColumn(
        "host_bucket", F.concat_ws("#", host, salt.cast("string"))
    ).select("host_bucket").distinct().count()
    assert buckets >= 2, "hot host must salt across multiple buckets"


def test_crawl_delay_overrides_global_qps(spark, images_df):
    """robots Crawl-delay feeds the politeness bucket: a host with a
    declared delay is paced at max(1/qps, delay) — slower than the
    global budget — while undeclared hosts keep the qps interval."""
    from blockchainspider_spark.functions.payload import (
        FETCH_RESULT_SCHEMA,
        make_fetch_kernel,
    )

    hot = images_df.where(F.col("image_id").startswith("img://host-0/")).limit(5).select(
        "node", "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        F.lit(1).alias("depth"), F.lit(0).cast("long").alias("seq"),
        F.lit(1).alias("wave"), F.lit("b0").alias("host_bucket"),
    ).coalesce(1)
    n = hot.count()
    kernel = make_fetch_kernel(qps=1000.0, host_delays={"host-0": 0.05})
    t0 = time.monotonic()
    rows = hot.mapInPandas(kernel, FETCH_RESULT_SCHEMA).collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == n
    assert elapsed >= (n - 1) * 0.05, f"crawl-delay ignored: {elapsed:.3f}s"


def _versioned_server(current_version):
    """Deterministic fake origin: body = 'v{ver}-{key}', strong ETag =
    md5(body)[:8]. Honors If-None-Match with 304 (null body/validators).
    current_version(key) -> int decides per-key content."""
    import hashlib

    import pandas as pd

    from blockchainspider_spark.engine.fetch_cache import REVAL_FETCH_SCHEMA

    def fetch_fn(reqs):
        def kernel(batches):
            for pdf in batches:
                out = {"cache_key": [], "status": [], "etag": [],
                       "last_modified": [], "response": []}
                for r in pdf.itertuples(index=False):
                    ver = current_version(r.cache_key)
                    body = f"v{ver}-{r.cache_key}"
                    etag = hashlib.md5(body.encode()).hexdigest()[:8]
                    out["cache_key"].append(r.cache_key)
                    if r.if_none_match == etag:
                        out["status"].append(304)
                        out["etag"].append(None)
                        out["last_modified"].append(None)
                        out["response"].append(None)
                    else:
                        out["status"].append(200)
                        out["etag"].append(etag)
                        out["last_modified"].append(ver * 1000)
                        out["response"].append(body)
                yield pd.DataFrame(out)

        return reqs.mapInPandas(kernel, REVAL_FETCH_SCHEMA)

    return fetch_fn


def test_revalidating_fetcher_304_reuse_and_200_replace(spark):
    """Recrawl loop: wave 1 all misses; wave 2 (content unchanged) all
    304-revalidated serving the CACHED body; wave 3 (every 3rd key
    changed) mixes 'changed' (new body) and 'revalidated'. Stats and
    bodies pinned exactly."""
    from blockchainspider_spark.engine.fetch_cache import RevalidatingFetcher

    version = {"now": 1}

    def cur(key):
        if version["now"] >= 2 and int(key.rsplit("-", 1)[1]) % 3 == 0:
            return 2
        return 1

    f = RevalidatingFetcher(spark, _versioned_server(cur), compact_every=2)
    reqs = spark.createDataFrame(
        [(f"k-{i}",) for i in range(30)], "cache_key string")

    r1 = {r.cache_key: r for r in f.fetch(reqs).collect()}
    assert all(r.revalidation == "miss" for r in r1.values())
    assert all(r1[f"k-{i}"].response == f"v1-k-{i}" for i in range(30))
    s = f.stats[-1]
    assert (s.misses, s.revalidated, s.changed) == (30, 0, 0)

    r2 = {r.cache_key: r for r in f.fetch(reqs).collect()}
    assert all(r.revalidation == "revalidated" for r in r2.values())
    assert all(r2[f"k-{i}"].response == f"v1-k-{i}" for i in range(30))
    assert f.stats[-1].revalidated == 30 and f.stats[-1].revalidation_rate == 1.0

    version["now"] = 2
    r3 = {r.cache_key: r for r in f.fetch(reqs).collect()}
    for i in range(30):
        row = r3[f"k-{i}"]
        if i % 3 == 0:
            assert row.revalidation == "changed"
            assert row.response == f"v2-k-{i}"
        else:
            assert row.revalidation == "revalidated"
            assert row.response == f"v1-k-{i}"
    s3 = f.stats[-1]
    assert (s3.misses, s3.revalidated, s3.changed) == (0, 20, 10)

    # wave 4: the replaced entries now revalidate against v2
    r4 = {r.cache_key: r for r in f.fetch(reqs).collect()}
    assert all(r.revalidation == "revalidated" for r in r4.values())
    assert r4["k-3"].response == "v2-k-3"
    # compaction ran (compact_every=2, 4 waves) and kept the cache exact
    assert f._compact_id >= 1
    cached = {r.cache_key: r.response for r in f.cache.collect()}
    assert len(cached) == 30 and cached["k-0"] == "v2-k-0"


def test_revalidating_fetcher_partial_and_new_keys(spark):
    """A later wave with a disjoint+overlapping key set: old untouched
    entries survive the upsert; new keys miss."""
    from blockchainspider_spark.engine.fetch_cache import RevalidatingFetcher

    f = RevalidatingFetcher(spark, _versioned_server(lambda k: 1))
    w1 = spark.createDataFrame([(f"k-{i}",) for i in range(6)], "cache_key string")
    f.fetch(w1).count()
    w2 = spark.createDataFrame([(f"k-{i}",) for i in range(4, 9)], "cache_key string")
    got = {r.cache_key: r.revalidation for r in f.fetch(w2).collect()}
    assert got == {f"k-{i}": ("revalidated" if i < 6 else "miss")
                   for i in range(4, 9)}
    assert f.cache.count() == 9  # 6 old ∪ 3 new, upsert kept untouched rows
