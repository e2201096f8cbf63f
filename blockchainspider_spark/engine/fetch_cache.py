"""Fetch-side response cache + retry waves (T4/T5/T7).

* ``CachedFetcher`` — reference APIMemoryCache semantics
  (middlewares/txs/blockscan/cache.py): responses keyed by the canonical
  request key (URL minus credentials); a pre-fetch left join splits hits
  from misses, only misses run the fetch kernel, and new responses append
  to the cache table. Hit-rate is emitted as lineage (A14).
* ``fetch_with_retries`` — reference retry counters (external.py:82-109,
  retry.py:9-35): failed rows re-enter the next retry wave with
  ``retry_cnt``+1 until ``max_retry``; terminal failures surface with
  status='failed' instead of blocking the barrier (T11).
* ``RevalidatingFetcher`` (round 6 continuation) — HTTP conditional
  revalidation for RECRAWL loops (RFC 9110 §13.1.1-13.1.3: ETag /
  If-None-Match, Last-Modified / If-Modified-Since, 304 Not Modified).
  The reference's APIMemoryCache never revisits a key; a web crawler
  refreshing a corpus re-fetches every URL, and validators turn most
  of those into header-only 304s. Cache entries carry validators; a
  re-fetch ships them to the fetch kernel; 304 serves the cached body,
  200 replaces the entry. This is this repo's addition for the crawl
  axis (no reference twin).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CacheStats:
    hits: int
    misses: int

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


class CachedFetcher:
    """cache table: (cache_key string, response string).

    ``broadcast_threshold``: the cache is broadcast into the pre-fetch
    join only while it stays small; past the threshold it joins
    shuffle-side (hash-partitioned on cache_key) — an unbounded response
    cache must never be forced through a driver/executor broadcast.

    Maintenance is incremental: per wave the cache only APPENDS the
    within-wave-deduped miss responses (misses are definitionally absent
    from the cache — the pre-fetch left join is the anti-join), so
    per-wave maintenance work is O(delta), never O(|cache|). The union
    chain of delta appends is compacted to a scratch parquet every
    ``compact_every`` appends, keeping plan depth bounded on long-running
    crawls; hit/miss counts come from one aggregation over the persisted
    join (a single job, not two counts)."""

    def __init__(self, spark, fetch_fn: Callable[[DataFrame], DataFrame],
                 broadcast_threshold: int = 1_000_000, compact_every: int = 8):
        self.spark = spark
        self.fetch_fn = fetch_fn  # df(cache_key,...) -> df(cache_key, response)
        self.cache = spark.createDataFrame([], "cache_key string, response string")
        self.stats: list[CacheStats] = []
        self.broadcast_threshold = broadcast_threshold
        self.compact_every = compact_every
        self._cache_size = 0
        self._appends = 0
        self._deltas: list[DataFrame] = []   # persisted per-wave appends
        self._prev_joined: DataFrame | None = None
        self._work_dir: str | None = None
        self._compact_id = 0

    def _compact(self) -> None:
        """Rewrite the delta-union chain as one scratch parquet table,
        hash-partitioned on the probe key; O(|cache|) but amortized over
        ``compact_every`` waves, and the only non-delta-sized step."""
        if self._work_dir is None:
            self._work_dir = tempfile.mkdtemp(prefix="fetchcache-")
        self._compact_id += 1
        out = os.path.join(self._work_dir, f"compact_{self._compact_id:05d}")
        self.cache.repartition("cache_key").write.mode("overwrite").parquet(out)
        for d in self._deltas:
            d.unpersist()
        self._deltas = []
        self._appends = 0
        self.cache = self.spark.read.parquet(out)

    def fetch(self, requests: DataFrame) -> DataFrame:
        """requests must carry a ``cache_key`` column; returns
        (cache_key, response) for every request."""
        cache = (
            F.broadcast(self.cache)
            if self._cache_size <= self.broadcast_threshold
            else self.cache
        )
        if self._prev_joined is not None:
            self._prev_joined.unpersist()
        joined = requests.join(cache, on="cache_key", how="left").persist()
        self._prev_joined = joined
        agg = joined.agg(
            F.count("response").alias("hits"),
            F.count(F.when(F.col("response").isNull(), F.lit(1))).alias("misses"),
        ).collect()[0]
        n_hits, n_miss = int(agg["hits"]), int(agg["misses"])
        self.stats.append(CacheStats(hits=n_hits, misses=n_miss))
        hits = joined.where(F.col("response").isNotNull()).select("cache_key", "response")
        if not n_miss:
            return hits
        misses = joined.where(F.col("response").isNull()).drop("response")
        fetched = self.fetch_fn(misses)
        # append-only delta: dedup within the wave (same key may miss
        # twice in one request batch), then union — the left join above
        # already guarantees the keys are new, so no O(|cache|) rewrite
        delta = fetched.select("cache_key", "response").dropDuplicates(["cache_key"]).persist()
        self._cache_size += delta.count()
        self._deltas.append(delta)
        self.cache = self.cache.unionByName(delta)
        self._appends += 1
        if self._appends >= self.compact_every:
            self._compact()
        # serve misses from the persisted delta (one response per miss
        # row, duplicates included) so the fetch kernel runs exactly once
        served = misses.select("cache_key").join(delta, on="cache_key", how="inner")
        return hits.unionByName(served)


@dataclass
class RevalStats:
    misses: int
    revalidated: int
    changed: int

    @property
    def revalidation_rate(self) -> float:
        total = self.misses + self.revalidated + self.changed
        return self.revalidated / total if total else 0.0


REVAL_CACHE_SCHEMA = "cache_key string, etag string, last_modified long, response string"
REVAL_FETCH_SCHEMA = ("cache_key string, status int, etag string, "
                      "last_modified long, response string")


class RevalidatingFetcher:
    """Conditional-revalidation cache for recrawl waves.

    cache table: ``(cache_key, etag, last_modified, response)``,
    hash-partitioned on cache_key.

    ``fetch_fn`` receives ``(cache_key, if_none_match, if_modified_since)``
    (validators null for uncached keys) and must return
    ``REVAL_FETCH_SCHEMA`` rows: status 304 ⇒ body/validators may be
    null (the cached entry is reused verbatim — we deliberately do NOT
    merge refreshed validators from a 304, keeping entries
    deterministic); status 200 ⇒ new body + validators replace the
    entry. Every requested key gets a ``revalidation`` class in the
    result: 'miss' (not cached), 'revalidated' (304), 'changed' (200
    over an existing entry).

    Scale shape: unlike ``CachedFetcher``'s append-only delta, a
    recrawl MUTATES entries, so the cache update is an anti-join +
    union keyed on cache_key — one shuffle per wave over the touched
    partition ranges. The union/anti-join plan chain is compacted to a
    scratch parquet every ``compact_every`` waves exactly like
    CachedFetcher, so plan depth stays bounded on long recrawl loops."""

    def __init__(self, spark, fetch_fn: Callable[[DataFrame], DataFrame],
                 broadcast_threshold: int = 1_000_000, compact_every: int = 8):
        self.spark = spark
        self.fetch_fn = fetch_fn
        self.cache = spark.createDataFrame([], REVAL_CACHE_SCHEMA)
        self.stats: list[RevalStats] = []
        self.broadcast_threshold = broadcast_threshold
        self.compact_every = compact_every
        self._cache_size = 0
        self._waves = 0
        self._pinned: list[DataFrame] = []
        self._work_dir: str | None = None
        self._compact_id = 0

    def _compact(self) -> None:
        if self._work_dir is None:
            self._work_dir = tempfile.mkdtemp(prefix="revalcache-")
        self._compact_id += 1
        out = os.path.join(self._work_dir, f"compact_{self._compact_id:05d}")
        self.cache.repartition("cache_key").write.mode("overwrite").parquet(out)
        for d in self._pinned:
            d.unpersist()
        self._pinned = []
        self._waves = 0
        self.cache = self.spark.read.parquet(out)

    def fetch(self, requests: DataFrame) -> DataFrame:
        """requests must carry ``cache_key``; returns one row per request
        with ``response`` and ``revalidation`` ∈ {miss, revalidated,
        changed} appended."""
        keys = requests.select("cache_key").dropDuplicates(["cache_key"])
        cache = (F.broadcast(self.cache)
                 if self._cache_size <= self.broadcast_threshold else self.cache)
        probe = keys.join(cache, on="cache_key", how="left")
        fetched = self.fetch_fn(probe.select(
            "cache_key",
            F.col("etag").alias("if_none_match"),
            F.col("last_modified").alias("if_modified_since"),
        ))
        merged = (
            probe.select(
                "cache_key",
                F.col("etag").alias("_old_etag"),
                F.col("last_modified").alias("_old_lm"),
                F.col("response").alias("_cached"),
            )
            .join(fetched, on="cache_key", how="inner")
        )
        reval = F.col("status") == 304
        entries = merged.select(
            "cache_key",
            F.when(reval, F.col("_old_etag")).otherwise(F.col("etag")).alias("etag"),
            F.when(reval, F.col("_old_lm")).otherwise(F.col("last_modified"))
             .alias("last_modified"),
            F.when(reval, F.col("_cached")).otherwise(F.col("response"))
             .alias("response"),
            F.when(reval, F.lit("revalidated"))
             .when(F.col("_cached").isNull(), F.lit("miss"))
             .otherwise(F.lit("changed")).alias("revalidation"),
        ).persist()
        self._pinned.append(entries)
        agg = entries.groupBy("revalidation").count().collect()
        counts = {r["revalidation"]: int(r["count"]) for r in agg}
        self.stats.append(RevalStats(
            misses=counts.get("miss", 0),
            revalidated=counts.get("revalidated", 0),
            changed=counts.get("changed", 0),
        ))
        self._cache_size = (self._cache_size
                            + counts.get("miss", 0))
        self.cache = (
            self.cache.join(keys, on="cache_key", how="left_anti")
            .unionByName(entries.select("cache_key", "etag",
                                        "last_modified", "response"))
        )
        self._waves += 1
        if self._waves >= self.compact_every:
            self._compact()
        return requests.join(
            entries.select("cache_key", "response", "revalidation"),
            on="cache_key", how="inner",
        )


def fetch_with_retries(
    requests: DataFrame,
    attempt_fn: Callable[[DataFrame, int], DataFrame],
    max_retry: int = 2,
) -> DataFrame:
    """Drive retry waves: ``attempt_fn(batch, attempt)`` must return the
    batch plus a boolean ``ok`` column. Rows re-enter until ok or the
    retry budget is spent; returns all rows with status ∈ {ok, failed}
    and the attempt count that settled them."""
    pending = requests
    settled: DataFrame | None = None
    for attempt in range(max_retry + 1):
        if pending.limit(1).count() == 0:
            break
        result = attempt_fn(pending, attempt)
        done = result.where(F.col("ok")).withColumn("attempts", F.lit(attempt + 1))
        settled = done if settled is None else settled.unionByName(done)
        pending = result.where(~F.col("ok")).drop("ok")
    failed = pending.withColumn("ok", F.lit(False)).withColumn(
        "attempts", F.lit(max_retry + 1)
    )
    out = failed if settled is None else settled.unionByName(failed)
    return out.withColumn("status", F.when(F.col("ok"), "ok").otherwise("failed"))
