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
"""

from __future__ import annotations

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
    cache must never be forced through a driver/executor broadcast."""

    def __init__(self, spark, fetch_fn: Callable[[DataFrame], DataFrame],
                 broadcast_threshold: int = 1_000_000):
        self.spark = spark
        self.fetch_fn = fetch_fn  # df(cache_key,...) -> df(cache_key, response)
        self.cache = spark.createDataFrame([], "cache_key string, response string")
        self.stats: list[CacheStats] = []
        self.broadcast_threshold = broadcast_threshold
        self._cache_size = 0

    def fetch(self, requests: DataFrame) -> DataFrame:
        """requests must carry a ``cache_key`` column; returns
        (cache_key, response) for every request."""
        cache = (
            F.broadcast(self.cache)
            if self._cache_size <= self.broadcast_threshold
            else self.cache
        )
        joined = requests.join(cache, on="cache_key", how="left")
        hits = joined.where(F.col("response").isNotNull()).select("cache_key", "response")
        misses = joined.where(F.col("response").isNull()).drop("response")
        n_hits, n_miss = hits.count(), misses.count()
        fetched = self.fetch_fn(misses) if n_miss else None
        self.stats.append(CacheStats(hits=n_hits, misses=n_miss))
        if fetched is not None:
            self.cache = (
                self.cache.unionByName(fetched.select("cache_key", "response"))
                .dropDuplicates(["cache_key"])
            )
            self._cache_size = self.cache.persist().count()
            return hits.unionByName(fetched.select("cache_key", "response"))
        return hits


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
