"""Wave-batched web BFS crawl (labels.* family) on Spark.

Level-synchronized BFS over a pages table, with the reference's
URL-seen semantics: dedup at schedule time on the canonical request
fingerprint (sha1 of method + canonicalized URL + body ≅ Scrapy
fingerprint 2.7, settings.py:95). The sequential fetch order is
reconstructed exactly from ``(parent_seq, link_pos)`` first-enqueue
keys, as in engine/batch_bfs.

Stages per wave: fetch (left join pages — missing pages are 404s that
still close the barrier, T11) → parse kernel (Arrow-batched link +
entity extraction, shared pure-Python cores with the oracle) →
fingerprint → seen anti-join → ordered next frontier. Label reports
(one row per extracted entity) accumulate as a DataFrame sink.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchainspider_spark.engine.distseq import assign_global_seq

from blockchainspider_spark.functions.fingerprint import canonicalize_url
from blockchainspider_spark.functions.textual import (
    extract_entities,
    extract_links,
    keywords,
    strip_html,
    summary,
)

LINKS_SCHEMA = "parent_url string, parent_seq long, depth int, pos int, link string"
REPORTS_SCHEMA = (
    "url string, net string, value string, keywords array<string>, summary string"
)


def _parse_links(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("parent_url", "parent_seq", "depth", "pos", "link")}
        for r in pdf.itertuples(index=False):
            if r.html is None:
                continue
            for pos, link in enumerate(extract_links(r.url, r.html)):
                rows["parent_url"].append(r.url)
                rows["parent_seq"].append(r.seq)
                rows["depth"].append(r.depth)
                rows["pos"].append(pos)
                rows["link"].append(link)
        yield pd.DataFrame(rows)


def _parse_reports(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("url", "net", "value", "keywords", "summary")}
        for r in pdf.itertuples(index=False):
            if r.html is None:
                continue
            text = strip_html(r.html)
            kws, summ = keywords(text), summary(text)
            for net, value in extract_entities(text):
                rows["url"].append(r.url)
                rows["net"].append(net)
                rows["value"].append(value)
                rows["keywords"].append(kws)
                rows["summary"].append(summ)
        yield pd.DataFrame(rows)


def request_fp(url_col):
    return F.sha1(F.concat_ws("\x00", F.lit("GET"), canonicalize_url(url_col), F.lit("")))


@dataclass
class WebCrawlState:
    wave: int
    frontier: DataFrame            # (url, depth, seq)
    seen: DataFrame                # (fingerprint)
    frontier_size: int
    next_seq: int
    fetch_log_df: DataFrame        # (url, depth, seq, wave, fingerprint), parquet-backed
    reports: DataFrame | None = None

    @property
    def fetch_log(self) -> list[tuple[int, str, int]]:
        """Ordered fetch log as (seq, url, depth). Collects on access —
        a test/driver convenience, never engine-internal."""
        return [
            (r.seq, r.url, r.depth)
            for r in self.fetch_log_df.select("seq", "url", "depth").orderBy("seq").collect()
        ]


class WebCrawlEngine:
    def __init__(self, spark: SparkSession, pages: DataFrame, max_depth: int = 3,
                 work_dir: str | None = None, robots_rules: DataFrame | None = None,
                 trap_filter: bool = False, strip_sessions: bool = False):
        self.spark = spark
        self.pages = pages.select("url", "html")
        self.max_depth = max_depth
        self._work_dir = work_dir or tempfile.mkdtemp(prefix="webcrawl-")
        self.driver_rows_collected = 0
        # optional robots gate (T10): (host, path_prefix) disallow rules
        # applied to candidate links before scheduling; default OFF to
        # match the reference's ROBOTSTXT_OBEY=False ordering
        self.robots_rules = robots_rules
        # optional frontier hygiene (functions/urltraps, round-6
        # continuation), both default OFF to preserve the reference's
        # scheduling contract: trap_filter drops pathological/deep/
        # calendar URLs before scheduling; strip_sessions rewrites
        # links to their session-token-free form BEFORE fingerprinting,
        # so ?phpsessid= variants dedup to one fetch (all pure JVM
        # column algebra — no Python stage joins the schedule path)
        self.trap_filter = trap_filter
        self.strip_sessions = strip_sessions

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self._work_dir, "fetch_log", f"wave={wave:05d}")

    def start(self, source: str) -> WebCrawlState:
        seed = self.spark.createDataFrame(
            [(source, 0, 0, 0)], "url string, depth int, seq long, wave int"
        ).withColumn("fingerprint", request_fp(F.col("url")))
        seed.write.mode("overwrite").parquet(self._wave_dir(0))
        pops = self.spark.read.parquet(self._wave_dir(0))
        return WebCrawlState(
            wave=0,
            frontier=pops.select("url", "depth", "seq"),
            seen=pops.select("fingerprint"),
            frontier_size=1,
            next_seq=1,
            fetch_log_df=pops,
        )

    def run_wave(self, state: WebCrawlState) -> WebCrawlState:
        wave = state.wave + 1
        fetched = state.frontier.join(self.pages, on="url", how="left")

        reports = fetched.mapInPandas(_parse_reports, REPORTS_SCHEMA)
        all_reports = (
            reports if state.reports is None else state.reports.unionByName(reports)
        )

        if state.frontier.select(F.min("depth")).first()[0] + 1 > self.max_depth:
            return WebCrawlState(
                wave=wave,
                frontier=self.spark.createDataFrame([], "url string, depth int, seq long"),
                seen=state.seen,
                frontier_size=0,
                next_seq=state.next_seq,
                fetch_log_df=state.fetch_log_df,
                reports=all_reports,
            )

        links = fetched.mapInPandas(_parse_links, LINKS_SCHEMA)
        if self.robots_rules is not None:
            from blockchainspider_spark.functions.robots import apply_robots_gate

            links = apply_robots_gate(links, self.robots_rules, url_col="link")
        link_cols = links.columns
        if self.trap_filter:
            from blockchainspider_spark.functions.urltraps import url_trap_features

            links = (url_trap_features(links, url_col="link")
                     .where(~F.col("is_trap")).select(*link_cols))
        if self.strip_sessions:
            from blockchainspider_spark.functions.urltraps import strip_session_ids

            links = links.withColumn("link", strip_session_ids(F.col("link")))
        candidates = links.withColumn("fingerprint", request_fp(F.col("link")))
        fresh = candidates.join(state.seen, on="fingerprint", how="left_anti")
        first = fresh.groupBy("fingerprint").agg(
            F.min(F.struct("parent_seq", "pos", F.col("link").alias("url"),
                           (F.col("depth") + 1).alias("d"))).alias("k")
        )
        # distributed seq: range sort + per-partition row_number (see
        # engine/distseq) — no global window, no frontier rows on the driver
        keyed = first.select(
            F.col("k.parent_seq").alias("_k_pseq"), F.col("k.pos").alias("_k_pos"),
            F.col("k.url").alias("url"), F.col("k.d").cast("int").alias("depth"),
            "fingerprint",
        )
        assignment = assign_global_seq(keyed, ["_k_pseq", "_k_pos"],
                                       base_seq=state.next_seq - 1)
        self.driver_rows_collected += assignment.driver_rows
        assignment.df.select(
            "url", "depth", "seq", F.lit(wave).alias("wave"), "fingerprint"
        ).write.mode("overwrite").parquet(self._wave_dir(wave))
        assignment.cleanup()
        pops = self.spark.read.parquet(self._wave_dir(wave))
        return WebCrawlState(
            wave=wave,
            frontier=pops.select("url", "depth", "seq"),
            seen=state.seen.unionByName(pops.select("fingerprint")),
            frontier_size=assignment.total,
            next_seq=state.next_seq + assignment.total,
            fetch_log_df=state.fetch_log_df.unionByName(pops),
            reports=all_reports,
        )

    def run(self, source: str) -> WebCrawlState:
        state = self.start(source)
        while state.frontier_size > 0:
            state = self.run_wave(state)
        return state
