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

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
    fetch_log: list = field(default_factory=list)
    reports: DataFrame | None = None


class WebCrawlEngine:
    def __init__(self, spark: SparkSession, pages: DataFrame, max_depth: int = 3):
        self.spark = spark
        self.pages = pages.select("url", "html")
        self.max_depth = max_depth

    def start(self, source: str) -> WebCrawlState:
        frontier = self.spark.createDataFrame([(source, 0, 0)], "url string, depth int, seq long")
        seen = frontier.select(request_fp(F.col("url")).alias("fingerprint"))
        state = WebCrawlState(wave=0, frontier=frontier, seen=seen)
        state.fetch_log.append((0, source, 0))
        return state

    def run_wave(self, state: WebCrawlState) -> WebCrawlState:
        fetched = state.frontier.join(self.pages, on="url", how="left")

        reports = fetched.mapInPandas(_parse_reports, REPORTS_SCHEMA)
        all_reports = (
            reports if state.reports is None else state.reports.unionByName(reports)
        )

        if state.frontier.select(F.min("depth")).first()[0] + 1 > self.max_depth:
            return WebCrawlState(
                wave=state.wave + 1,
                frontier=self.spark.createDataFrame([], "url string, depth int, seq long"),
                seen=state.seen,
                fetch_log=state.fetch_log,
                reports=all_reports,
            )

        links = fetched.mapInPandas(_parse_links, LINKS_SCHEMA)
        candidates = links.withColumn("fingerprint", request_fp(F.col("link")))
        fresh = candidates.join(state.seen, on="fingerprint", how="left_anti")
        first = fresh.groupBy("fingerprint").agg(
            F.min(F.struct("parent_seq", "pos", F.col("link").alias("url"),
                           (F.col("depth") + 1).alias("d"))).alias("k")
        )
        w = Window.orderBy(F.col("k.parent_seq"), F.col("k.pos"))
        base_seq = state.fetch_log[-1][0]
        new_frontier = first.withColumn("rn", F.row_number().over(w)).select(
            F.col("k.url").alias("url"),
            F.col("k.d").cast("int").alias("depth"),
            (F.lit(base_seq) + F.col("rn")).alias("seq"),
            "fingerprint",
        )
        rows = new_frontier.select("seq", "url", "depth").orderBy("seq").collect()
        state.fetch_log.extend((r.seq, r.url, r.depth) for r in rows)
        return WebCrawlState(
            wave=state.wave + 1,
            frontier=new_frontier.select("url", "depth", "seq"),
            seen=state.seen.unionByName(new_frontier.select("fingerprint")),
            fetch_log=state.fetch_log,
            reports=all_reports,
        )

    def run(self, source: str) -> WebCrawlState:
        state = self.start(source)
        while state.frontier.limit(1).count() > 0:
            state = self.run_wave(state)
        return state
