"""Sequential golden oracle for the label web crawl (labels.web).

Reference semantics (spiders/labels/web.py + settings.py:95): strict BFS
(DEPTH_PRIORITY=1 + FIFO queues), URL-seen dedup on the canonical
request fingerprint, link discovery in document order, one LabelReport
row per extracted entity. Deterministic refinement per SURVEY §3.3:
pages complete in enqueue order (single-threaded reference semantics).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import pandas as pd

from blockchainspider_spark.functions.fingerprint import canonicalize_one
from blockchainspider_spark.functions.textual import (
    extract_entities,
    extract_links,
    keywords,
    strip_html,
    summary,
)


def url_fingerprint(url: str, method: str = "GET", body: str = "") -> str:
    import hashlib

    return hashlib.sha1(
        "\x00".join([method, canonicalize_one(url), body]).encode()
    ).hexdigest()


@dataclass
class WebCrawlResult:
    fetch_log: list = field(default_factory=list)     # (step, url, depth)
    seen_fps: set = field(default_factory=set)
    reports: list = field(default_factory=list)       # dict rows


def run_web_crawl(pages: pd.DataFrame, source: str, max_depth: int = 3) -> WebCrawlResult:
    by_url = {r.url: r.html for r in pages.itertuples(index=False)}
    res = WebCrawlResult()
    fifo: deque = deque()
    fifo.append((source, 0))
    res.seen_fps.add(url_fingerprint(source))
    step = 0
    while fifo:
        url, depth = fifo.popleft()
        html = by_url.get(url)
        res.fetch_log.append((step, url, depth))
        step += 1
        if html is None:  # 404: barrier releases with no items (T11)
            continue
        text = strip_html(html)
        kws = keywords(text)
        summ = summary(text)
        for net, value in extract_entities(text):
            res.reports.append({
                "url": url, "net": net, "value": value,
                "keywords": kws, "summary": summ,
            })
        if depth + 1 > max_depth:
            continue
        for link in extract_links(url, html):
            fp = url_fingerprint(link)
            if fp in res.seen_fps:
                continue
            res.seen_fps.add(fp)
            fifo.append((link, depth + 1))
    return res
