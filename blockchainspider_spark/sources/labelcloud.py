"""S20: explorer label-cloud scan (the reference's Selenium spider,
Spark-first).

Reference: BlockchainSpider/spiders/labels/labelcloud.py + the
Selenium middleware (middlewares/selenium.py). The reference drives a
real Chrome through login + JS rendering; everything AFTER the rendered
HTML arrives is plain parsing + pagination + table extraction:

1. labelcloud page → dropdown anchors → (href, category, size)
2. per-label navigation page → tab pagination (``subcatid``) or plain
   ``size/start`` windows → page-URL fan-out
3. per-page label table → header row + body rows → LabelReportItem
   (labels, addresses/transactions by category, description = the row
   dict, reporter = site) — labelcloud.py:167-203

Here the BROWSER HOP is the environment-gated piece (``render_page``
raises — no Chrome/Selenium in this container; a real deployment slots
a Selenium/playwright call into one mapInPandas kernel) and ships with
a deterministic in-memory double (``FakeRenderer``). All downstream
stages run as Arrow-batched kernels / DataFrame ops over (url, html)
pages — the tag-strip + regex grammar mirrors the reference's
``re.sub('<.*?>', '', ...)`` extraction, so a user pointing this at
real rendered HTML gets the reference's rows.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from urllib.parse import urlencode, urljoin, urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITE2NET = {
    "etherscan": "eth",
    "bscscan": "bsc",
    "polygonscan": "polygon",
    "hecoinfo": "heco",
}

CLOUD_SCHEMA = "url string, href string, category string, size int"
NAV_SCHEMA = "page_url string, label string, category string"
REPORT_SCHEMA = (
    "label string, net string, address string, transaction_hash string, "
    "category string, description string, reporter string, url string"
)

_TAG = re.compile(r"<.*?>")
_ANCHOR = re.compile(r"<a\b[^>]*>.*?</a>", re.S)
_HREF = re.compile(r'href="([^"]+)"')


def render_page(url: str) -> str:
    """The Selenium hop: load ``url`` in a real browser (login cookies,
    JS execution) and return the rendered page source. No Chrome or
    Selenium exists in this container — a deployment replaces this with
    a webdriver call inside the fetch kernel."""
    raise NotImplementedError(
        "Selenium/Chrome is not available in this environment; "
        "use FakeRenderer (tests) or wire a real webdriver here"
    )


class FakeRenderer:
    """Deterministic render double: url → canned rendered HTML."""

    def __init__(self, pages: dict[str, str]):
        self.pages = dict(pages)

    def __call__(self, url: str) -> str:
        return self.pages[url]


def fetch_rendered(urls: DataFrame, renderer, url_col: str = "url") -> DataFrame:
    """(url) → (url, html) through the render hop, Arrow-batched — ONE
    browser call per row inside the kernel, never on the driver."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf[url_col],
                "html": [renderer(u) for u in pdf[url_col]],
            })

    return urls.select(url_col).mapInPandas(kernel, "url string, html string")


def _match_category(text: str, categories: list[str]) -> str | None:
    low = text.lower()
    for c in categories:
        if low.find(c) >= 0:
            return c
    return None


def parse_label_cloud(pages: DataFrame, categories: list[str],
                      default_size: int = 100) -> DataFrame:
    """Stage 1 (labelcloud.py:76-105): dropdown-menu anchors →
    (href, category, size)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "href": [], "category": [], "size": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                m = re.search(r'<div[^>]*class="[^"]*dropdown-menu[^"]*"[^>]*>(.*?)</div>',
                              html, re.S)
                body = m.group(1) if m else ""
                for a in _ANCHOR.findall(body):
                    text = _TAG.sub("", a)
                    cat = _match_category(text, categories)
                    if not cat:
                        continue
                    href = _HREF.search(a)
                    size = re.search(r"\d+", text)
                    out["url"].append(url)
                    out["href"].append(href.group(1) if href else "")
                    out["category"].append(cat)
                    out["size"].append(int(size.group()) if size else default_size)
            yield pd.DataFrame(out)

    return pages.mapInPandas(kernel, CLOUD_SCHEMA)


def paginate_navigation(pages: DataFrame, page_size: int = 100) -> DataFrame:
    """Stage 2 (labelcloud.py:107-160): per-label navigation page →
    the page-URL fan-out. Two modes, as in the reference: card-header
    tabs (``subcatid`` windows per tab total) or a single
    ``size/start`` window ladder. ``sizes`` carries the stage-1 size
    when no tabs exist."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"page_url": [], "label": [], "category": []}
            for url, html, size, cat in zip(pdf["url"], pdf["html"],
                                            pdf["size"], pdf["category"]):
                label_m = re.search(r"<h1[^>]*>\s*<span[^>]*>(.*?)</span>", html, re.S)
                label = _TAG.sub("", label_m.group(1)).strip() if label_m else ""
                parts = urlsplit(url)
                base_url = urljoin(f"{parts.scheme}://{parts.netloc}", parts.path)
                header = re.search(
                    r'<div[^>]*class="[^"]*card-header[^"]*"[^>]*>(.*?)</div>', html, re.S)
                tabs = []
                if header:
                    for a in _ANCHOR.findall(header.group(1)):
                        total_m = re.search(r"\d+", _TAG.sub("", a))
                        val_m = re.search(r'val="([^"]+)"', a)
                        tabs.append((
                            val_m.group(1) if val_m else "0",
                            int(total_m.group()) if total_m else page_size,
                        ))
                if tabs:
                    for subcatid, total in tabs:
                        start = 0
                        while start < total:
                            q = urlencode({"subcatid": subcatid,
                                           "size": page_size, "start": start})
                            out["page_url"].append(f"{base_url}?{q}")
                            out["label"].append(label)
                            out["category"].append(cat)
                            start += page_size
                else:
                    start, total = 0, int(size)
                    while start < total:
                        q = urlencode({"size": page_size, "start": start})
                        out["page_url"].append(f"{base_url}?{q}")
                        out["label"].append(label)
                        out["category"].append(cat)
                        start += page_size
            yield pd.DataFrame(out)

    return pages.mapInPandas(kernel, NAV_SCHEMA)


def parse_label_rows(pages: DataFrame, category: str, site: str = "etherscan") -> DataFrame:
    """Stage 3 (labelcloud.py:162-203): header row + body rows → label
    report rows. ``accounts``/``tokens`` rows carry the address,
    ``transactions`` rows the tx hash; the full row dict rides along as
    a JSON description."""
    import json

    net = SITE2NET[site]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("label", "net", "address", "transaction_hash",
                                   "category", "description", "reporter", "url")}
            for url, html, label in zip(pdf["url"], pdf["html"], pdf["label"]):
                headers = [re.sub(r"\s*", "", _TAG.sub("", th))
                           for th in re.findall(r"<th\b.*?</th>", html, re.S)]
                body_m = re.search(r"<tbody[^>]*>(.*?)</tbody>", html, re.S)
                if not body_m:
                    continue
                for tr in re.findall(r"<tr\b.*?</tr>", body_m.group(1), re.S):
                    tds = [_TAG.sub("", td).strip()
                           for td in re.findall(r"<td\b.*?</td>", tr, re.S)]
                    info = {"url": url}
                    for i, td in enumerate(tds):
                        if i < len(headers):
                            info[headers[i]] = td
                    addr = tx = None
                    if category in ("accounts", "tokens"):
                        addr = info.get("Address", info.get("ContractAddress"))
                    if category == "transactions":
                        tx = info.get("TxnHash")
                    out["label"].append(label)
                    out["net"].append(net)
                    out["address"].append(addr)
                    out["transaction_hash"].append(tx)
                    out["category"].append(category)
                    out["description"].append(json.dumps(info, sort_keys=True))
                    out["reporter"].append(site)
                    out["url"].append(url)
            yield pd.DataFrame(out)

    return pages.mapInPandas(kernel, REPORT_SCHEMA)


def crawl_labelcloud(spark, renderer, site: str = "etherscan",
                     categories: list[str] = ("accounts",),
                     page_size: int = 100) -> DataFrame:
    """End-to-end S20 pipeline over a renderer (real webdriver at
    deployment, FakeRenderer in tests): cloud → navigation fan-out →
    label tables → report rows. Every stage is a DataFrame; the driver
    only holds URLs-to-visit counts, never page content."""
    root = f"https://{site}.example/labelcloud"
    seed = spark.createDataFrame([(root,)], "url string")
    cloud = parse_label_cloud(fetch_rendered(seed, renderer), list(categories))
    # every fetch_rendered output is persisted before it fans out: each
    # downstream branch (the self-shaped join carrying size/category
    # through, the per-category union loop) would otherwise re-evaluate
    # the render kernel — harmless with FakeRenderer, but a real
    # side-effecting webdriver must hit each URL exactly once
    nav_urls = cloud.select(
        F.expr("concat('https://', parse_url(url, 'HOST'))").alias("_root"),
        "href", "size", "category",
    ).select(
        F.concat("_root", "href").alias("url"), "size", "category",
    ).persist()
    # fetch each label's navigation page, carrying stage-1 size through
    nav_pages = (
        fetch_rendered(nav_urls, renderer).persist()
        .join(nav_urls.select("url", "size", "category"), on="url", how="inner")
    )
    fanout = paginate_navigation(nav_pages, page_size=page_size)
    label_by_page = fanout.select("page_url", "label", "category").persist()
    pages = (
        fetch_rendered(label_by_page.select(F.col("page_url").alias("url")), renderer)
        .persist()
        .join(label_by_page.withColumnRenamed("page_url", "url"), on="url", how="inner")
    )
    out = None
    for cat in categories:
        part = parse_label_rows(pages.where(F.col("category") == cat),
                                category=cat, site=site)
        out = part if out is None else out.unionByName(part)
    return out
