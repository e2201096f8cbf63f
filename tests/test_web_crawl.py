"""Web label-crawl engine vs the sequential web oracle."""

import pytest

from blockchainspider_spark.engine.web_crawl import WebCrawlEngine
from blockchainspider_spark.fixtures.generators import make_web_pages
from blockchainspider_spark.oracle.web import run_web_crawl


@pytest.fixture(scope="module")
def pages_pdf():
    return make_web_pages(n_pages=40, seed=42)


@pytest.fixture(scope="module")
def web_source(pages_pdf):
    return pages_pdf["url"].iloc[0]


@pytest.fixture(scope="module")
def oracle_res(pages_pdf, web_source):
    return run_web_crawl(pages_pdf, web_source, max_depth=3)


@pytest.fixture(scope="module")
def engine_res(spark, pages_pdf, web_source):
    pages_df = spark.createDataFrame(pages_pdf)
    return WebCrawlEngine(spark, pages_df, max_depth=3).run(web_source)


def test_fetch_order_exact(engine_res, oracle_res):
    assert engine_res.fetch_log == oracle_res.fetch_log


def test_seen_fingerprints_exact(spark, engine_res, oracle_res):
    got = {r.fingerprint for r in engine_res.seen.collect()}
    assert got == oracle_res.seen_fps


def test_label_reports_match(engine_res, oracle_res):
    got = sorted(
        (r.url, r.net, r.value, tuple(r.keywords), r.summary)
        for r in engine_res.reports.collect()
    )
    want = sorted(
        (r["url"], r["net"], r["value"], tuple(r["keywords"]), r["summary"])
        for r in oracle_res.reports
    )
    assert got == want
    assert len(got) > 0


def test_canonicalization_dedups_messy_urls(spark):
    """Two raw URLs differing only in param order / fragment / host case
    must collapse to one fetch."""
    import pandas as pd

    pages = pd.DataFrame({
        "url": ["http://A.example.com/p?a=1&b=2"],
        "html": ['<a href="http://a.EXAMPLE.com/p?b=2&a=1#frag">self</a>'
                 '<a href="http://a.example.com/q">next</a>'],
    })
    pages = pd.concat([pages, pd.DataFrame({"url": ["http://a.example.com/q"], "html": ["<p>leaf</p>"]})])
    res = WebCrawlEngine(spark, spark.createDataFrame(pages), max_depth=2).run(
        "http://A.example.com/p?a=1&b=2"
    )
    urls = [u for _, u, _ in res.fetch_log]
    assert urls == ["http://A.example.com/p?a=1&b=2", "http://a.example.com/q"]
