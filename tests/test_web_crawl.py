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


def test_address_checksum_validation():
    """F9: base58check (≅ bitcoin.is_address) and EIP-55 (≅ Web3.isAddress)
    against canonical vectors; planted fixture negatives are rejected."""
    from blockchainspider_spark.fixtures.generators import btc_address
    from blockchainspider_spark.functions.textual import (
        extract_entities,
        is_btc_address,
        is_eth_address,
    )

    assert is_btc_address("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa")  # genesis
    assert is_btc_address("3J98t1WpEZ73CNmQviecrnyiWrnqRhWNLy")  # P2SH
    assert not is_btc_address("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNb")
    assert is_eth_address("0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed")  # EIP-55
    assert not is_eth_address("0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAeD")
    assert is_btc_address(btc_address(7, valid=True))
    assert not is_btc_address(btc_address(7, valid=False))

    good, bad = btc_address(1, True), btc_address(2, False)
    text = f"pay {good} not {bad} nor 0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAeD ok"
    got = extract_entities(text)
    assert ("BTC-Like-address", good) in got
    assert all(v != bad for _, v in got)
    assert all(net != "ETH-Like-address" for net, _ in got)


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
