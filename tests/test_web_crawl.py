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


def test_web_crawl_robots_gate(spark, pages_pdf, web_source):
    """With a disallow-everything-under-/page rule for every host, the
    crawl never leaves the seed; with no rules it does."""
    from blockchainspider_spark.functions.robots import parse_robots

    hosts = sorted({h.lower() for h in pages_pdf["host"]})
    docs = spark.createDataFrame(
        [(h, "User-agent: *\nDisallow: /page\n") for h in hosts],
        "host string, robots_txt string",
    )
    rules = parse_robots(docs)
    pages_df = spark.createDataFrame(pages_pdf)
    gated = WebCrawlEngine(spark, pages_df, max_depth=2, robots_rules=rules).run(web_source)
    assert gated.next_seq == 1  # only the seed was ever fetched
    open_run = WebCrawlEngine(spark, pages_df, max_depth=2).run(web_source)
    assert open_run.next_seq > 1


def test_robots_parser_agrees_with_stdlib():
    """T10: our Disallow parsing for '*' agrees with urllib.robotparser
    (the independent stdlib oracle) on a policy with comments, multiple
    agents, and a blank Disallow."""
    import urllib.robotparser

    from blockchainspider_spark.functions.robots import parse_robots_text

    txt = (
        "# policy\n"
        "User-agent: bigbot\nDisallow: /\n\n"
        "User-agent: *\n"
        "Disallow: /private  # keep out\n"
        "Disallow: /tmp\n"
        "Disallow:\n"
    )
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    prefixes = parse_robots_text(txt)
    assert prefixes == ["/private", "/tmp"]
    for path, want in [("/private/a", False), ("/tmp/x", False),
                       ("/public", True), ("/", True)]:
        blocked = any(path.startswith(p) for p in prefixes)
        assert (not blocked) == rp.can_fetch("*", f"http://h/{path.lstrip('/')}"), path
        assert (not blocked) == want


def test_robots_parser_ua_grouping_and_percent_decoding():
    """Consecutive User-agent lines form ONE entry whose rules apply to
    all listed agents (robotparser grammar), and rule paths are
    percent-decoded — both pinned against urllib.robotparser."""
    import urllib.robotparser

    from blockchainspider_spark.functions.robots import parse_robots_text

    txt = (
        "User-agent: *\n"
        "User-agent: googlebot\n"
        "Disallow: /x\n"
        "Disallow: /enc%20oded\n"
        "\n"
        "User-agent: otherbot\n"
        "Disallow: /only-other\n"
    )
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    prefixes = parse_robots_text(txt)
    # the '*' group's rules survive the second UA line of the same entry,
    # and the encoded path is normalized to robotparser's canonical
    # quote(unquote(...)) form; otherbot's entry does not apply
    assert prefixes == ["/x", "/enc%20oded"]
    for path, want in [("/x/a", False), ("/enc%20oded/f", False),
                       ("/only-other", True), ("/free", True)]:
        blocked = any(path.startswith(p) for p in prefixes)
        assert (not blocked) == rp.can_fetch("*", f"http://h{path}"), path
        assert (not blocked) == want
    # a UA line AFTER rules starts a fresh entry (state-2 → new entry)
    txt2 = "User-agent: a\nDisallow: /a\nUser-agent: *\nDisallow: /b\n"
    assert parse_robots_text(txt2) == ["/b"]


def test_textrank_keywords_match_independent_pagerank():
    """F11: keyword ranking equals an independently computed (numpy dense
    power iteration) PageRank over the same co-occurrence graph."""
    import numpy as np

    from blockchainspider_spark.functions.textual import keywords

    text = "spark data spark data engine"
    # co-occurrence graph (window 2): w(spark,data)=3, w(data,engine)=1
    vocab = ["spark", "data", "engine"]
    W = np.array([[0, 3, 0], [3, 0, 1], [0, 1, 0]], dtype=float)
    out_w = W.sum(axis=1)
    d, n = 0.85, 3
    score = np.full(n, 1.0 / n)
    for _ in range(50):
        score = (1 - d) / n + d * (W / out_w[None, :]) @ score
    want = [vocab[i] for i in np.argsort(-np.round(score, 12), kind="stable")]
    assert keywords(text, k=3) == want
    assert want[0] == "data"  # hub token wins over the more frequent 'spark'


def test_textrank_summary_prefers_central_sentences():
    from blockchainspider_spark.functions.textual import summary

    text = (
        "Spark engines process data. "
        "Data processing needs spark engines. "
        "Bananas ripen quietly. "
        "Spark data engines process batches. "
        "Engines process spark data quickly."
    )
    out = summary(text, max_chars=80)
    assert len(out) <= 80
    # the isolated off-topic sentence has no similarity edges → lowest
    # PageRank → never chosen over the connected cluster
    assert "Bananas" not in out
    assert "park" in out  # some spark-family sentence chosen


def test_textrank_stopword_and_empty_edges():
    from blockchainspider_spark.functions.textual import keywords

    assert keywords("") == []
    assert keywords("the and of to") == []  # pure stopwords
    assert keywords("solitary") == ["solitary"]  # no edges → first-seen order


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
    # indices whose hash160 begins with a 0x00 byte: base58check encodes
    # the extra leading zero as a second '1' — the generator must emit it
    # (a hardcoded single '1' was a ~1/256-per-idx latent gate flake)
    for idx in (283, 406, 627):
        addr = btc_address(idx, valid=True)
        assert addr.startswith("11") and is_btc_address(addr), addr
        assert not is_btc_address(btc_address(idx, valid=False))

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


def test_crawl_delay_parser_agrees_with_stdlib(spark):
    """Crawl-delay for '*' pinned against urllib.robotparser: entry
    scoping (a delay under another agent does not apply; a UA line
    after a crawl-delay starts a fresh entry), digits-only values, and
    the (host, crawl_delay) Spark dim."""
    import urllib.robotparser

    from blockchainspider_spark.functions.robots import (
        parse_crawl_delay,
        parse_crawl_delays,
    )

    cases = [
        "User-agent: *\nCrawl-delay: 7\nDisallow: /x\n",
        "User-agent: bigbot\nCrawl-delay: 9\n\nUser-agent: *\nDisallow: /x\n",
        "User-agent: *\nCrawl-delay: 1.5\n",      # non-digit: ignored
        "User-agent: *\nCrawl-delay: fast\n",
        "User-agent: a\nCrawl-delay: 3\nUser-agent: *\nCrawl-delay: 2\n",
        "User-agent: *\nUser-agent: b\nCrawl-delay: 4\n",  # grouped UAs
        "",
    ]
    for txt in cases:
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        assert parse_crawl_delay(txt) == rp.crawl_delay("*"), txt

    docs = spark.createDataFrame(
        [("h1", cases[0]), ("h2", cases[1]), ("h3", cases[4])],
        "host string, robots_txt string",
    )
    got = {r.host: r.crawl_delay for r in parse_crawl_delays(docs).collect()}
    assert got == {"h1": 7.0, "h3": 2.0}  # h2's delay belongs to bigbot


def test_robots_gate_first_match_allow_shadowing(spark):
    """apply_robots_gate evaluates robotparser's FIRST-MATCH-WINS order
    end-to-end in Spark: an Allow shadows a later broader Disallow, a
    blank Disallow (= allow-all) shadows EVERYTHING after it, and later
    '*' entries are discarded — each case pinned against
    urllib.robotparser on the same URLs."""
    import urllib.robotparser

    from blockchainspider_spark.functions.robots import apply_robots_gate, parse_robots

    policies = {
        # Allow: /a shadows Disallow: / for /a... paths only
        "h1": "User-agent: *\nAllow: /a\nDisallow: /\n",
        # blank Disallow is an allow-all FIRST rule — nothing blocked
        "h2": "User-agent: *\nDisallow: \nDisallow: /\n",
        # second '*' entry discarded: /b stays fetchable
        "h3": "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n",
        # reversed order: Disallow: / first → everything blocked
        "h4": "User-agent: *\nDisallow: /\nAllow: /a\n",
    }
    docs = spark.createDataFrame(list(policies.items()),
                                 "host string, robots_txt string")
    rules = parse_robots(docs)
    paths = ["/", "/a", "/a/x", "/b", "/c/d"]
    urls = spark.createDataFrame(
        [(f"http://{h}{p}",) for h in policies for p in paths], "url string")
    kept = {r.url for r in apply_robots_gate(urls, rules).collect()}
    for h, txt in policies.items():
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        for p in paths:
            url = f"http://{h}{p}"
            assert (url in kept) == rp.can_fetch("*", url), url
    assert "http://h1/a/x" in kept and "http://h1/c/d" not in kept
    assert all(f"http://h2{p}" in kept for p in paths)
    assert "http://h3/b" in kept and "http://h3/a" not in kept
    assert "http://h4/a" not in kept


def test_trap_filter_and_session_strip(spark, web_source):
    # hand-built page graph: the seed links to a pathological trap URL,
    # a calendar trap, and the same page twice under different session
    # ids; with hygiene ON the traps are never scheduled and the two
    # session variants dedup to one fetch
    seed = "http://ex.test/"
    pages = [
        (seed,
         '<a href="http://ex.test/a/a/a/a">loop</a>'
         '<a href="http://ex.test/cal/2026/08/18/1999">cal</a>'
         '<a href="http://ex.test/page?phpsessid=abc&q=1">s1</a>'
         '<a href="http://ex.test/page?phpsessid=def&q=1">s2</a>'
         '<a href="http://ex.test/ok">ok</a>'),
        ("http://ex.test/page?q=1", "fine"),
        ("http://ex.test/ok", "fine too"),
        ("http://ex.test/a/a/a/a", "trap body"),
        ("http://ex.test/cal/2026/08/18/1999", "cal body"),
    ]
    pages_df = spark.createDataFrame(pages, "url string, html string")

    clean = WebCrawlEngine(spark, pages_df, max_depth=1,
                           trap_filter=True, strip_sessions=True).run(seed)
    urls = [u for _, u, _ in clean.fetch_log]
    assert urls == [seed, "http://ex.test/page?q=1", "http://ex.test/ok"]

    # hygiene OFF (the reference contract): traps scheduled, session
    # variants fetched separately (distinct fingerprints)
    dirty = WebCrawlEngine(spark, pages_df, max_depth=1).run(seed)
    dirty_urls = [u for _, u, _ in dirty.fetch_log]
    assert len(dirty_urls) == 6  # seed + all 5 links, sid variants distinct
    assert "http://ex.test/a/a/a/a" in dirty_urls
