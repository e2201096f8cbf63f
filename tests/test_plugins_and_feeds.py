"""Plugin surfaces (X1-X3) + label-feed sources (S18/S19)."""

import json

import pandas as pd
from pyspark.sql import functions as F

from blockchainspider_spark.engine.plugins import WaveHooks, load_strategy
from blockchainspider_spark.sources.feeds import (
    parse_ofac_feed,
    parse_ofac_xml,
    parse_scamdb_feed,
)


def test_load_strategy_registry_and_dotted_path():
    assert load_strategy("BFS").__name__ == "VecBfs"
    cls = load_strategy("blockchainspider_spark.engine.strategies_vec:VecHaircut")
    assert cls.__name__ == "VecHaircut"


class _NoPush:
    def pop(self):
        return None, {}


def test_load_strategy_contract_enforced():
    import pytest

    with pytest.raises(TypeError):
        load_strategy(f"{_NoPush.__module__}:_NoPush")


def test_custom_strategy_runs_in_exact_engine(spark, edges_df, source):
    """A user-defined strategy (depth-1 out-neighbors only) plugs in by
    dotted path — the reference's -a strategy= extension point."""
    from blockchainspider_spark.engine.exact import ExactCrawlEngine

    engine = ExactCrawlEngine(
        spark, edges_df,
        "tests.custom_strategy_fixture:OutOnlyOnce", {},
    )
    res = engine.run(source, max_steps=50)
    assert res.pop_log[0][1] == source
    assert all(ctx.get("depth", 0) <= 1 for _, _, ctx in res.pop_log)


def test_wave_hooks_filter_transfers(spark, edges_df, images_df, source):
    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine

    hooks = WaveHooks(on_transfers=[lambda df: df.where(F.col("symbol") == "native")])
    engine = BfsWaveEngine(spark, edges_df, max_depth=1, hooks=hooks)
    _, emitted, _ = engine.run(source)
    assert emitted.where(F.col("symbol") != "native").count() == 0
    assert emitted.count() > 0


def test_scamdb_feed_parse(spark):
    doc = json.dumps({
        "success": True,
        "result": {
            "bad.example": [
                {"name": "bad", "url": "http://bad.example", "category": "Scam",
                 "addresses": ["0xabc", "0xdef"]},
            ],
            "worse.example": [
                {"name": "worse", "url": "http://worse.example", "category": "Phish",
                 "addresses": []},
            ],
        },
    })
    df = spark.createDataFrame(pd.DataFrame({"doc": [doc]}))
    rows = parse_scamdb_feed(spark, df).collect()
    got = {(r.domain, r.address) for r in rows}
    assert ("bad.example", "0xabc") in got and ("bad.example", "0xdef") in got
    assert any(r.domain == "worse.example" and r.address is None for r in rows)


_SDN_XML = """<?xml version="1.0" encoding="utf-8"?>
<sdnList xmlns="https://sanctionslistservice.ofac.treas.gov/api/PublicationPreview/exports/XML">
  <sdnEntry>
    <uid>101</uid>
    <firstName>Ada</firstName>
    <lastName>Lovelace</lastName>
    <sdnType>Individual</sdnType>
    <idList>
      <id><idType>Passport</idType><idNumber>P123</idNumber></id>
      <id><idType>Digital Currency Address - XBT</idType><idNumber>1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa</idNumber></id>
      <id><idType>Digital Currency Address - ETH</idType><idNumber>0xabc0000000000000000000000000000000000001</idNumber></id>
    </idList>
  </sdnEntry>
  <sdnEntry>
    <uid>102</uid>
    <lastName>NoCrypto Corp</lastName>
    <sdnType>Entity</sdnType>
    <idList>
      <id><idType>Tax ID</idType><idNumber>T9</idNumber></id>
    </idList>
  </sdnEntry>
</sdnList>"""


def test_ofac_xml_parse(spark):
    """S18: real SDN-shaped XML end-to-end — namespace-wildcard XPath walk,
    DCA-only entry filter, XBT→BTC net mapping (reference ofac.py:22-71)."""
    df = spark.createDataFrame(pd.DataFrame({"doc": [_SDN_XML]}))
    rows = parse_ofac_xml(df).collect()
    assert {(r.net, r.address) for r in rows} == {
        ("BTC", "1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa"),
        ("ETH", "0xabc0000000000000000000000000000000000001"),
    }
    assert all(r.uid == "101" and r.first_name == "Ada" and r.sdn_type == "Individual"
               for r in rows)
    # entry 102 has no digital-currency address → filtered (reference
    # _has_address guard)
    assert all(r.uid != "102" for r in rows)


def test_ofac_feed_parse(spark):
    doc = json.dumps({
        "sdnEntries": [{
            "uid": "1", "firstName": "A", "lastName": "B",
            "programs": ["CYBER"],
            "digitalCurrencyAddresses": [
                {"currency": "XBT", "address": "1Boat..."},
                {"currency": "ETH", "address": "0xabc"},
            ],
        }],
    })
    df = spark.createDataFrame(pd.DataFrame({"doc": [doc]}))
    rows = parse_ofac_feed(spark, df).collect()
    assert {(r.currency, r.address) for r in rows} == {("XBT", "1Boat..."), ("ETH", "0xabc")}
    assert rows[0].programs == "CYBER"


def test_sitemap_parse(spark):
    """Sitemap ingestion: namespaced urlset, namespace-less index,
    nested-sitemap kind split, missing-loc rows dropped, and a loud
    gate on non-sitemap XML."""
    import pytest

    from blockchainspider_spark.sources.feeds import (
        parse_sitemap_text,
        parse_sitemaps,
    )

    urlset = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc> https://h/a </loc><lastmod>2024-03-01</lastmod>"
        "<priority>0.5</priority></url>"
        "<url><loc>https://h/b</loc></url>"
        "<url><lastmod>2024-03-02</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    index = "<sitemapindex><sitemap><loc>https://h/s2.xml</loc></sitemap></sitemapindex>"
    docs = spark.createDataFrame(
        [("s1", urlset), ("s2", index)], "source string, xml string"
    )
    rows = {(r.source, r.kind, r.url): (r.lastmod, r.priority)
            for r in parse_sitemaps(docs).collect()}
    assert rows == {
        ("s1", "url", "https://h/a"): ("2024-03-01", 0.5),
        ("s1", "url", "https://h/b"): (None, None),
        ("s2", "sitemap", "https://h/s2.xml"): (None, None),
    }
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap_text("s", "<rss><channel/></rss>")
