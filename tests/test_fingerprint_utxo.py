"""URL canonicalization/fingerprint edge cases + UTXO edge adaptation."""

from pyspark.sql import functions as F

from blockchainspider_spark.functions.fingerprint import canonicalize_one
from blockchainspider_spark.operators.transfers import utxo_to_edges


def test_canonicalize_sorts_params_and_lowercases_host():
    a = canonicalize_one("HTTP://Host.Example.COM:80/p?b=2&a=1#frag")
    b = canonicalize_one("http://host.example.com/p?a=1&b=2")
    assert a == b == "http://host.example.com/p?a=1&b=2"


def test_canonicalize_keeps_nondefault_port_and_blank_values():
    assert canonicalize_one("http://h/p?x=&y=1") == "http://h/p?x=&y=1"
    assert canonicalize_one("https://h:8443/") == "https://h:8443/"
    assert canonicalize_one("https://h:443/") == "https://h/"


def test_canonicalize_empty_path():
    assert canonicalize_one("http://h?z=1") == "http://h/?z=1"


def test_request_fingerprint_udf_matches_python(spark):
    from blockchainspider_spark.engine.web_crawl import request_fp
    from blockchainspider_spark.oracle.web import url_fingerprint

    urls = ["http://A.example/p?b=2&a=1", "img://host-3/0xabc", "https://h:443/q?x="]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: r.fp for r in df.select("url", request_fp(F.col("url")).alias("fp")).collect()}
    assert got == {u: url_fingerprint(u) for u in urls}


def test_utxo_adaptation(spark):
    rows = [
        ("i1", "txA", "txB", "addr1", 500, True, False, 10, 1, 2),
        ("i2", "txA", "", "addr2", 300, False, False, 10, 1, 2),  # unspent → dropped
        ("i3", "txC", "txA", "addr3", 900, True, True, 11, 2, 3),
    ]
    utxo = spark.createDataFrame(
        rows,
        "id string, tx_from string, tx_to string, address string, value long, "
        "is_spent boolean, is_coinbase boolean, timestamp long, block_number long, fee long",
    )
    edges = utxo_to_edges(utxo).collect()
    assert {e.id for e in edges} == {"i1", "i3"}
    e1 = next(e for e in edges if e.id == "i1")
    assert (e1.address_from, e1.address_to, e1.value) == ("txA", "txB", "500")
    assert e1.symbol == "" and e1.token_id == ""
