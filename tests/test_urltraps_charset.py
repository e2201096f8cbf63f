"""Crawler-trap scoring (functions/urltraps.py) + charset sniffing
(functions/charset.py) tests."""

import codecs

import pytest

from blockchainspider_spark.functions.charset import decode_page, sniff_charset


# ------------------------------------------------------------- url traps

def _features(spark, urls):
    from blockchainspider_spark.functions.urltraps import url_trap_features

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"]: r.asDict() for r in url_trap_features(df).collect()}


def test_pathological_repetition(spark):
    got = _features(spark, [
        "http://ex.test/a/b/c",
        "http://ex.test/a/a/b",
        "http://ex.test/x/a/a/a/b",
        "http://ex.test/a/b/a/b/a",   # alternating — runs of 1 only
    ])
    assert got["http://ex.test/a/b/c"]["max_seg_run"] == 1
    assert got["http://ex.test/a/a/b"]["max_seg_run"] == 2
    assert not got["http://ex.test/a/a/b"]["pathological"]
    assert got["http://ex.test/x/a/a/a/b"]["max_seg_run"] == 3
    assert got["http://ex.test/x/a/a/a/b"]["pathological"]
    assert got["http://ex.test/x/a/a/a/b"]["is_trap"]
    assert got["http://ex.test/a/b/a/b/a"]["max_seg_run"] == 1


def test_segment_count_and_query_ignored(spark):
    deep = "http://ex.test/" + "/".join(f"s{i}" for i in range(25))
    got = _features(spark, [deep, "http://ex.test/a/b?x=1/2/3#f/rag"])
    assert got[deep]["n_segments"] == 25
    assert got[deep]["too_many_segments"] and got[deep]["is_trap"]
    q = got["http://ex.test/a/b?x=1/2/3#f/rag"]
    assert q["n_segments"] == 2  # query/fragment segments don't count


def test_calendarish_numeric_segments(spark):
    cal = "http://ex.test/cal/2026/08/18/2027"
    got = _features(spark, [cal, "http://ex.test/2026/08/p"])
    assert got[cal]["n_numeric_segs"] == 4
    assert got[cal]["calendarish"] and got[cal]["is_trap"]
    assert got["http://ex.test/2026/08/p"]["n_numeric_segs"] == 2
    assert not got["http://ex.test/2026/08/p"]["is_trap"]


def test_session_id_strip(spark):
    got = _features(spark, [
        "http://ex.test/p?PHPSESSID=abc123&a=1",
        "http://ex.test/p?a=1&jsessionid=X9&b=2",
        "http://ex.test/p?sid=42",
        "http://ex.test/p?side=42",        # 'side' is not 'sid'
        "http://ex.test/p",
    ])
    assert got["http://ex.test/p?PHPSESSID=abc123&a=1"]["has_session_id"]
    assert got["http://ex.test/p?PHPSESSID=abc123&a=1"]["clean_url"] == \
        "http://ex.test/p?a=1"
    assert got["http://ex.test/p?a=1&jsessionid=X9&b=2"]["clean_url"] == \
        "http://ex.test/p?a=1&b=2"
    assert got["http://ex.test/p?sid=42"]["clean_url"] == "http://ex.test/p"
    assert not got["http://ex.test/p?side=42"]["has_session_id"]
    assert got["http://ex.test/p?side=42"]["clean_url"] == \
        "http://ex.test/p?side=42"
    assert not got["http://ex.test/p"]["has_session_id"]


def test_trap_plan_stays_jvm_side(spark):
    # the whole scorer must be column algebra — no Python UDF stage
    from blockchainspider_spark.functions.urltraps import url_trap_features

    df = spark.createDataFrame([("http://ex.test/a/a/a?sid=1",)], "url string")
    plan = url_trap_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------------- charset

def test_bom_precedence():
    # BOM beats a (lying) meta declaration
    raw = codecs.BOM_UTF16_LE + '<meta charset="ascii">é'.encode("utf-16-le")
    enc, src = sniff_charset(raw)
    assert (enc, src) == ("utf-16-le", "bom")
    text, enc, _ = decode_page(raw)
    assert "é" in text
    for bom, enc_want in [(codecs.BOM_UTF8, "utf-8-sig"),
                          (codecs.BOM_UTF32_LE, "utf-32-le"),
                          (codecs.BOM_UTF16_BE, "utf-16-be")]:
        assert sniff_charset(bom + b"")[1] == "bom", enc_want


def test_meta_declarations():
    raw = b'<html><meta charset="ISO-8859-1"><body>caf\xe9'
    text, enc, src = decode_page(raw)
    assert (enc, src) == ("iso8859-1", "meta")
    assert text.endswith("caf\xe9")
    raw2 = (b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=utf-8">ok')
    assert sniff_charset(raw2) == ("utf-8", "meta")


def test_meta_outside_prescan_window_ignored():
    raw = b"<!--" + b"x" * 1100 + b'--><meta charset="iso-8859-1">hi'
    assert sniff_charset(raw)[1] != "meta"


def test_heuristics_and_fallback():
    assert sniff_charset(b"plain ascii") == ("ascii", "ascii")
    assert sniff_charset("déjà vu".encode()) == ("utf-8", "utf8")
    # 0xE9 alone is invalid UTF-8 → browser fallback
    assert sniff_charset(b"caf\xe9") == ("cp1252", "fallback")
    text, enc, _ = decode_page(b"caf\xe9 \x93quoted\x94")
    assert enc == "cp1252"
    assert text == "café “quoted”"  # cp1252 smart quotes


def test_declared_invalid_falls_through():
    raw = b'<meta charset="klingon">caf\xe9'
    enc, src = sniff_charset(raw)
    assert src == "declared_invalid"
    assert enc == "cp1252"
    # declared utf-8 but bytes aren't — declaration rejected
    raw2 = b'<meta charset="utf-8">caf\xe9'
    enc2, src2 = sniff_charset(raw2)
    assert src2 == "declared_invalid" and enc2 == "cp1252"


def test_undefined_cp1252_bytes_replace():
    text, enc, _ = decode_page(b"x\x81y")
    assert enc == "cp1252" and text == "x�y"
