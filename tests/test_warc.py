"""WARC codec + Spark source/sink/CDX tests (functions/warc.py,
sources/warc.py)."""

import base64
import gzip
import hashlib
import io
import os

import pytest

from blockchainspider_spark.functions.warc import (
    WarcError, build_record, build_response_record, http_request_block,
    parse_warc, payload_digest, surt,
)


def test_roundtrip_plain_records():
    data = (
        build_record("warcinfo", b"software: bss-spark\r\n",
                     content_type="application/warc-fields")
        + build_record("request", http_request_block("GET", "/a", "ex.test"),
                       target_uri="http://ex.test/a",
                       content_type="application/http;msgtype=request")
        + build_response_record("http://ex.test/a", 200, "OK",
                                "text/html", b"<html>hi</html>")
    )
    recs = parse_warc(data)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
    assert recs[0]["http_status"] is None and recs[0]["payload"] is None
    assert recs[1]["http_status"] is None  # request status line has no code
    assert recs[2]["http_status"] == 200
    assert recs[2]["payload"] == b"<html>hi</html>"
    assert recs[2]["target_uri"] == "http://ex.test/a"
    # offsets/lengths tile the stream exactly
    assert recs[0]["offset"] == 0
    for a, b in zip(recs, recs[1:]):
        assert b["offset"] == a["offset"] + a["length"]
    assert recs[-1]["offset"] + recs[-1]["length"] == len(data)


def test_roundtrip_gzip_and_mixed_members():
    gz1 = build_response_record("http://ex.test/1", 200, "OK",
                                "text/plain", b"one", gzip_member=True)
    plain = build_response_record("http://ex.test/2", 404, "Not Found",
                                  "text/plain", b"two")
    gz2 = build_response_record("http://ex.test/3", 200, "OK",
                                "text/plain", b"three", gzip_member=True)
    recs = parse_warc(gz1 + plain + gz2)
    assert [r["payload"] for r in recs] == [b"one", b"two", b"three"]
    assert [r["http_status"] for r in recs] == [200, 404, 200]
    # offsets are in the COMPRESSED stream: member 2 starts where gz1 ends
    assert recs[1]["offset"] == len(gz1)
    assert recs[2]["offset"] == len(gz1) + len(plain)
    assert recs[2]["length"] == len(gz2)


def test_gzip_members_are_deterministic():
    a = build_response_record("http://ex.test/1", 200, "OK",
                              "text/plain", b"same", gzip_member=True)
    b = build_response_record("http://ex.test/1", 200, "OK",
                              "text/plain", b"same", gzip_member=True)
    assert a == b  # mtime=0 + deterministic record id


def test_payload_digest_known_vector():
    # base32(sha1(b"")) — the canonical empty-payload digest
    assert payload_digest(b"") == "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"
    body = b"hello warc"
    want = "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()
    assert payload_digest(body) == want


def test_digest_mismatch_raises():
    rec = build_response_record("http://ex.test/a", 200, "OK",
                                "text/plain", b"payload")
    tampered = rec.replace(b"payload\r\n\r\n", b"PAYLOAD\r\n\r\n")
    with pytest.raises(WarcError, match="digest mismatch"):
        parse_warc(tampered)
    # and the escape hatch works
    assert parse_warc(tampered, verify_digest=False)[0]["payload"] == b"PAYLOAD"


def test_header_folding():
    block = b"x"
    raw = (b"WARC/1.1\r\n"
           b"WARC-Type: metadata\r\n"
           b"WARC-Record-ID: <urn:uuid:0>\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"X-Long: first part\r\n"
           b"\t second part\r\n"
           b"Content-Length: 1\r\n"
           b"\r\n" + block + b"\r\n\r\n")
    rec = parse_warc(raw)[0]
    assert rec["fields"]["x-long"] == "first part second part"


def test_truncation_and_bad_magic_raise():
    rec = build_response_record("http://ex.test/a", 200, "OK",
                                "text/plain", b"abc")
    with pytest.raises(WarcError, match="truncated|CRLFCRLF"):
        parse_warc(rec[:-6])
    with pytest.raises(WarcError, match="not a WARC record"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    gz = build_response_record("http://ex.test/a", 200, "OK",
                               "text/plain", b"abc", gzip_member=True)
    with pytest.raises(WarcError, match="truncated gzip"):
        parse_warc(gz[:-4])


def test_gzip_member_with_two_records_rejected():
    two = (build_response_record("http://ex.test/1", 200, "OK", "text/plain", b"1")
           + build_response_record("http://ex.test/2", 200, "OK", "text/plain", b"2"))
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(two)
    with pytest.raises(WarcError, match="one record per member"):
        parse_warc(buf.getvalue())


def test_surt():
    assert surt("http://www.Example.test:80/a?b=2&a=1") == \
        "test,example,www)/a?a=1&b=2"
    assert surt("https://ex.test/") == "test,ex)/"
    assert surt("https://ex.test") == "test,ex)/"
    assert surt("http://ex.test:8080/p") == "test,ex:8080)/p"
    # host order groups a domain's subdomains adjacently
    assert surt("http://a.ex.test/").startswith("test,ex,a)")


def test_spark_warc_roundtrip_and_cdx(spark, tmp_path):
    from blockchainspider_spark.sources.warc import (
        cdx_index, read_warc, write_warc,
    )

    pages = spark.createDataFrame(
        [(f"http://w{i % 3}.ex.test/doc/{i}", 200 if i % 7 else 404,
          "text/plain", f"body-{i}".encode()) for i in range(20)],
        "url string, status int, content_type string, payload binary",
    ).repartition(3)
    out = str(tmp_path / "warcs")
    write_warc(pages, out)
    shards = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert len(shards) == 3  # one per non-empty partition

    recs = read_warc(spark, out)
    # each shard opens with a warcinfo record carrying WARC-Filename
    infos = recs.where("warc_type = 'warcinfo'").collect()
    assert len(infos) == 3 and all(r["target_uri"] is None for r in infos)
    responses = recs.where("warc_type = 'response'")
    got = {r["target_uri"]: r for r in responses.collect()}
    assert len(got) == 20
    for i in range(20):
        r = got[f"http://w{i % 3}.ex.test/doc/{i}"]
        assert bytes(r["payload"]) == f"body-{i}".encode()
        assert r["http_status"] == (200 if i % 7 else 404)

    cdx = cdx_index(recs).collect()
    surts = [r["surt"] for r in cdx]
    assert surts == sorted(surts)
    assert surts[0].startswith("test,ex,w0)/doc/")

    # the CDX contract: (filename, offset, length) random-accesses the
    # record without reading the rest of the shard
    probe = cdx[5]
    with open(os.path.join(out, probe["filename"]), "rb") as f:
        f.seek(probe["offset"])
        member = f.read(probe["length"])
    (single,) = parse_warc(member)
    assert single["target_uri"] == probe["original"]
    assert single["fields"]["warc-payload-digest"] == probe["digest"]


def test_write_warc_shard_rolling(spark, tmp_path):
    from blockchainspider_spark.sources.warc import read_warc, write_warc

    def incompressible(i: int) -> bytes:  # gzip can't shrink hash chains
        return b"".join(hashlib.sha256(f"{i}-{j}".encode()).digest()
                        for j in range(60))

    pages = spark.createDataFrame(
        [(f"http://ex.test/{i}", 200, "text/plain", incompressible(i))
         for i in range(10)],
        "url string, status int, content_type string, payload binary",
    ).coalesce(1)
    out = str(tmp_path / "small-shards")
    write_warc(pages, out, max_shard_bytes=3000)
    shards = sorted(os.listdir(out))
    assert len(shards) > 1  # rolled
    recs = read_warc(spark, out)
    assert recs.where("warc_type = 'response'").count() == 10
    # one warcinfo per shard, each naming its own file
    infos = recs.where("warc_type = 'warcinfo'").collect()
    assert len(infos) == len(shards)
