"""Content-Encoding decode tests (functions/contentenc.py)."""

import gzip
import io
import zlib

import pytest

from blockchainspider_spark.functions.contentenc import decode_content_encoding


def _gzip_bytes(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(data)
    return buf.getvalue()


def test_identity_and_absent():
    assert decode_content_encoding(b"abc", None) == b"abc"
    assert decode_content_encoding(b"abc", "") == b"abc"
    assert decode_content_encoding(b"abc", "identity") == b"abc"


def test_gzip_single_and_multi_member():
    body = b"hello " * 100
    assert decode_content_encoding(_gzip_bytes(body), "gzip") == body
    two = _gzip_bytes(body[:300]) + _gzip_bytes(body[300:])
    assert decode_content_encoding(two, "x-gzip") == body


def test_deflate_both_flavors():
    body = b"deflate me " * 50
    assert decode_content_encoding(zlib.compress(body), "deflate") == body
    raw = zlib.compressobj(wbits=-15)
    blob = raw.compress(body) + raw.flush()
    assert decode_content_encoding(blob, "deflate") == body


def test_chained_encodings_reverse_order():
    body = b"chain " * 40
    blob = _gzip_bytes(zlib.compress(body))  # deflate applied first, then gzip
    assert decode_content_encoding(blob, "deflate, gzip") == body


def test_loud_failures():
    with pytest.raises(NotImplementedError, match="br"):
        decode_content_encoding(b"xx", "br")
    with pytest.raises(ValueError, match="Transfer-Encoding"):
        decode_content_encoding(b"xx", "chunked")
    with pytest.raises(ValueError, match="unknown"):
        decode_content_encoding(b"xx", "sdch")
    with pytest.raises(ValueError, match="truncated gzip"):
        decode_content_encoding(_gzip_bytes(b"abc")[:-3], "gzip")
    with pytest.raises(ValueError, match="bad gzip"):
        decode_content_encoding(b"\x1f\x8b\xff\xffgarbage", "gzip")
