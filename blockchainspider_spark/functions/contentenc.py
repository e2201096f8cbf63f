"""HTTP ``Content-Encoding`` decoding for fetched bodies (crawl tier).

Real responses arrive compressed; a crawler that can't undo
``Content-Encoding`` sees garbage bytes where HTML should be. This is
the RFC 9110 §8.4 subset the stdlib can decode, with the two
real-world warts handled explicitly:

* **gzip** (and the legacy ``x-gzip`` alias) — a body may legally be
  several concatenated gzip members; all are decoded and joined
  (the same member-boundary logic as functions/warc.py, via
  ``zlib.decompressobj(31)``).
* **deflate** — the classic interop wart: the RFC says zlib-wrapped
  (RFC 1950), but plenty of historical servers send raw DEFLATE
  (RFC 1951). Try zlib first, fall back to raw, as every browser does.
* **identity** / absent — returned as-is.
* ``br`` / ``zstd`` / ``compress`` — no codec in this container:
  refuse loudly (NotImplementedError), never pass compressed bytes
  through as if decoded.

A comma-separated list (``Content-Encoding: gzip, br``) is undone in
reverse application order per RFC 9110. ``chunked`` here is a protocol
error — that's a Transfer-Encoding (the SOCKS5 HTTP client de-chunks
it, functions/socks5.py) — and raises ValueError with a pointer.
"""

from __future__ import annotations

import zlib


def _gunzip_members(raw: bytes) -> bytes:
    out, pos, n = [], 0, len(raw)
    while pos < n:
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(raw[pos:]))
        except zlib.error as e:
            raise ValueError(f"bad gzip member at offset {pos}: {e}") from e
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        pos = n - len(d.unused_data)
    return b"".join(out)


def _inflate(raw: bytes) -> bytes:
    try:
        return zlib.decompress(raw)          # RFC 1950 zlib-wrapped
    except zlib.error:
        return zlib.decompress(raw, -15)     # raw DEFLATE (RFC 1951)


def decode_content_encoding(raw: bytes, encoding: str | None) -> bytes:
    """Undo a Content-Encoding header value (single token or
    comma-separated chain, undone right-to-left)."""
    if not encoding:
        return raw
    tokens = [t.strip().lower() for t in encoding.split(",") if t.strip()]
    body = raw
    for token in reversed(tokens):
        if token in ("identity", ""):
            continue
        if token in ("gzip", "x-gzip"):
            body = _gunzip_members(body)
        elif token == "deflate":
            body = _inflate(body)
        elif token == "chunked":
            raise ValueError(
                "'chunked' is a Transfer-Encoding, not a Content-Encoding "
                "— de-chunk at the HTTP layer (functions/socks5.py does)")
        elif token in ("br", "zstd", "compress", "x-compress"):
            raise NotImplementedError(
                f"Content-Encoding {token!r}: no codec in this container "
                "— refusing rather than passing compressed bytes through")
        else:
            raise ValueError(f"unknown Content-Encoding token {token!r}")
    return body
