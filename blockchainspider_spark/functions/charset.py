"""Charset sniffing + decoding for fetched page bytes (crawl tier).

HTTP bodies arrive as bytes; the reference relies on Scrapy's
w3lib-based encoding inference (responsetypes + html_to_unicode). This
is the same public algorithm re-implemented as a pure function the
Arrow-batched decode kernel shares with tests and the DuckDB oracle,
with the WHATWG-style precedence order:

1. **BOM** — UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE (BOM wins over any
   declaration, per the WHATWG encoding standard).
2. **In-document declaration** — ``<meta charset=…>`` or the http-equiv
   Content-Type form, scanned in the first 1024 bytes (the WHATWG
   prescan window).
3. **Content heuristic** — pure ASCII → ``ascii``; else bytes that
   validate as UTF-8 → ``utf-8`` (UTF-8 false-positives are
   vanishingly rare for real text); else the browser fallback
   ``windows-1252`` (which never fails — every byte is mapped).

``decode_page`` never raises on real-world bytes: the cp1252 fallback
decodes anything; declared-but-wrong encodings fall through to the
heuristic (labelled ``declared_invalid``). Everything is stdlib
``codecs`` — no chardet dependency.
"""

from __future__ import annotations

import codecs
import re

_BOMS: tuple[tuple[bytes, str], ...] = (
    # order matters: UTF-32 BOMs contain the UTF-16 ones as prefixes
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([a-zA-Z0-9_-]+)"""
    rb"""|content\s*=\s*["'][^"']*charset=([a-zA-Z0-9_-]+))""",
    re.IGNORECASE,
)

_PRESCAN = 1024


def _normalize(label: str) -> str | None:
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def sniff_charset(raw: bytes) -> tuple[str, str]:
    """(encoding, source) where source ∈ {bom, meta, ascii, utf8,
    fallback, declared_invalid}."""
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            return enc, "bom"
    m = _META_RE.search(raw[:_PRESCAN])
    if m:
        label = (m.group(1) or m.group(2)).decode("ascii", "replace")
        enc = _normalize(label)
        if enc is not None:
            # WHATWG: x-user-defined / utf-16 declarations map to
            # their byte-compatible decodables; keep it simple — trust
            # the declaration only if it actually decodes
            try:
                raw.decode(enc)
                return enc, "meta"
            except (UnicodeDecodeError, LookupError):
                pass
            source = "declared_invalid"
        else:
            source = "declared_invalid"
    else:
        source = None
    try:
        raw.decode("ascii")
        return "ascii", source or "ascii"
    except UnicodeDecodeError:
        pass
    try:
        raw.decode("utf-8")
        return "utf-8", source or "utf8"
    except UnicodeDecodeError:
        return "cp1252", source or "fallback"


def decode_page(raw: bytes) -> tuple[str, str, str]:
    """(text, encoding, source) — total function over arbitrary bytes:
    the cp1252 fallback decodes with errors='replace', so the five
    bytes cp1252 leaves undefined (0x81 8D 8F 90 9D) come out as U+FFFD
    instead of raising."""
    enc, source = sniff_charset(raw)
    if enc == "cp1252":
        text = raw.decode("cp1252", errors="replace")
    else:
        text = raw.decode(enc)
    return text, enc, source
