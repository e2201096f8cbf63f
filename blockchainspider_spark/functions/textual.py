"""Web-page text kernels: HTML strip, link extraction, entity regexes,
keyword/summary extraction (label-crawl pipeline, SURVEY S16/F9-F12).

Each kernel has one deterministic pure-Python core shared by the oracle
and the Arrow-batched pandas UDFs, so crawl outputs match bit-for-bit.
The reference uses summa's TextRank (web.py:36-37); that package is not
in the container, so keywords/summary use a deterministic frequency
ranker (top-k tokens by count, first-appearance tiebreak) — same shape,
stable contract, clearly documented stand-in.
"""

from __future__ import annotations

import re
from collections import Counter
from urllib.parse import urljoin, urlparse

_STYLE_RE = re.compile(r"<style[\s\S]*?</style>")
_SCRIPT_RE = re.compile(r"<script[\s\S]*?</script>")
_TAG_RE = re.compile(r"<(.*?)>")
_HREF_RE = re.compile(r'<a\s[^>]*href="([^"]*)"', re.IGNORECASE)
_SRC_RE = re.compile(r'<script\s[^>]*src="([^"]*)"', re.IGNORECASE)
ETH_ADDR_RE = re.compile(r"\W(0x[0-9a-f]{40})", re.IGNORECASE | re.ASCII)
ETH_TX_RE = re.compile(r"\W(0x[0-9a-f]{64})", re.IGNORECASE | re.ASCII)
BTC_ADDR_RE = re.compile(r"\W([13][a-km-zA-HJ-NP-Z1-9]{25,34})")
BTC_TX_RE = re.compile(r"\W([0-9a-f]{64})", re.IGNORECASE | re.ASCII)
_TOKEN_RE = re.compile(r"[a-zA-Z]{2,}")

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def is_btc_address(addr: str) -> bool:
    """Base58Check validation (version byte + 20-byte hash + 4-byte
    double-SHA256 checksum) — the semantics of the reference's
    ``bitcoin.is_address`` (web.py:6,97), stdlib-only."""
    import hashlib

    n = 0
    for ch in addr:
        d = _B58_INDEX.get(ch)
        if d is None:
            return False
        n = n * 58 + d
    n_zeros = len(addr) - len(addr.lstrip("1"))
    body = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    raw = b"\x00" * n_zeros + body
    if len(raw) != 25:  # version + hash160 + checksum
        return False
    checksum = hashlib.sha256(hashlib.sha256(raw[:-4]).digest()).digest()[:4]
    return checksum == raw[-4:]


def is_eth_address(addr: str) -> bool:
    """EIP-55 validation (Web3.isAddress semantics, web.py:108): uniform
    case always passes; mixed case must match the keccak checksum."""
    if not re.fullmatch(r"0x[0-9a-fA-F]{40}", addr or ""):
        return False
    hexpart = addr[2:]
    lower, upper = hexpart.lower(), hexpart.upper()
    if hexpart == lower or hexpart == upper:
        return True
    from blockchainspider_spark.functions.keccak import keccak256_hex

    digest = keccak256_hex(lower)
    for c, h in zip(hexpart, digest):
        if c.isalpha() and (int(h, 16) >= 8) != c.isupper():
            return False
    return True


def strip_html(html: str) -> str:
    """Reference web.py:48-50: drop <style>/<script> blocks, then tags."""
    text = _STYLE_RE.sub(" ", html or "")
    text = _SCRIPT_RE.sub(" ", text)
    return _TAG_RE.sub(" ", text)


def extract_links(base_url: str, html: str) -> list[str]:
    """Document-order hrefs, urljoined, http(s)-scheme filtered
    (web.py:76-83). Order defines BFS enqueue order."""
    out = []
    for href in _HREF_RE.findall(html or ""):
        url = urljoin(base_url, href)
        if urlparse(url).scheme.startswith("http"):
            out.append(url)
    return out


def extract_script_srcs(base_url: str, html: str) -> list[str]:
    return [urljoin(base_url, s) for s in _SRC_RE.findall(html or "")]


def extract_entities(text: str) -> list[tuple[str, str]]:
    """(net, value) pairs in reference emission order: BTC addr, ETH addr,
    BTC tx, ETH tx (web.py:116-176). Addresses are checksum-validated —
    base58check for BTC (≅ bitcoin.is_address, web.py:97), EIP-55 for ETH
    (≅ Web3.isAddress, web.py:108); tx hashes are shape-only, matching
    the reference."""
    found: list[tuple[str, str]] = []
    found += [("BTC-Like-address", a) for a in BTC_ADDR_RE.findall(text) if is_btc_address(a)]
    found += [("ETH-Like-address", a) for a in ETH_ADDR_RE.findall(text) if is_eth_address(a)]
    found += [("BTC-Like-transaction", t) for t in BTC_TX_RE.findall(text)]
    found += [("ETH-Like-transaction", t) for t in ETH_TX_RE.findall(text)]
    return found


def keywords(text: str, k: int = 16) -> list[str]:
    """Deterministic keyword ranker (TextRank stand-in): top-k tokens by
    frequency, ties broken by first appearance."""
    toks = [t.lower() for t in _TOKEN_RE.findall(text or "")]
    first_seen: dict[str, int] = {}
    for i, t in enumerate(toks):
        first_seen.setdefault(t, i)
    counts = Counter(toks)
    ranked = sorted(counts, key=lambda t: (-counts[t], first_seen[t]))
    return ranked[:k]


def summary(text: str, max_chars: int = 256) -> str:
    """Deterministic summary stand-in: leading clean text, whole tokens."""
    clean = " ".join((text or "").split())
    if len(clean) <= max_chars:
        return clean
    cut = clean[:max_chars]
    return cut[: cut.rfind(" ")] if " " in cut else cut
