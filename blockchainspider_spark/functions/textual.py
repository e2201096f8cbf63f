"""Web-page text kernels: HTML strip, link extraction, entity regexes,
keyword/summary extraction (label-crawl pipeline, SURVEY S16/F9-F12).

Each kernel has one deterministic pure-Python core shared by the oracle
and the Arrow-batched pandas UDFs, so crawl outputs match bit-for-bit.
``keywords``/``summary`` implement the reference's actual algorithm —
TextRank (summa, web.py:36-37): PageRank power iteration over the token
co-occurrence graph for keywords, and over the sentence-similarity
graph for the summary, with deterministic iteration order and
first-appearance tiebreaks (summa's dict order is CPython-stable; ours
is explicit).
"""

from __future__ import annotations

import re
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


# compact English stopword set (summa filters stopwords before ranking)
_STOPWORDS = frozenset(
    "a an and are as at be but by for from has have if in into is it its of on "
    "or not no so such that the their then there these they this to was were "
    "will with we you your our his her him she he i me my".split()
)

_SENT_RE = re.compile(r"[.!?]+")


def _pagerank(n: int, edges: dict[tuple[int, int], float], d: float = 0.85,
              iters: int = 50) -> list[float]:
    """Deterministic PageRank power iteration over a weighted undirected
    graph given as {(i, j): w} with i < j. Plain-float arithmetic in
    fixed index order — bit-identical across engine and oracle."""
    out_w = [0.0] * n
    adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for (i, j), w in sorted(edges.items()):
        adj[i].append((j, w))
        adj[j].append((i, w))
        out_w[i] += w
        out_w[j] += w
    score = [1.0 / n] * n
    base = (1.0 - d) / n
    for _ in range(iters):
        nxt = [base] * n
        for i in range(n):
            if not out_w[i]:
                continue
            share = d * score[i] / out_w[i]
            for j, w in adj[i]:
                nxt[j] += share * w
        score = nxt
    return score


def keywords(text: str, k: int = 16, window: int = 2) -> list[str]:
    """TextRank keywords (reference: summa.keywords, web.py:36): PageRank
    over the token co-occurrence graph (stopwords removed, co-occurrence
    within ``window``), top-k by score with first-appearance tiebreak."""
    toks = [t.lower() for t in _TOKEN_RE.findall(text or "")]
    toks = [t for t in toks if t not in _STOPWORDS]
    if not toks:
        return []
    first_seen: dict[str, int] = {}
    for i, t in enumerate(toks):
        first_seen.setdefault(t, i)
    vocab = sorted(first_seen, key=first_seen.get)
    index = {t: i for i, t in enumerate(vocab)}
    edges: dict[tuple[int, int], float] = {}
    for pos in range(len(toks)):
        for off in range(1, window):
            if pos + off >= len(toks):
                break
            a, b = index[toks[pos]], index[toks[pos + off]]
            if a == b:
                continue
            key = (a, b) if a < b else (b, a)
            edges[key] = edges.get(key, 0.0) + 1.0
    if not edges:
        ranked = sorted(vocab, key=lambda t: first_seen[t])
        return ranked[:k]
    score = _pagerank(len(vocab), edges)
    ranked = sorted(vocab, key=lambda t: (-round(score[index[t]], 12), first_seen[t]))
    return ranked[:k]


def _sentence_tokens(sent: str) -> set[str]:
    return {t.lower() for t in _TOKEN_RE.findall(sent)} - _STOPWORDS


def summary(text: str, max_chars: int = 256) -> str:
    """TextRank summary (reference: summa.summarize, web.py:37): PageRank
    over the sentence-similarity graph (token overlap normalized by log
    lengths), then the top-scoring sentences in original order up to the
    character budget."""
    import math

    clean = " ".join((text or "").split())
    if len(clean) <= max_chars:
        return clean
    sents = [s.strip() for s in _SENT_RE.split(clean) if s.strip()]
    if len(sents) < 2:
        cut = clean[:max_chars]
        return cut[: cut.rfind(" ")] if " " in cut else cut
    tok_sets = [_sentence_tokens(s) for s in sents]
    edges: dict[tuple[int, int], float] = {}
    for i in range(len(sents)):
        for j in range(i + 1, len(sents)):
            overlap = len(tok_sets[i] & tok_sets[j])
            if not overlap:
                continue
            denom = math.log(max(len(tok_sets[i]), 2)) + math.log(max(len(tok_sets[j]), 2))
            edges[(i, j)] = overlap / denom
    if edges:
        score = _pagerank(len(sents), edges)
    else:
        score = [1.0] * len(sents)
    order = sorted(range(len(sents)),
                   key=lambda i: (-round(score[i], 12), i))
    chosen: list[int] = []
    used = 0
    for i in order:
        cost = len(sents[i]) + (1 if chosen else 0)
        if used + cost > max_chars:
            continue
        chosen.append(i)
        used += cost
    if not chosen:
        cut = clean[:max_chars]
        return cut[: cut.rfind(" ")] if " " in cut else cut
    return " ".join(sents[i] for i in sorted(chosen))
