"""Deterministic synthetic fixtures (pure functions of seed + scale).

Tables per FIXTURES.md: ``edges`` (account-transfer graph, ≅
AccountTransferItem, reference items/subgraph.py:18-31), ``images``
(payload table from BASELINE.json input_hint) and ``web_pages``
(label-crawl page graph). Generators use numpy only — no network, no
randomness outside the seeded Generator — so oracle and engine read
byte-identical inputs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from blockchainspider_spark.functions.imagecodec import (
    phash64,
    png_encode,
    psnr,
)
from blockchainspider_spark.functions.jpegcodec import jpeg_decode, jpeg_encode

EDGE_COLUMNS = [
    "id", "hash", "address_from", "address_to", "value", "token_id",
    "timestamp", "block_number", "contract_address", "symbol", "decimals",
    "gas", "gas_price",
]


def node_address(idx: int) -> str:
    """Deterministic lowercase 0x-address for node #idx."""
    return "0x" + hashlib.sha1(f"node-{idx}".encode()).hexdigest()[:40]


def transfer_id(from_, to, value, tx_hash, trace_id, symbol, contract, token_id) -> str:
    """sha1 over '_'-joined identity fields (reference external.py:124-131)."""
    key = "_".join([from_, to, str(value), tx_hash, str(trace_id), symbol, contract, token_id])
    return hashlib.sha1(key.encode()).hexdigest()


def make_edges(
    n_nodes: int = 60,
    n_edges: int = 400,
    seed: int = 42,
    n_symbols: int = 3,
    multi_leg_frac: float = 0.25,
) -> pd.DataFrame:
    """Scale-free-ish transfer digraph. ``multi_leg_frac`` of edges share a
    tx hash with the previous edge (multi-leg swaps for TTRRedirect)."""
    rng = np.random.default_rng(seed)
    addrs = [node_address(i) for i in range(n_nodes)]

    # preferential-attachment-flavored endpoints: low indexes are hubs
    raw = rng.zipf(1.6, size=(n_edges, 2))
    src_i = np.minimum(raw[:, 0] - 1, n_nodes - 1)
    dst_i = np.minimum(raw[:, 1] - 1, n_nodes - 1)
    dst_i = np.where(src_i == dst_i, (dst_i + 1) % n_nodes, dst_i)

    ts = np.sort(rng.integers(1_600_000_000, 1_700_000_000, n_edges))
    blocks = 15_000_000 + (ts - 1_600_000_000) // 12
    values = np.round(np.exp(rng.normal(2.0, 1.5, n_edges)), 6)

    sym_i = rng.integers(0, n_symbols, n_edges)
    symbols = [f"TOK{k}" if k else "native" for k in sym_i]
    contracts = [
        "0x" + hashlib.sha1(f"contract-{k}".encode()).hexdigest()[:40] if k else "0x" + "0" * 40
        for k in sym_i
    ]

    share_prev = rng.random(n_edges) < multi_leg_frac
    rows = []
    tx_hash = ""
    for i in range(n_edges):
        if i == 0 or not share_prev[i]:
            tx_hash = "0x" + hashlib.sha1(f"tx-{seed}-{i}".encode()).hexdigest()
        frm, to = addrs[src_i[i]], addrs[dst_i[i]]
        val = f"{values[i]:.6f}"
        sym, contract = symbols[i], contracts[i]
        rows.append({
            "id": transfer_id(frm, to, val, tx_hash, 0, sym, contract, ""),
            "hash": tx_hash,
            "address_from": frm,
            "address_to": to,
            "value": val,
            "token_id": "",
            "timestamp": int(ts[i]),
            "block_number": int(blocks[i]),
            "contract_address": contract,
            "symbol": sym,
            "decimals": 18,
            "gas": str(int(rng.integers(21_000, 300_000))),
            "gas_price": str(int(rng.integers(1, 200)) * 10**9),
        })
    df = pd.DataFrame(rows, columns=EDGE_COLUMNS)
    # multi-leg rows share a tx but must keep distinct ids
    df = df.drop_duplicates("id").reset_index(drop=True)
    return df


_TRIG_CACHE: dict = {}


def _trig_tables(w: int, h: int) -> dict:
    """The per-key image bases reuse a handful of fixed trig surfaces
    (divisors span ≤5 values each); caching them per (w, h) cuts the
    synthetic-fetch kernel's per-URL cost ~3× with BIT-IDENTICAL output
    (same float ops in the same order — fixture bytes are pinned by
    tests and the PSNR invariants)."""
    tabs = _TRIG_CACHE.get((w, h))
    if tabs is None:
        yy, xx = np.mgrid[0:h, 0:w]
        sinx = {c: np.sin(xx / c) for c in range(3, 8)}
        cosy = {c: np.cos(yy / c) for c in range(3, 8)}
        tabs = {
            # fully scaled channel surfaces, keyed by the digest-derived
            # divisor(s): ch0 has 25 variants, ch1 has 5, ch2 caches its
            # 256 possible divisors lazily below
            "ch0": {(a, b): (sinx[a] + cosy[b]) * 60 + 128
                    for a in range(3, 8) for b in range(3, 8)},
            "ch1": {c: np.sin((xx + yy) / c) * 60 + 128 for c in range(4, 9)},
            "ch2": {},
            "xy": xx * yy,
        }
        _TRIG_CACHE[(w, h)] = tabs
    return tabs


def _pixels_for(key: str, w: int, h: int) -> np.ndarray:
    """Deterministic smooth-ish RGB image derived from the key."""
    digest = hashlib.sha256(key.encode()).digest()
    local = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    t = _trig_tables(w, h)
    ch2 = t["ch2"].get(digest[3])
    if ch2 is None:
        ch2 = np.cos(t["xy"] / (97 + digest[3])) * 60 + 128
        t["ch2"][digest[3]] = ch2
    base = np.stack(
        [
            t["ch0"][(3 + digest[0] % 5, 3 + digest[1] % 5)],
            t["ch1"][4 + digest[2] % 5],
            ch2,
        ],
        axis=-1,
    )
    noise = local.normal(0, 6, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def make_images(
    image_ids: list[str] | None = None,
    n_images: int = 60,
    seed: int = 42,
    n_hosts: int = 8,
    hot_host_frac: float = 0.4,
    size: tuple[int, int] = (24, 24),
) -> pd.DataFrame:
    """Payload table (image_id, bytes, w, h, fmt, caption, phash).

    ``image_id`` doubles as the canonical URL: ``img://host-<b>/<name>``,
    where the host bucket drives politeness partitioning; bucket 0 is
    deliberately hot (skew-handling tests, SURVEY §4).
    """
    if image_ids is None:
        image_ids = [node_address(i) for i in range(n_images)]
    rng = np.random.default_rng(seed + 1)
    w, h = size
    rows = []
    for i, name in enumerate(image_ids):
        bucket = 0 if rng.random() < hot_host_frac else int(rng.integers(1, n_hosts))
        image_id = f"img://host-{bucket}/{name}"
        pixels = _pixels_for(image_id, w, h)
        fmt = "jpeg" if rng.random() < 0.5 else "png"
        # quality 98: the sigma-6 fixture noise costs real JPEG ~43 dB
        # here - lossy, yet safely above the >=40 dB payload invariant
        data = jpeg_encode(pixels, quality=98) if fmt == "jpeg" else png_encode(pixels)
        decoded = jpeg_decode(data) if fmt == "jpeg" else pixels
        assert fmt == "png" or psnr(pixels, decoded) >= 40.0
        rows.append({
            "image_id": image_id,
            "bytes": data,
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": f"caption of {name} #{i}: "
                       + hashlib.sha256(f"cap-{name}".encode()).hexdigest()[:16],
            "phash": phash64(decoded),
            "node": name,  # join key back to the edge graph
        })
    return pd.DataFrame(rows)


def btc_address(idx: int, valid: bool = True) -> str:
    """Deterministic base58check P2PKH address for fixture #idx; with
    ``valid=False`` the checksum bytes are corrupted — a planted negative
    the extractor must reject (reference validates via bitcoin.is_address)."""
    raw = b"\x00" + hashlib.sha1(f"btc-{idx}".encode()).digest()
    checksum = hashlib.sha256(hashlib.sha256(raw).digest()).digest()[:4]
    if not valid:
        checksum = bytes(b ^ 0xFF for b in checksum)
    n = int.from_bytes(raw + checksum, "big")
    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(alphabet[r])
    # base58check encodes EACH leading zero byte of (version+hash160) as
    # one '1' — hardcoding a single '1' would make any payload whose
    # hash160 starts with 0x00 (~1/256 per idx) one byte short and turn
    # a planted positive into a gate flake
    n_zeros = len(raw + checksum) - len((raw + checksum).lstrip(b"\x00"))
    return "1" * n_zeros + "".join(reversed(out))


def make_web_pages(n_pages: int = 40, seed: int = 42, n_hosts: int = 4) -> pd.DataFrame:
    """Synthetic page graph with messy URLs (exercise canonicalization),
    embedded ETH/BTC entities — including checksum-broken BTC negatives
    the validator must drop — and relative + absolute hrefs."""
    rng = np.random.default_rng(seed + 2)
    hosts = [f"Host{k}.Example.COM" for k in range(n_hosts)]
    urls = []
    for i in range(n_pages):
        host = hosts[int(rng.integers(0, n_hosts))]
        noise = "&b=2&a=1" if i % 2 else "?a=1&b=2"
        frag = "#frag" if i % 3 == 0 else ""
        urls.append(f"http://{host}/page/{i}{noise if i % 2 == 0 else ''}{frag}")
    rows = []
    for i, url in enumerate(urls):
        k = int(rng.integers(2, 5))
        link_idx = rng.integers(0, n_pages, k)
        links = []
        for li in link_idx:
            if rng.random() < 0.5:
                links.append(f'<a href="/page/{li}">rel</a>')
            else:
                links.append(f'<a href="{urls[li]}">abs</a>')
        eth = "0x" + hashlib.sha1(f"eth-{i}".encode()).hexdigest()[:40]
        btc = btc_address(i, valid=(i % 2 == 0))  # odd pages: broken checksum
        html = (
            "<html><style>p {}</style><script>var x=1;</script>"
            f"<p>report address {eth} or {btc} and tx "
            f"0x{hashlib.sha256(str(i).encode()).hexdigest()}</p>"
            + "".join(links)
            + "</html>"
        )
        rows.append({
            "url": url,
            "html": html,
            "host": url.split("/")[2],
            "depth_hint": -1,
        })
    return pd.DataFrame(rows)
