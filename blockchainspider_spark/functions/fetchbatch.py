"""Batch-vectorized synthetic fetch kernel (guide §4.2: hand whole Arrow
batches to vectorized numpy instead of looping rows in Python).

``synth_fetch_batch(keys)`` computes, for a batch of URL keys, exactly
what the scalar path computes per key —

    px  = fixtures.generators._pixels_for(key, 16, 16)
    dec = imagecodec.qjpeg_decode(imagecodec.qjpeg_encode(px))
    ph  = imagecodec.phash64(dec)
    ok  = imagecodec.psnr(px, dec) >= 40.0

— with the per-key Python/numpy fixed costs amortized across the batch:

* the trig-surface bases are gathered for the whole batch with one
  ``np.take`` per channel (same table entries as ``_pixels_for`` — the
  tables themselves are shared, so values are identical by construction);
* clip/quantize/gray/mesh-resample/DCT/median/packbits run as single
  batched numpy ops over an (N, 16, 16, 3) block;
* the genuinely per-key parts stay per-key: the seeded PCG64 noise
  stream (a per-key rng stream by contract) and the zlib codec
  round-trip (per-payload by nature).

Bit-exactness is pinned by tests/test_fetchbatch.py: every batched op is
an elementwise twin of the scalar op (clip, +, &, |) or a per-slice
reduction over the same contiguous values in the same order (mean along
the trailing axes, gemm per (32,32) slice, partition along the last
axis), so phash bits and PSNR booleans match the scalar path exactly.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

from numpy.random.bit_generator import ISeedSequence

from blockchainspider_spark.fixtures.generators import _trig_tables
from blockchainspider_spark.functions.imagecodec import _DCT32, _GRAY_W, _QJPEG_MAGIC

_BATCH_TABS: dict = {}


class _PreSeededSS(ISeedSequence):
    """Carries a precomputed ``SeedSequence.generate_state(4, uint64)``
    result into ``PCG64`` so per-key generator construction skips the
    (per-key, ~12 µs) entropy-mixing pass — the mixing itself runs
    batched in ``_seed_words_batch``. Bit-identical by construction:
    PCG64 consumes exactly these four words either way."""

    __slots__ = ("_w",)

    def __init__(self, w):
        self._w = w

    def generate_state(self, n_words, dtype=np.uint32):
        return self._w


# SeedSequence pool-mixing constants (numpy bit_generator, stable spec)
_SS_INIT_A = np.uint32(0x43B0D7E5)
_SS_MULT_A = np.uint32(0x931E8875)
_SS_INIT_B = np.uint32(0x8B51F9DD)
_SS_MULT_B = np.uint32(0x58F38DED)
_SS_MIX_L = np.uint32(0xCA01F9DD)
_SS_MIX_R = np.uint32(0x4973F715)
_SS_XSHIFT = np.uint32(16)


def _seed_words_batch(seeds: np.ndarray) -> np.ndarray:
    """(N,) uint64 seeds → (N, 4) uint64 == ``SeedSequence(s).
    generate_state(4, uint64)`` per row, the entropy-mix vectorized
    across keys (every op is elementwise uint32 arithmetic). Seeds below
    2**32 fall back to the scalar SeedSequence (their entropy is ONE
    32-bit word, not two, which changes the mix input length); with
    sha256-derived seeds that is a 2**-32 tail, but bit-exactness is the
    contract (pinned in tests/test_fetchbatch.py)."""
    seeds = np.asarray(seeds, np.uint64)
    n = len(seeds)
    lo = (seeds & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (seeds >> np.uint64(32)).astype(np.uint32)
    out = np.empty((n, 4), np.uint64)
    with np.errstate(over="ignore"):
        pool = np.zeros((4, n), np.uint32)
        hc = _SS_INIT_A

        def _hash(v, hc):
            v = v ^ hc
            hc = hc * _SS_MULT_A
            v = v * hc
            v ^= v >> _SS_XSHIFT
            return v, hc

        ent = (lo, hi)
        for i in range(4):
            src = ent[i] if i < 2 else np.zeros(n, np.uint32)
            pool[i], hc = _hash(src, hc)
        for i_src in range(4):
            for i_dst in range(4):
                if i_src != i_dst:
                    h, hc = _hash(pool[i_src].copy(), hc)
                    r = pool[i_dst] * _SS_MIX_L - h * _SS_MIX_R
                    pool[i_dst] = r ^ (r >> _SS_XSHIFT)
        o32 = np.empty((8, n), np.uint32)
        hcb = _SS_INIT_B
        for i in range(8):
            v = pool[i % 4].copy()
            v ^= hcb
            hcb = hcb * _SS_MULT_B
            v = v * hcb
            o32[i] = v ^ (v >> _SS_XSHIFT)
    o = o32.astype(np.uint64)
    for j in range(4):
        out[:, j] = o[2 * j] | (o[2 * j + 1] << np.uint64(32))
    small = seeds < np.uint64(1 << 32)
    if small.any():
        for i in np.flatnonzero(small):
            out[i] = np.random.SeedSequence(int(seeds[i])).generate_state(
                4, np.uint64)
    return out


def _batch_tables(w: int, h: int) -> dict:
    """Stack the per-(w,h) trig surfaces into dense arrays for batched
    gather. Entries ARE the `_trig_tables` arrays (no recomputation), so
    values match `_pixels_for` bit-for-bit."""
    tabs = _BATCH_TABS.get((w, h))
    if tabs is None:
        t = _trig_tables(w, h)
        ch0 = np.stack([t["ch0"][(a, b)] for a in range(3, 8) for b in range(3, 8)])
        ch1 = np.stack([t["ch1"][c] for c in range(4, 9)])
        tabs = {"ch0": ch0, "ch1": ch1, "ch2": np.zeros((256, h, w)),
                "ch2_have": np.zeros(256, dtype=bool), "xy": t["xy"], "src": t}
        _BATCH_TABS[(w, h)] = tabs
    return tabs


def _pixels_batch(keys, w: int = 16, h: int = 16) -> np.ndarray:
    """(N, h, w, 3) uint8 — row i == _pixels_for(keys[i], w, h)."""
    t = _batch_tables(w, h)
    n = len(keys)
    digs = [hashlib.sha256(str(k).encode()).digest() for k in keys]
    d0 = np.empty(n, np.intp)
    d1 = np.empty(n, np.intp)
    d2 = np.empty(n, np.intp)
    for i, d in enumerate(digs):
        d0[i] = (d[0] % 5) * 5 + d[1] % 5
        d1[i] = d[2] % 5
        d2[i] = d[3]
        if not t["ch2_have"][d[3]]:
            # same lazy per-divisor fill (and the same float expression)
            # as _pixels_for's ch2 cache — shared via the source tables
            ch2 = t["src"]["ch2"].get(d[3])
            if ch2 is None:
                ch2 = np.cos(t["xy"] / (97 + d[3])) * 60 + 128
                t["src"]["ch2"][d[3]] = ch2
            t["ch2"][d[3]] = ch2
            t["ch2_have"][d[3]] = True
    base = np.empty((n, h, w, 3), np.float64)
    base[..., 0] = t["ch0"][d0]
    base[..., 1] = t["ch1"][d1]
    base[..., 2] = t["ch2"][d2]
    # per-key seeded PCG64 noise streams (the per-key rng contract). The
    # SeedSequence entropy mix — formerly ~half the per-key cost — runs
    # batched; per key only the PCG64/Generator wrappers (sub-µs) and
    # the stream draw itself remain. Values are bit-identical: PCG64
    # consumes the same four seed words either way.
    words = _seed_words_batch(
        np.array([int.from_bytes(d[:8], "big") for d in digs], np.uint64))
    noise = np.empty((n, h, w, 3), np.float64)
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(_PreSeededSS(words[i])))
        noise[i] = rng.normal(0, 6, (h, w, 3))
    base += noise
    np.clip(base, 0, 255, out=base)
    return base.astype(np.uint8)


_D8 = np.ascontiguousarray(_DCT32[:8])   # the 8 DCT rows the hash reads


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """int64[N] — row i == phash64(pixels[i]). Same gray weights, mesh,
    DCT matrices, 31st-order-statistic median and MSB-first packing.

    numpy's broadcasted 3-D matmul takes a slow non-GEMM path for a
    (32,32) @ (N,32,32) stack (measured 110 µs/row), so the two DCT
    products run as large 2-D GEMMs over reshaped views — in the scalar
    path's association order (DCT @ small first, then @ DCT.T),
    bit-identical per test_fetchbatch. Two r7c refinements, both
    value-preserving:

    * only the top-left 8×8 of ``freq`` feeds the hash, and every
      ``freq[:8,:8]`` element depends on DCT rows 0-7 alone — computing
      with ``_DCT32[:8]`` drops 6.4× of the GEMM flops while each
      surviving output element remains the exact same k-ordered dot
      product (row/column subsetting does not reorder accumulation;
      bit-equality is pinned against the scalar path in
      tests/test_fetchbatch.py);
    * the mesh gather lands directly in the TRANSPOSED layout the first
      GEMM wants (one fancy-index with a transposed index vector),
      eliminating the 33 MB ``ascontiguousarray(small.T)`` copy that
      profiled as large as the gather itself."""
    n, h, w, _ = pixels.shape
    # gray from the uint8 channel slices directly (uint8→float64 widening
    # per element is exact; same left-to-right expression as the scalar)
    gray = (
        pixels[..., 0] * _GRAY_W[0] + pixels[..., 1] * _GRAY_W[1]
    ) + pixels[..., 2] * _GRAY_W[2]
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    flat_idx = (ys[:, None] * w + xs).ravel()
    # gather straight into small.T per image: index vector transposed
    idx_t = flat_idx.reshape(32, 32).T.ravel()
    small_t = gray.reshape(n, h * w)[:, idx_t]          # (N, 32*32), C-order
    # a = D8 @ small[i]  (via a.T = small[i].T @ D8.T)
    a = (small_t.reshape(n * 32, 32) @ _D8.T).reshape(n, 32, 8).transpose(0, 2, 1)
    # freq[:8,:8] = a @ D8.T
    freq = (np.ascontiguousarray(a).reshape(n * 8, 32) @ _D8.T).reshape(n, 8, 8)
    block = freq.reshape(n, 64)[:, 1:]
    med = np.partition(block, 31, axis=1)[:, 31]
    bits = block > med[:, None]
    packed = np.packbits(bits, axis=1)          # (N, 8) MSB-first over 63 bits
    vals = packed.copy().view(">u8").reshape(n) >> 1
    return vals.astype(np.int64)


def psnr_ok_batch(ref: np.ndarray, dec: np.ndarray, floor: float = 40.0) -> np.ndarray:
    """bool[N] — row i == (psnr(ref[i], dec[i]) >= floor). Same mean-of-
    squares per image (contiguous trailing-axis reduction)."""
    diff = ref.astype(np.float64) - dec.astype(np.float64)
    n = diff.shape[0]
    mse = np.mean(diff.reshape(n, -1) ** 2, axis=1)
    out = np.empty(n, dtype=bool)
    inf = mse == 0
    out[inf] = True
    nz = ~inf
    out[nz] = 10.0 * np.log10(255.0 * 255.0 / mse[nz]) >= floor
    return out


# rows per internal block: sized so a block's float64 intermediates stay
# cache-resident per core under 32-way task parallelism (whole-batch
# processing loses ~2.5x to shared L3/DRAM contention; row-at-a-time
# loses ~2.5x to numpy call overhead). Re-tuned for r7c's slimmer phash
# working set (8-row DCT, no 33 MB transpose copy): a 32-process
# contention sweep measured 110/106/89/99/98 µs/url at block sizes
# 32/64/128/256/1024 — 128 wins.
_BLOCK = 128


def synth_fetch_batch(keys) -> tuple[np.ndarray, np.ndarray]:
    """(phash int64[N], psnr_ok bool[N]) for a batch of URL keys — the
    steady-state fetch stage's per-URL work (synthesize → lossy encode →
    decode → phash → PSNR gate), batch-vectorized in cache-sized blocks."""
    n = len(keys)
    ph = np.empty(n, np.int64)
    ok = np.empty(n, bool)
    header = _QJPEG_MAGIC + struct.pack(">HHB", 16, 16, 2)
    for s in range(0, n, _BLOCK):
        block = keys[s:s + _BLOCK]
        px = _pixels_batch(block, 16, 16)
        # qjpeg step-2 quantization, batched (elementwise twin of
        # qjpeg_encode's hot path) ...
        q = (px & np.uint8(0xFE)) | np.uint8(1)
        # ... but the codec round-trip itself stays real and per-payload:
        # every image's bytes go through header pack + zlib deflate/
        # inflate, exactly as qjpeg_encode/qjpeg_decode do.
        dec = np.empty_like(q)
        flat = dec.reshape(len(block), -1)
        for i in range(len(block)):
            data = header + zlib.compress(q[i].tobytes(), 6)
            assert data[:4] == _QJPEG_MAGIC
            flat[i] = np.frombuffer(zlib.decompress(data[9:]), np.uint8)
        ph[s:s + len(block)] = phash64_batch(dec)
        ok[s:s + len(block)] = psnr_ok_batch(px, dec)
    return ph, ok
