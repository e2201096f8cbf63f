"""Bit-exact parity of the r7 batch-vectorized fetch kernel
(functions/fetchbatch.py) against the scalar payload path it replaces in
tools/bench_scaling.fetch_kernel."""

import numpy as np

from blockchainspider_spark.fixtures.generators import _pixels_for
from blockchainspider_spark.functions.fetchbatch import (
    _pixels_batch,
    phash64_batch,
    psnr_ok_batch,
    synth_fetch_batch,
)
from blockchainspider_spark.functions.imagecodec import (
    phash64,
    psnr,
    qjpeg_decode,
    qjpeg_encode,
)

KEYS = [f"u{i}" for i in range(257)] + ["img://host-3/x.png", "", "émoji-☃"]


def test_pixels_batch_bit_identical():
    batch = _pixels_batch(KEYS, 16, 16)
    for i, k in enumerate(KEYS):
        assert np.array_equal(batch[i], _pixels_for(k, 16, 16)), k


def test_synth_fetch_batch_matches_scalar_pipeline():
    ph, ok = synth_fetch_batch(KEYS)
    assert ph.dtype == np.int64 and ok.dtype == np.bool_
    for i, k in enumerate(KEYS):
        px = _pixels_for(k, 16, 16)
        dec = qjpeg_decode(qjpeg_encode(px))
        assert ph[i] == phash64(dec), k
        assert ok[i] == (psnr(px, dec) >= 40.0), k


def test_seed_words_batch_matches_seedsequence():
    # the vectorized SeedSequence mix must be bit-identical to numpy's,
    # including the sub-2**32 seeds that take the scalar fallback (their
    # entropy is one 32-bit word, which changes the mix input length)
    from blockchainspider_spark.functions.fetchbatch import _seed_words_batch

    rng = np.random.default_rng(11)
    seeds = np.concatenate([
        rng.integers(1 << 32, 1 << 63, 64, dtype=np.uint64),
        np.array([0, 1, 5, (1 << 32) - 1, 1 << 32, (1 << 64) - 1], np.uint64),
    ])
    got = _seed_words_batch(seeds)
    for i, s in enumerate(seeds):
        ref = np.random.SeedSequence(int(s)).generate_state(4, np.uint64)
        assert np.array_equal(got[i], ref), s


def test_phash_and_psnr_batch_on_odd_sizes():
    # the batched helpers must stay exact off the 16x16 hot path too
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (5, 24, 24, 3), dtype=np.uint8)
    ref = imgs.copy()
    ref[0] = imgs[0]          # identical pair → psnr inf → ok
    got = phash64_batch(imgs)
    okb = psnr_ok_batch(ref, imgs)
    for i in range(len(imgs)):
        assert got[i] == phash64(imgs[i])
        assert okb[i] == (psnr(ref[i], imgs[i]) >= 40.0)
