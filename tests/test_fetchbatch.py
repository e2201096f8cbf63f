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
