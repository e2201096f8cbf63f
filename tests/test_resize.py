"""bilinear_resize + resize_images(method=...) tests
(operators/multimodal.py)."""

import math

import numpy as np
import pytest

from blockchainspider_spark.operators.multimodal import (
    area_resize, bilinear_resize, resize_images,
)


def _ramp(w, h, base, ax, by):
    y, x = np.indices((h, w))
    return np.stack([base + ax * x + by * y] * 3, axis=-1).astype(np.uint8)


def test_bilinear_exact_on_linear_ramp():
    # bilinear interpolation of a linear function reproduces it exactly
    # at the (clamped) sample centers — an independent analytic oracle
    img = _ramp(15, 16, 20, 4, 3)
    out = bilinear_resize(img, 4, 6)
    for yo in range(6):
        for xo in range(4):
            sx = min(max((xo + 0.5) * (15 / 4) - 0.5, 0), 14)
            sy = min(max((yo + 0.5) * (16 / 6) - 0.5, 0), 15)
            want = math.floor(20 + 4 * sx + 3 * sy + 0.5)
            assert out[yo, xo, 0] == want, (xo, yo)
            assert out[yo, xo, 1] == out[yo, xo, 0]  # channels identical


def test_bilinear_upscale_edge_clamp():
    # 2x2 → 3x3 upscale: corner samples fall outside the pixel grid and
    # clamp to the border (sx = -1/6 → 0), the center interpolates all 4
    img = _ramp(2, 2, 10, 5, 7)
    out = bilinear_resize(img, 3, 3)
    centers = [0.0, 0.5, 1.0]  # clamped sample coords for 2→3
    for yo in range(3):
        for xo in range(3):
            want = math.floor(10 + 5 * centers[xo] + 7 * centers[yo] + 0.5)
            assert out[yo, xo, 0] == want


def test_bilinear_identity_at_same_size():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(bilinear_resize(img, 11, 9), img)


def test_bilinear_vs_area_on_constant_image():
    img = np.full((12, 10, 3), 137, np.uint8)
    assert np.array_equal(bilinear_resize(img, 5, 5), area_resize(img, 5, 5))
    assert (bilinear_resize(img, 5, 5) == 137).all()


def test_resize_images_method_param(spark):
    from blockchainspider_spark.functions.imagecodec import decode, png_encode

    img = _ramp(15, 16, 20, 4, 3)
    df = spark.createDataFrame(
        [("a", bytearray(png_encode(img)), "png")],
        "image_id string, bytes binary, fmt string")
    (row,) = resize_images(df, out_w=4, out_h=6, method="bilinear").collect()
    got = decode(bytes(row["bytes"]), "png")
    assert np.array_equal(got, bilinear_resize(img, 4, 6))
    (row_a,) = resize_images(df, out_w=4, out_h=6, method="area").collect()
    got_a = decode(bytes(row_a["bytes"]), "png")
    assert np.array_equal(got_a, area_resize(img, 4, 6))
    with pytest.raises(ValueError, match="unknown resize method"):
        resize_images(df, method="lanczos")
