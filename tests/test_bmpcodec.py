"""BMP codec pins: lossless round-trips, hand-built top-down and
palette files (independent of the encoder), loud gates, payload
dispatch."""

import struct

import numpy as np
import pytest

from blockchainspider_spark.functions.bmpcodec import BmpError, bmp_decode, bmp_encode


def test_bmp_roundtrip_exact():
    """24bpp is lossless; widths 1/3/5 exercise every stride-padding
    residue, plus non-square and single-color."""
    rng = np.random.default_rng(13)
    for h, w in [(1, 1), (7, 3), (4, 5), (24, 31), (16, 16)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        assert (bmp_decode(bmp_encode(img)) == img).all(), (h, w)
    mono = np.full((6, 6, 3), 201, np.uint8)
    assert (bmp_decode(bmp_encode(mono)) == mono).all()


def test_bmp_header_fields():
    img = np.zeros((2, 3, 3), np.uint8)
    data = bmp_encode(img)
    assert data[:2] == b"BM"
    (offset,) = struct.unpack_from("<I", data, 10)
    assert offset == 54
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    assert (hdr_size, w, h, planes, bpp, comp) == (40, 3, 2, 1, 24, 0)
    (size,) = struct.unpack_from("<I", data, 2)
    assert size == len(data)


def test_bmp_top_down_negative_height():
    """Hand-build a top-down file from the bottom-up encoding: negate
    the height field and reverse the stride-padded row blocks — decode
    must return the same image either way."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (5, 3, 3), np.uint8)  # w=3 → stride 12, padded
    data = bytearray(bmp_encode(img))
    h, w = 5, 3
    stride = (w * 3 + 3) & ~3
    struct.pack_into("<i", data, 14 + 8, -h)
    rows = np.frombuffer(bytes(data[54:]), np.uint8).reshape(h, stride)
    data[54:] = rows[::-1].tobytes()
    assert (bmp_decode(bytes(data)) == img).all()


def test_bmp_8bpp_palette_hand_built():
    """Hand-built 8bpp palette file (nothing shared with the encoder):
    4-color palette, w=5 (stride 8), bottom-up index rows."""
    pal_rgb = np.array(
        [[10, 20, 30], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3, 0], [1, 1, 2, 2, 3], [3, 0, 0, 1, 2]], np.uint8)
    h, w, n_colors = 3, 5, 4
    stride = (w + 3) & ~3
    offset = 14 + 40 + 4 * n_colors
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    pix = rows.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pix), 2835, 2835, n_colors, 0
    )
    quads = b"".join(bytes([b, g, r, 0]) for r, g, b in pal_rgb.tolist())
    data = (
        b"BM" + struct.pack("<IHHI", offset + len(pix), 0, 0, offset)
        + info + quads + pix
    )
    assert (bmp_decode(data) == pal_rgb[idx]).all()


def test_bmp_loud_gates():
    img = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(BmpError, match="not a BMP"):
        bmp_decode(b"PNG nope")
    data = bytearray(bmp_encode(img))
    struct.pack_into("<H", data, 14 + 14, 16)  # 16bpp
    with pytest.raises(BmpError, match="bitcount 16"):
        bmp_decode(bytes(data))
    data = bytearray(bmp_encode(img))
    struct.pack_into("<I", data, 14 + 16, 1)  # BI_RLE8
    with pytest.raises(BmpError, match="compression 1"):
        bmp_decode(bytes(data))
    with pytest.raises(BmpError, match="expected uint8"):
        bmp_encode(np.zeros((2, 2), np.uint8))
    data = bytes(bmp_encode(img))[:-5]  # truncated pixel data
    with pytest.raises(BmpError, match="short"):
        bmp_decode(data)


def test_bmp_through_payload_dispatch_and_features(spark):
    """fmt='bmp' flows through imagecodec.decode and image_features."""
    import pandas as pd

    from blockchainspider_spark.operators.multimodal import image_features

    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    img = pal[np.indices((8, 8)).sum(axis=0) % 2]  # checkerboard
    pdf = pd.DataFrame({
        "image_id": ["b1"], "bytes": [bmp_encode(img)], "fmt": ["bmp"],
    })
    out = image_features(spark.createDataFrame(pdf)).collect()[0]
    assert (out.w, out.h) == (8, 8)
    assert out.mean_r == pytest.approx(img[..., 0].mean())
    assert out.mean_b == pytest.approx(img[..., 2].mean())
