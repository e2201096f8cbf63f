"""ICO (favicon) codec: PNG and DIB entry round trips, largest-entry
selection with the 0-means-256 rule, 24/8bpp DIB variants, loud gates."""

import struct

import numpy as np
import pytest

from blockchainspider_spark.functions import icocodec as I


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("fmt", ["png", "dib"])
def test_roundtrip_both_entry_formats(fmt):
    for dims in [(16, 16), (32, 32), (7, 13), (1, 1)]:
        px = _img(*dims, seed=dims[0])
        data = I.ico_encode(px, entry_format=fmt)
        assert data[:4] == b"\x00\x00\x01\x00"
        assert np.array_equal(I.ico_decode(data), px)


def test_largest_entry_selected_and_index_override():
    small, big = _img(16, 16, 1), _img(48, 48, 2)
    data = I.ico_encode([small, big], entry_format="png")
    assert np.array_equal(I.ico_decode(data), big)
    assert np.array_equal(I.ico_decode(data, index=0), small)
    assert [(w, h) for w, h, _, _ in I.ico_entries(data)] == [(16, 16), (48, 48)]


def test_zero_byte_means_256():
    px = _img(256, 256, 3)
    data = I.ico_encode(px, entry_format="dib")
    assert I.ico_entries(data)[0][:2] == (256, 256)
    assert np.array_equal(I.ico_decode(data), px)


def test_dib_24bpp_and_8bpp_palette_entries():
    """Hand-built classic entries: 24bpp stride-padded and 8bpp
    palette, both with the doubled-height header and AND mask."""
    px = _img(4, 3, 5)                  # w=3 → 24bpp stride padding
    bgr = px[::-1, :, ::-1]
    stride = (3 * 3 + 3) & ~3
    rows = b"".join(bgr[y].tobytes() + b"\x00" * (stride - 9) for y in range(4))
    hdr = struct.pack("<IiiHHIIiiII", 40, 3, 8, 1, 24, 0, 0, 0, 0, 0, 0)
    payload = hdr + rows + b"\x00" * 8
    ico = (struct.pack("<HHH", 0, 1, 1)
           + struct.pack("<BBBBHHII", 3, 4, 0, 0, 1, 24, len(payload), 22)
           + payload)
    assert np.array_equal(I.ico_decode(ico), px)

    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1, 0], [1, 0, 1]], np.uint8)
    quads = b"".join(bytes([c[2], c[1], c[0], 0]) for c in pal)
    stride = (3 + 3) & ~3
    rows = b"".join(idx[::-1][y].tobytes() + b"\x00" * (stride - 3)
                    for y in range(2))
    hdr = struct.pack("<IiiHHIIiiII", 40, 3, 4, 1, 8, 0, 0, 0, 0, 2, 0)
    payload = hdr + quads + rows
    ico = (struct.pack("<HHH", 0, 1, 1)
           + struct.pack("<BBBBHHII", 3, 2, 2, 0, 1, 8, len(payload), 22)
           + payload)
    assert np.array_equal(I.ico_decode(ico), pal[idx])


def test_loud_gates():
    with pytest.raises(I.IcoError, match="ICONDIR"):
        I.ico_decode(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)  # .cur
    with pytest.raises(I.IcoError, match="too short"):
        I.ico_decode(b"\x00\x00")
    with pytest.raises(I.IcoError, match="256"):
        I.ico_encode(_img(300, 10))
    data = I.ico_encode(_img(4, 4), entry_format="dib")
    with pytest.raises(I.IcoError, match="out of range"):
        I.ico_decode(data, index=5)


def test_sniff_and_auto_dispatch():
    from blockchainspider_spark.functions.imagecodec import decode, sniff_format

    px = _img(8, 8, 9)
    for fmt in ("png", "dib"):
        data = I.ico_encode(px, entry_format=fmt)
        assert sniff_format(data) == "ico"
        assert np.array_equal(decode(data, "auto"), px)
        assert np.array_equal(decode(data, "ico"), px)
