"""TIFF 6.0 codec pins: round trips across byte orders / compressions /
strip heights, the early-change LZW quirk, inline-SHORT byte layout,
photometric variants, and loud gates."""

import struct

import numpy as np
import pytest

from blockchainspider_spark.functions import tiffcodec as T


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_exact(comp, bo):
    for dims, rps in [((1, 1), 1), ((7, 5), 4), ((23, 31), 8), ((8, 64), 100)]:
        px = _img(*dims, seed=dims[0])
        data = T.tiff_encode(px, compression=comp, byte_order=bo,
                             rows_per_strip=rps)
        assert data[:2] == bo.encode()
        assert np.array_equal(T.tiff_decode(data), px)


def test_predictor_and_no_predictor_agree():
    px = _img(16, 16, seed=3)
    for comp in ("lzw", "packbits"):
        a = T.tiff_encode(px, compression=comp, predictor=True)
        b = T.tiff_encode(px, compression=comp, predictor=False)
        assert np.array_equal(T.tiff_decode(a), T.tiff_decode(b))
    with pytest.raises(T.TiffError, match="Predictor"):
        T.tiff_encode(px, compression="none", predictor=True)


def test_lzw_early_change_all_width_bumps():
    """A single big random strip pushes the LZW table through every
    width bump (9→10→11→12) and at least one mid-stream reset — the
    exact places the TIFF early-change off-by-one desyncs a decoder."""
    px = _img(200, 100, seed=7)
    data = T.tiff_encode(px, compression="lzw", rows_per_strip=200)
    assert np.array_equal(T.tiff_decode(data), px)
    # raw LZW kernel: byte-exact round trip on incompressible data
    rng = np.random.default_rng(9)
    blob = rng.integers(0, 256, 20000, np.uint8).tobytes()
    assert T._lzw_decode(T._lzw_encode(blob)) == blob


def test_compression_shrinks_runs():
    flat = np.full((16, 32, 3), 77, np.uint8)
    raw = len(T.tiff_encode(flat, compression="none"))
    assert len(T.tiff_encode(flat, compression="lzw")) < raw
    assert len(T.tiff_encode(flat, compression="packbits")) < raw


def test_packbits_kernel_spec_cases():
    """Spec shapes: literal runs, repeat runs, 128-byte clamps."""
    for blob in (b"", b"a", b"ab", b"a" * 300, b"ab" * 200,
                 bytes(range(256)) * 2, b"x" * 128 + b"yz"):
        enc = T._packbits_encode(blob)
        assert T._packbits_decode(enc, len(blob)) == blob


def test_inline_short_layout_big_endian():
    """The MM regression the first cut of this codec shipped: an inline
    SHORT must sit in the FIRST two bytes of the value field."""
    px = _img(4, 4, seed=1)
    data = T.tiff_encode(px, byte_order="MM", compression="none")
    (ifd_off,) = struct.unpack(">I", data[4:8])
    (n,) = struct.unpack(">H", data[ifd_off:ifd_off + 2])
    entries = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, _cnt = struct.unpack(">HHI", data[off:off + 8])
        entries[tag] = (typ, data[off + 8:off + 12])
    typ, raw = entries[284]            # PlanarConfig SHORT 1
    assert typ == 3 and raw == b"\x00\x01\x00\x00"


def test_gray_and_palette_photometrics_decode():
    """Hand-built gray (photometric 1) and palette (3, 16-bit ColorMap
    high byte) files — paths the encoder never writes, wild TIFFs do."""
    def build(photo, spp, strip, extra_tags=b"", extra_data=b""):
        fmt = "<"
        ntags = 9 + (1 if photo == 3 else 0)
        ifd_off = 8 + len(strip)
        ifd_len = 2 + 12 * ntags + 4
        out = bytearray(b"II" + struct.pack(fmt + "HI", 42, ifd_off))
        out += strip
        tags = [
            (256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, photo),
            (273, 4, 1, 8), (277, 3, 1, spp), (278, 4, 1, 2),
            (279, 4, 1, len(strip)),
        ]
        if photo == 3:
            tags.append((320, 3, 768, ifd_off + ifd_len))
        tags.sort()
        out += struct.pack(fmt + "H", len(tags))
        for tag, typ, cnt, val in tags:
            out += T._entry(fmt, tag, typ, cnt, val)
        out += struct.pack(fmt + "I", 0)
        out += extra_data
        return bytes(out)

    gray = build(1, 1, bytes([10, 20, 30, 40, 50, 60]))
    dec = T.tiff_decode(gray)
    assert dec.shape == (2, 3, 3)
    assert (dec[..., 0] == dec[..., 1]).all()
    assert dec[0, 0, 0] == 10 and dec[1, 2, 2] == 60

    cmap = struct.pack("<" + "H" * 768,
                       *([(i * 257) for i in range(256)] * 3))
    pal = build(3, 1, bytes([0, 1, 2, 3, 255, 128]), extra_data=cmap)
    dec = T.tiff_decode(pal)
    assert dec[0, 0, 0] == 0 and dec[1, 1, 0] == 255 and dec[1, 2, 1] == 128


def test_rgba_extra_sample_dropped():
    """4-sample RGB file: alpha is dropped like the PNG decoder does."""
    px = _img(2, 2, seed=4)
    rgba = np.dstack([px, np.full((2, 2), 200, np.uint8)])
    strip = rgba.tobytes()
    fmt = "<"
    ifd_off = 8 + len(strip)
    out = bytearray(b"II" + struct.pack(fmt + "HI", 42, ifd_off))
    out += strip
    tags = [(256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 1, 8),
            (277, 3, 1, 4), (278, 4, 1, 2), (279, 4, 1, len(strip))]
    out += struct.pack(fmt + "H", len(tags))
    for t in tags:
        out += T._entry(fmt, *t)
    out += struct.pack(fmt + "I", 0)
    assert np.array_equal(T.tiff_decode(bytes(out)), px)


def test_loud_gates():
    px = _img(4, 4)
    with pytest.raises(T.TiffError, match="header"):
        T.tiff_decode(b"NOPE")
    with pytest.raises(T.TiffError, match="BigTIFF"):
        T.tiff_decode(b"II" + struct.pack("<HI", 43, 8))
    data = bytearray(T.tiff_encode(px, compression="none"))
    # flip PlanarConfig to 2 in place
    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", bytes(data[ifd_off:ifd_off + 2]))
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack("<H", bytes(data[off:off + 2]))
        if tag == 284:
            data[off + 8] = 2
    with pytest.raises(T.TiffError, match="planar configuration 2"):
        T.tiff_decode(bytes(data))
    with pytest.raises(T.TiffError):
        T.tiff_encode(px.astype(np.int32))
