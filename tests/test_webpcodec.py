"""VP8L (WebP lossless) codec pins: round trips over the encoder's
feature axes, plus HAND-BUILT bitstreams for the decode-only paths —
all 14 predictor modes with border rules, the color transform, color
indexing with pixel bundling, and meta-Huffman group selection."""

import struct

import numpy as np
import pytest

from blockchainspider_spark.functions import webpcodec as W


def _img(h, w, seed=0, colors=None):
    rng = np.random.default_rng(seed)
    if colors:
        pal = rng.integers(0, 256, (colors, 3), np.uint8)
        return pal[rng.integers(0, colors, (h, w))]
    return rng.integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("lz", [False, True])
@pytest.mark.parametrize("cb", [0, 4, 8])
@pytest.mark.parametrize("sg", [False, True])
def test_roundtrip_feature_matrix(lz, cb, sg):
    for dims, seed in [((1, 1), 1), ((5, 7), 2), ((16, 16), 3), ((31, 13), 4)]:
        px = _img(*dims, seed=seed)
        data = W.webp_encode(px, use_lz77=lz, cache_bits=cb, subtract_green=sg)
        assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"
        assert np.array_equal(W.webp_decode(data), px)


def test_lz77_and_cache_compress():
    base = _img(6, 8, seed=5, colors=4)
    px = np.repeat(np.repeat(base, 4, 0), 4, 1)
    rich = W.webp_encode(px, use_lz77=True, cache_bits=8)
    plain = W.webp_encode(px, use_lz77=False, cache_bits=0)
    assert np.array_equal(W.webp_decode(rich), px)
    assert len(rich) < len(plain) / 2


# ------------------------------------------------ hand-built streams


def _emit_entropy_image(bw, flat_argb, main):
    """Literal-only entropy-coded image with flat codes."""
    gs = {(p >> 8) & 0xFF for p in flat_argb}
    rs = {(p >> 16) & 0xFF for p in flat_argb}
    bs = {p & 0xFF for p in flat_argb}
    as_ = {(p >> 24) & 0xFF for p in flat_argb}
    bw.write(0, 1)                      # no color cache
    if main:
        bw.write(0, 1)                  # no meta-huffman
    g = W._write_huffman_code(bw, W._flat_lengths(gs, 256 + 24))
    r = W._write_huffman_code(bw, W._flat_lengths(rs, 256))
    b = W._write_huffman_code(bw, W._flat_lengths(bs, 256))
    a = W._write_huffman_code(bw, W._flat_lengths(as_, 256))
    W._write_huffman_code(bw, W._flat_lengths({0}, 40))
    for p in flat_argb:
        W._put_code(bw, g, (p >> 8) & 0xFF)
        W._put_code(bw, r, (p >> 16) & 0xFF)
        W._put_code(bw, b, p & 0xFF)
        W._put_code(bw, a, (p >> 24) & 0xFF)


def _wrap(bw):
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _argb_of(px):
    return ((0xFF << 24) | (px[..., 0].astype(np.uint32) << 16)
            | (px[..., 1].astype(np.uint32) << 8)
            | px[..., 2].astype(np.uint32))


def _forward_predict(px, modes_per_tile, bits):
    """Residuals a decoder must invert: run the decoder's own border +
    mode rules over the ORIGINAL pixels (decoded == original)."""
    h, w = px.shape[:2]
    canvas = np.zeros((h, w, 4), np.int32)
    canvas[..., 0] = 255
    canvas[..., 1:] = px
    res = np.zeros_like(canvas)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(canvas[y, x - 1])
            elif x == 0:
                pred = tuple(canvas[y - 1, x])
            else:
                mode = modes_per_tile[y >> bits][x >> bits]
                pred = W._predict(mode, canvas, x, y)
            res[y, x] = (canvas[y, x] - np.array(pred)) & 0xFF
    return ((res[..., 0].astype(np.uint32) << 24)
            | (res[..., 1].astype(np.uint32) << 16)
            | (res[..., 2].astype(np.uint32) << 8)
            | res[..., 3].astype(np.uint32))


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_all_modes(mode):
    px = _img(4, 4, seed=20 + mode)
    bits = 2                            # 4x4 tiles → one tile
    bw = W._BitWriter()
    bw.write(3, 14)
    bw.write(3, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)                      # transform present
    bw.write(0, 2)                      # PREDICTOR
    bw.write(bits - 2, 3)
    _emit_entropy_image(bw, [0xFF000000 | (mode << 8)], main=False)
    bw.write(0, 1)                      # no more transforms
    res = _forward_predict(px, [[mode]], bits)
    _emit_entropy_image(bw, [int(v) for v in res.reshape(-1)], main=True)
    assert np.array_equal(W.webp_decode(_wrap(bw)), px)


def test_predictor_transform_multi_tile():
    """Two tiles with different modes in one image — the tile-grid
    lookup itself is under test."""
    px = _img(4, 8, seed=50)
    bits = 2                            # tiles 2x1: modes 11 and 13
    modes = [[11, 13]]
    bw = W._BitWriter()
    bw.write(7, 14)
    bw.write(3, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(bits - 2, 3)
    _emit_entropy_image(
        bw, [0xFF000000 | (11 << 8), 0xFF000000 | (13 << 8)], main=False)
    bw.write(0, 1)
    res = _forward_predict(px, modes, bits)
    _emit_entropy_image(bw, [int(v) for v in res.reshape(-1)], main=True)
    assert np.array_equal(W.webp_decode(_wrap(bw)), px)


def test_color_transform():
    """Forward color transform (per spec §4.2) → decoder inverts it.
    Deltas include negatives (two's-complement bytes ≥ 128)."""
    px = _img(4, 4, seed=31)
    g2r, g2b, r2b = 5, 250, 17          # 250 ≡ -6
    bits = 2

    def sgn(v):
        return v - 256 if v >= 128 else v

    fwd = px.astype(np.int32).copy()
    for y in range(4):
        for x in range(4):
            r, g, b = (int(v) for v in px[y, x])
            r2 = (r - ((sgn(g2r) * sgn(g)) >> 5)) & 0xFF
            # the r2b term uses the ORIGINAL red (the inverse recovers
            # red before applying it, so both sides see the original)
            b2 = (b - ((sgn(g2b) * sgn(g)) >> 5)
                  - ((sgn(r2b) * sgn(r)) >> 5)) & 0xFF
            fwd[y, x] = (r2, g, b2)
    bw = W._BitWriter()
    bw.write(3, 14)
    bw.write(3, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(1, 2)                      # COLOR transform
    bw.write(bits - 2, 3)
    cte_px = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    _emit_entropy_image(bw, [cte_px], main=False)
    bw.write(0, 1)
    flat = [int(v) for v in _argb_of(fwd.astype(np.uint8)).reshape(-1)]
    _emit_entropy_image(bw, flat, main=True)
    assert np.array_equal(W.webp_decode(_wrap(bw)), px)


@pytest.mark.parametrize("n_colors,width_bits", [(2, 3), (4, 2), (12, 1), (40, 0)])
def test_color_indexing_with_bundling(n_colors, width_bits):
    """Palette transform incl. the ≤16-color pixel-bundling sub-widths;
    the palette itself is DELTA-coded across entries."""
    rng = np.random.default_rng(60 + n_colors)
    pal = rng.integers(0, 256, (n_colors, 3), np.uint8)
    h, w = 3, 11
    idx = rng.integers(0, n_colors, (h, w))
    px = pal[idx]
    # delta-code the palette
    pal_argb = [(0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
                for r, g, b in pal]
    deltas = []
    prev = 0
    for p in pal_argb:
        d = 0
        for sh in (24, 16, 8, 0):
            d |= (((p >> sh) - (prev >> sh)) & 0xFF) << sh
        deltas.append(d)
        prev = p
    # bundle indices into packed green bytes
    ppp = 1 << width_bits
    ibits = 8 >> width_bits
    pw = -(-w // ppp) if width_bits else w
    packed = np.zeros((h, pw), np.uint32)
    for y in range(h):
        for x in range(w):
            packed[y, x >> width_bits] |= idx[y, x] << (ibits * (x & (ppp - 1)))
    flat = [0xFF000000 | (int(v) << 8) for v in packed.reshape(-1)]
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(3, 2)                      # COLOR_INDEXING
    bw.write(n_colors - 1, 8)
    _emit_entropy_image(bw, deltas, main=False)
    bw.write(0, 1)
    _emit_entropy_image(bw, flat, main=True)
    assert np.array_equal(W.webp_decode(_wrap(bw)), px)


def test_meta_huffman_group_selection():
    """Two Huffman groups selected by the entropy image: left tile uses
    group 0, right tile group 1; each group's codes only cover its own
    half's symbols, so a wrong group lookup cannot decode."""
    h, w = 4, 16
    left = np.full((h, 8, 3), 10, np.uint8)
    right = np.full((h, 8, 3), 200, np.uint8)
    px = np.concatenate([left, right], axis=1)
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)                      # no transforms
    bw.write(0, 1)                      # no cache
    bw.write(1, 1)                      # meta-huffman present
    bw.write(0, 3)                      # huff_bits = 3 → 8px tiles
    # entropy image (2x1): group ids 0 and 1 in (red<<8)|green —
    # the id sits in the GREEN byte (bit 8), not blue
    _emit_entropy_image(bw, [0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)],
                        main=False)
    groups = []
    for val in (10, 200):
        g = W._write_huffman_code(bw, W._flat_lengths({val}, 256 + 24))
        r = W._write_huffman_code(bw, W._flat_lengths({val}, 256))
        b = W._write_huffman_code(bw, W._flat_lengths({val}, 256))
        a = W._write_huffman_code(bw, W._flat_lengths({255}, 256))
        W._write_huffman_code(bw, W._flat_lengths({0}, 40))
        groups.append((g, r, b, a))
    for y in range(h):
        for x in range(w):
            gi = 0 if x < 8 else 1
            val = 10 if x < 8 else 200
            g, r, b, a = groups[gi]
            W._put_code(bw, g, val)
            W._put_code(bw, r, val)
            W._put_code(bw, b, val)
            W._put_code(bw, a, 255)
    assert np.array_equal(W.webp_decode(_wrap(bw)), px)


def test_loud_gates():
    with pytest.raises(W.WebpError, match="RIFF"):
        W.webp_decode(b"nope")
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(W.WebpError, match="lossy"):
        W.webp_decode(lossy)
    with pytest.raises(W.WebpError, match="signature"):
        W.webp_decode(b"RIFF" + struct.pack("<I", 13) + b"WEBP"
                      + b"VP8L" + struct.pack("<I", 1) + b"\x00")
    with pytest.raises(W.WebpError):
        W.webp_encode(_img(2, 2).astype(np.int32))
