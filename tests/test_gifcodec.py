"""GIF codec pins: spec byte vectors, lossless round-trips, loud gates."""

import numpy as np
import pytest

from blockchainspider_spark.functions.gifcodec import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
)


def test_lzw_known_vector_1x1():
    """The classic 1×1 vector: mcs=2, codes clear(100) 01(001) eoi(101)
    packed LSB-first = 0x4C 0x01 — derivable by hand from the spec."""
    assert _lzw_encode(np.array([1], np.uint8), 2) == b"\x4c\x01"
    assert _lzw_decode(b"\x4c\x01", 2) == b"\x01"


def test_lzw_roundtrip_and_kwkwk():
    rng = np.random.default_rng(3)
    for n, alpha in [(10, 2), (1000, 4), (20000, 16), (5000, 256)]:
        mcs = max(2, (alpha - 1).bit_length() or 1)
        idx = rng.integers(0, alpha, n).astype(np.uint8)
        assert _lzw_decode(_lzw_encode(idx, mcs), mcs) == idx.tobytes()
    # KwKwK: 'ababab…' forces the code==len(table) branch
    idx = np.array([0, 1] * 50, np.uint8)
    assert _lzw_decode(_lzw_encode(idx, 2), 2) == idx.tobytes()


def test_lzw_dictionary_overflow_resets():
    """>4096 distinct phrases force the mid-stream clear/reset path."""
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, 60000).astype(np.uint8)
    assert _lzw_decode(_lzw_encode(idx, 8), 8) == idx.tobytes()


def test_gif_roundtrip_exact():
    """GIF is lossless for ≤256-color images: bit-exact round-trip at
    several sizes/palettes, including non-square and single-color."""
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (17, 3), np.uint8)
    img = pal[rng.integers(0, 17, (24, 31))]
    assert (gif_decode(gif_encode(img)) == img).all()

    mono = np.full((8, 8, 3), 77, np.uint8)
    assert (gif_decode(gif_encode(mono)) == mono).all()

    big_pal = rng.integers(0, 256, (256, 3), np.uint8)
    img2 = big_pal[rng.integers(0, 256, (40, 40))]
    assert (gif_decode(gif_encode(img2)) == img2).all()


def test_gif_header_and_structure():
    img = np.zeros((2, 3, 3), np.uint8)
    data = gif_encode(img)
    assert data[:6] == b"GIF87a"
    assert data[-1:] == b"\x3b"
    import struct
    w, h = struct.unpack("<HH", data[6:10])
    assert (w, h) == (3, 2)


def test_gif_89a_with_extension_decodes():
    """89a header + a graphics-control extension before the image —
    the decoder must skip extensions."""
    img = np.array([[[250, 0, 0], [0, 250, 0]]], np.uint8)
    data = bytearray(gif_encode(img))
    data[:6] = b"GIF89a"
    ix = bytes(data).index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(data[:ix]) + gce + bytes(data[ix:])
    assert (gif_decode(patched) == img).all()


def test_gif_loud_gates():
    rng = np.random.default_rng(1)
    too_many = rng.integers(0, 256, (32, 32, 3), np.uint8)  # ~all distinct
    with pytest.raises(GifError, match="quantize"):
        gif_encode(too_many)
    with pytest.raises(GifError, match="not a GIF"):
        gif_decode(b"PNG whatever")

def test_gif_interlaced_decode():
    """De-interlace pin, independent of the encoder (which only writes
    non-interlaced): store rows pre-permuted into the spec's four-pass
    schedule, encode THAT image plainly, flip the interlace flag in the
    image descriptor — decode must undo the permutation. Heights cover
    every pass-boundary shape incl. degenerate (<8 rows)."""
    from blockchainspider_spark.functions.gifcodec import interlace_row_order

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    for h in (1, 2, 3, 5, 8, 9, 16, 17, 33):
        img = pal[rng.integers(0, 16, (h, 6))]
        order = interlace_row_order(h)
        assert sorted(order.tolist()) == list(range(h))  # a permutation
        stored = img[order]
        data = bytearray(gif_encode(stored))
        ix = bytes(data).index(b"\x2c")
        data[ix + 9] |= 0x40  # mark it interlaced
        assert (gif_decode(bytes(data)) == img).all(), h
    # the spec's canonical pass schedule at h=8: rows 0,4,2,6,1,3,5,7
    assert interlace_row_order(8).tolist() == [0, 4, 2, 6, 1, 3, 5, 7]


def test_gif_through_payload_dispatch_and_features(spark):
    """fmt='gif' flows through imagecodec.decode and image_features."""
    import pandas as pd

    from blockchainspider_spark.operators.multimodal import image_features

    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    img = pal[np.indices((8, 8)).sum(axis=0) % 2]  # checkerboard
    pdf = pd.DataFrame({
        "image_id": ["g1"], "bytes": [gif_encode(img)], "fmt": ["gif"],
    })
    out = image_features(spark.createDataFrame(pdf)).collect()[0]
    assert (out.w, out.h) == (8, 8)
    assert out.mean_r == pytest.approx(img[..., 0].mean())
    assert out.mean_b == pytest.approx(img[..., 2].mean())


def test_quantize_palette_bounds_and_determinism():
    """Median-cut: ≤n output colors, identity under the budget, bounded
    per-pixel error on a smooth gradient, deterministic reruns, and the
    quantize→encode pipeline round-trips losslessly from there."""
    rng = np.random.default_rng(7)
    from blockchainspider_spark.functions.gifcodec import quantize_palette

    img = rng.integers(0, 256, (48, 48, 3), np.uint8)  # ~2300 distinct colors
    q = quantize_palette(img, 256)
    uniq = np.unique(q.reshape(-1, 3), axis=0)
    assert len(uniq) <= 256
    assert (q == quantize_palette(img, 256)).all()  # deterministic
    assert (gif_decode(gif_encode(q)) == q).all()

    small = np.zeros((4, 4, 3), np.uint8)
    small[0, 0] = 200
    assert quantize_palette(small, 256) is small  # identity short-circuit

    yy, xx = np.mgrid[0:64, 0:64]
    grad = np.stack([4 * (xx // 2), 4 * (yy // 2), np.zeros_like(xx)], -1).astype(np.uint8)
    qg = quantize_palette(grad, 64)
    err = np.abs(qg.astype(int) - grad.astype(int)).max()
    assert err <= 64  # a 1024-color smooth ramp into 64 boxes stays close


# ------------------------------------------------ animation (round 6 cont.)


def _anim_frames(n, h, w, ncol=40, seed=1):
    """Base gradient + a block sweeping across frames (forces sub-rect
    deltas when the optimizer is on)."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), np.uint8)
    base = pal[(np.add.outer(np.arange(h), np.arange(w)) % (ncol - 1))]
    out = []
    for f in range(n):
        fr = base.copy()
        fr[f % (h - 4): f % (h - 4) + 4,
           (2 * f) % (w - 4): (2 * f) % (w - 4) + 4] = pal[ncol - 1]
        out.append(fr)
    return out


def test_animation_roundtrip_delta_optimized():
    """Optimized animation (sub-rect + transparency) decodes to the
    exact input frames with delays and loop count; the delta encoding
    is genuinely smaller than full frames."""
    from blockchainspider_spark.functions.gifcodec import (
        gif_decode_frames,
        gif_encode_animation,
    )

    frames = _anim_frames(5, 14, 18)
    delays = [10, 20, 30, 40, 50]
    data = gif_encode_animation(frames, delays, loop=7)
    assert data[:6] == b"GIF89a" and b"NETSCAPE2.0" in data
    dec, ddel, loop = gif_decode_frames(data)
    assert (ddel, loop) == (delays, 7)
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))
    plain = gif_encode_animation(frames, delays, loop=7, optimize=False)
    dec2, _, _ = gif_decode_frames(plain)
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec2))
    assert len(data) < len(plain)


def test_animation_static_frames_and_color_limit():
    from blockchainspider_spark.functions.gifcodec import (
        gif_decode_frames,
        gif_encode_animation,
    )

    f0 = _anim_frames(1, 9, 9)[0]
    dec, ddel, _ = gif_decode_frames(gif_encode_animation([f0] * 3, [5, 6, 7]))
    assert len(dec) == 3 and ddel == [5, 6, 7]
    assert all(np.array_equal(f0, x) for x in dec)
    rng = np.random.default_rng(3)
    noisy = [rng.integers(0, 256, (16, 16, 3), np.uint8) for _ in range(2)]
    with pytest.raises(GifError, match="quantize"):
        gif_encode_animation(noisy)  # >255 distinct colors with optimize


def test_animation_disposal_restore_background_and_previous():
    """Handcrafted streams pin disposal 2 (restore to background color)
    and 3 (restore to previous canvas) — paths our encoder never emits,
    but wild GIFs do."""
    import struct

    from blockchainspider_spark.functions.gifcodec import (
        _lzw_encode,
        _sub_blocks,
        gif_decode_frames,
    )

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   np.uint8)
    # 4x4 screen, bg index 0; frame 1 = all color 1 (full rect),
    # frame 2 = 2x2 color-2 patch at (1,1)
    def img_block(x, y, w, h, indices, interlace=False):
        out = bytearray(b"\x2c")
        out += struct.pack("<HHHHB", x, y, w, h, 0x40 if interlace else 0)
        out.append(2)  # min code size
        out += _sub_blocks(_lzw_encode(np.asarray(indices, np.uint8).reshape(-1), 2))
        return bytes(out)

    def gce(disposal, delay=10):
        return (b"\x21\xf9\x04" + bytes([(disposal << 2)])
                + struct.pack("<H", delay) + b"\x00\x00")

    head = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 0x11, 0, 0)
            + pal.tobytes())
    full1 = np.full((4, 4), 1)
    patch2 = np.full((2, 2), 2)
    # disposal=2 on frame 2: after it, the rect reverts to bg color
    data = (head + gce(1) + img_block(0, 0, 4, 4, full1)
            + gce(2) + img_block(1, 1, 2, 2, patch2)
            + gce(0) + img_block(0, 0, 1, 1, [[3]]) + b"\x3b")
    frames, _, _ = gif_decode_frames(data)
    assert len(frames) == 3
    assert (frames[0] == pal[1]).all()
    assert np.array_equal(frames[1][1:3, 1:3], np.broadcast_to(pal[2], (2, 2, 3)))
    # frame 3 canvas: patch rect restored to BACKGROUND color, not frame 1
    assert np.array_equal(frames[2][1:3, 1:3], np.broadcast_to(pal[0], (2, 2, 3)))
    assert np.array_equal(frames[2][0, 0], pal[3])
    # disposal=3 on frame 2: after it, the canvas reverts to frame 1
    data3 = (head + gce(1) + img_block(0, 0, 4, 4, full1)
             + gce(3) + img_block(1, 1, 2, 2, patch2)
             + gce(0) + img_block(0, 0, 1, 1, [[3]]) + b"\x3b")
    frames3, _, _ = gif_decode_frames(data3)
    assert np.array_equal(frames3[2][1:3, 1:3], np.broadcast_to(pal[1], (2, 2, 3)))
    # interlaced sub-rect: 4-row patch stored in pass order decodes back
    rows = np.array([[0], [1], [2], [3]])
    inter = (head + gce(1) + img_block(0, 0, 4, 4, full1)
             + gce(0) + img_block(0, 0, 1, 4, rows[[0, 2, 1, 3]], interlace=True)
             + b"\x3b")
    fi, _, _ = gif_decode_frames(inter)
    # interlace passes for h=4: rows 0, 2(pass3? no: 0;4.. none;2;1,3) → order [0,2,1,3]
    assert np.array_equal(fi[1][:, 0], pal[[0, 1, 2, 3]])


def test_animation_through_sample_frames_operator(spark):
    """sample_frames treats animated GIF bytes as a frame container —
    same operator as AVI — and the sampled frames round-trip losslessly
    through the png re-encode."""
    import pandas as pd

    from blockchainspider_spark.functions.gifcodec import gif_encode_animation
    from blockchainspider_spark.functions.imagecodec import png_decode
    from blockchainspider_spark.operators.multimodal import sample_frames

    frames = _anim_frames(4, 10, 12)
    pdf = pd.DataFrame({"video_id": ["g1"],
                        "bytes": [gif_encode_animation(frames)]})
    vids = spark.createDataFrame(pdf)
    got = {int(r.frame_idx): r for r in sample_frames(vids, every_k=2).collect()}
    assert sorted(got) == [0, 2]
    for i, r in got.items():
        assert (r.w, r.h) == (12, 10)
        assert np.array_equal(png_decode(bytes(r.bytes)), frames[i])
