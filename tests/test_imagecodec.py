"""Image codec: PNG filter decode paths, lossy invariants, phash."""

import struct
import zlib

import numpy as np
import pytest

from blockchainspider_spark.functions import imagecodec as C


def _png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Hand-encode a PNG applying the given per-row filter types."""
    h, w, _ = pixels.shape
    assert len(filters) == h
    px = pixels.astype(np.int32)
    rows = []
    for y in range(h):
        line = px[y].reshape(-1)
        prev = px[y - 1].reshape(-1) if y else np.zeros(w * 3, np.int32)
        f = filters[y]
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(3, np.int32), line[:-3]])
            enc = (line - left) & 0xFF
        elif f == 2:  # Up
            enc = (line - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(3, np.int32), line[:-3]])
            enc = (line - (left + prev) // 2) & 0xFF
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(3, np.int32), line[:-3]])
            ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (line - pred) & 0xFF
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        C._PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + C._chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1] * 6, [2] * 6, [3] * 6, [4] * 6, [0, 1, 2, 3, 4, 2]])
def test_png_decode_all_filter_types(filters):
    rng = np.random.default_rng(9)
    px = rng.integers(0, 255, (6, 5, 3)).astype(np.uint8)
    data = _png_with_filters(px, filters)
    assert (C.png_decode(data) == px).all()


def test_qjpeg_lossy_but_within_budget():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
    dec = C.qjpeg_decode(C.qjpeg_encode(px))
    assert (dec != px).any(), "codec must actually be lossy"
    assert C.psnr(px, dec) >= 40.0


def test_phash_locality():
    """phash is stable under mild noise on textured images and far apart
    for different images (smooth gradients are out of spec: their AC
    coefficients sit at zero, so sign bits are noise-dominated)."""
    from blockchainspider_spark.fixtures.generators import _pixels_for

    rng = np.random.default_rng(7)
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    for key in ("img://host-0/a", "img://host-1/b"):
        base = _pixels_for(key, 32, 32)
        noisy = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape), 0, 255).astype(np.uint8)
        other = _pixels_for(key + "-different", 32, 32)
        assert ham(C.phash64(base), C.phash64(noisy)) <= 8
        assert ham(C.phash64(base), C.phash64(other)) >= 12


def test_decode_unknown_format_gated():
    # a format with no decoder in the container refuses loudly
    with pytest.raises(NotImplementedError):
        C.decode(b"xxxx", "avif")
    # formats that DO decode (webp since the round-6 continuation)
    # reject garbage bytes with the codec's own loud error instead
    with pytest.raises(ValueError, match="RIFF"):
        C.decode(b"xxxx", "webp")


def test_ssim_identity_shift_and_noise():
    """SSIM pins: 1.0 on identity; the constant-shift case matches the
    closed-form luminance-only degradation; noise strictly degrades it
    and real JPEG keeps it high; shape/size misuse raises."""
    import numpy as np
    import pytest

    from blockchainspider_spark.functions.imagecodec import ssim

    rng = np.random.default_rng(5)
    img = rng.integers(30, 220, (32, 32, 3), np.uint8)
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-12)

    # constant gray shift: variance/covariance terms cancel, leaving the
    # per-block luminance factor (2 mu (mu+d) + C1) / (mu^2 + (mu+d)^2 + C1)
    gray = rng.integers(40, 200, (16, 16)).astype(np.float64)
    d = 20.0
    mu = gray.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, -1).mean(axis=1)
    c1 = (0.01 * 255) ** 2
    want = ((2 * mu * (mu + d) + c1) / (mu**2 + (mu + d) ** 2 + c1)).mean()
    assert ssim(gray, gray + d) == pytest.approx(want, abs=1e-12)

    noisy = np.clip(img.astype(np.int32) + rng.integers(-25, 26, img.shape), 0, 255).astype(np.uint8)
    assert 0.3 < ssim(img, noisy) < 0.995

    from blockchainspider_spark.functions.jpegcodec import jpeg_decode, jpeg_encode
    jp = jpeg_decode(jpeg_encode(img, quality=95))
    assert ssim(img, jp) > ssim(img, noisy)
    assert ssim(img, jp) > 0.97

    with pytest.raises(ValueError, match="mismatch"):
        ssim(img, img[:16])
    with pytest.raises(ValueError, match="smaller"):
        ssim(img[:4, :4], img[:4, :4])


def test_png_adam7_interlaced_decode():
    """Adam7 pin, independent of the encoder (which only writes
    non-interlaced): build the seven-pass stream by hand — each pass an
    independently-filtered sub-image — set interlace=1 in IHDR, and
    decode must reassemble the original. Sizes cover sub-8x8 (empty
    passes), exact pass boundaries, and odd dims; one variant uses the
    Sub filter inside a pass to pin per-pass filter independence."""
    import struct
    import zlib

    import numpy as np

    from blockchainspider_spark.functions.imagecodec import (
        _ADAM7,
        _chunk,
        _PNG_SIG,
        png_decode,
    )

    rng = np.random.default_rng(23)

    def build_interlaced(img: np.ndarray, use_sub: bool) -> bytes:
        h, w, _ = img.shape
        stream = bytearray()
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            for y in range(ph):
                line = sub[y].reshape(-1).astype(np.int32)
                if use_sub and pw > 1:
                    # forward Sub filter: raw[x] - raw[x-1] per channel
                    delta = line.reshape(pw, 3).copy()
                    delta[1:] = (delta[1:] - line.reshape(pw, 3)[:-1]) & 0xFF
                    stream += b"\x01" + delta.astype(np.uint8).tobytes()
                else:
                    stream += b"\x00" + line.astype(np.uint8).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
        return (_PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(stream)))
                + _chunk(b"IEND", b""))

    for h, w in [(1, 1), (3, 5), (7, 7), (8, 8), (9, 10), (16, 16), (17, 13)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        assert (png_decode(build_interlaced(img, use_sub=False)) == img).all(), (h, w)
    img = rng.integers(0, 256, (12, 11, 3), np.uint8)
    assert (png_decode(build_interlaced(img, use_sub=True)) == img).all()


def test_png_color_types_gray_palette_alpha():
    """Hand-built 8-bit files for color types 0 (gray), 3 (palette),
    4 (gray+alpha) and 6 (RGBA): alpha is dropped, gray replicates to
    RGB, palette goes through PLTE. The RGBA case uses the Sub filter
    so the left neighbor is 4 bytes back (bpp semantics, spec §9.2) —
    a 3-channel-hardcoded unfilter would corrupt it."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from blockchainspider_spark.functions.imagecodec import (
        _chunk,
        _PNG_SIG,
        png_decode,
    )

    rng = np.random.default_rng(29)

    def build(ct, ch, h, w, planes, plte=None, filt=0):
        stream = bytearray()
        for y in range(h):
            line = planes[y].reshape(-1).astype(np.int32)
            if filt == 1 and w > 1:
                d = line.reshape(w, ch).copy()
                d[1:] = (d[1:] - line.reshape(w, ch)[:-1]) & 0xFF
                stream += b"\x01" + d.astype(np.uint8).tobytes()
            else:
                stream += b"\x00" + line.astype(np.uint8).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        out = _PNG_SIG + _chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
        return out + _chunk(b"IDAT", zlib.compress(bytes(stream))) + _chunk(b"IEND", b"")

    # type 0: gray → RGB replication
    g = rng.integers(0, 256, (5, 7, 1), np.uint8)
    assert (png_decode(build(0, 1, 5, 7, g)) == np.repeat(g, 3, 2)).all()

    # type 3: palette lookup through PLTE
    pal = rng.integers(0, 256, (5, 3), np.uint8)
    idx = rng.integers(0, 5, (4, 6, 1), np.uint8)
    assert (png_decode(build(3, 1, 4, 6, idx, plte=pal)) == pal[idx[..., 0]]).all()
    bad = idx.copy()
    bad[0, 0, 0] = 5  # out of palette range
    with pytest.raises(ValueError, match="PLTE index"):
        png_decode(build(3, 1, 4, 6, bad, plte=pal))

    # type 4: gray+alpha → alpha dropped, gray replicated
    ga = rng.integers(0, 256, (3, 4, 2), np.uint8)
    assert (png_decode(build(4, 2, 3, 4, ga)) == np.repeat(ga[..., :1], 3, 2)).all()

    # type 6: RGBA with the Sub filter (left neighbor = 4 bytes back)
    rgba = rng.integers(0, 256, (6, 9, 4), np.uint8)
    assert (png_decode(build(6, 4, 6, 9, rgba, filt=1)) == rgba[..., :3]).all()

    # 16-bit depth raises loudly
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    data16 = _PNG_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(AssertionError, match="bit depth 8"):
        png_decode(data16)


def test_sniff_format_and_auto_dispatch():
    """Magic sniffing: the same pixels encoded in every real format
    dispatch correctly with fmt='auto' (servers lie about Content-Type;
    the payload path must not trust the fmt column blindly), and
    unrecognizable bytes are loud."""
    import pytest

    from blockchainspider_spark.functions.bmpcodec import bmp_encode
    from blockchainspider_spark.functions.gifcodec import gif_encode
    from blockchainspider_spark.functions.imagecodec import (
        decode,
        png_encode,
        psnr,
        sniff_format,
    )
    from blockchainspider_spark.functions.jpegcodec import (
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (12, 3), np.uint8)
    px = pal[rng.integers(0, 12, (16, 16))]
    from blockchainspider_spark.functions.tiffcodec import tiff_encode

    cases = {
        "png": png_encode(px),
        "gif": gif_encode(px),
        "bmp": bmp_encode(px),
        "tiff": tiff_encode(px, byte_order="II"),
    }
    assert sniff_format(tiff_encode(px, byte_order="MM")) == "tiff"
    from blockchainspider_spark.functions.webpcodec import webp_encode

    wp = webp_encode(px)
    assert sniff_format(wp) == "webp"
    assert np.array_equal(decode(wp, "auto"), px)
    for fmt, data in cases.items():
        assert sniff_format(data) == fmt
        assert np.array_equal(decode(data, "auto"), px)
    yy, xx = np.mgrid[0:16, 0:16]
    smooth = np.stack([xx * 9, yy * 7, xx + yy], -1).astype(np.uint8)
    for data in (jpeg_encode(smooth, quality=95),
                 jpeg_encode_progressive(smooth, quality=95)):
        assert sniff_format(data) == "jpeg"
        assert psnr(smooth, decode(data, "auto")) >= 40
    assert sniff_format(b"\x00\x01garbage") is None
    with pytest.raises(ValueError, match="sniff"):
        decode(b"\x00\x01garbage", "auto")
