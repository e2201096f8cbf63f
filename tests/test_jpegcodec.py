"""Real baseline-JPEG codec (functions/jpegcodec.py) — replaces the r≤5
``qjpeg`` synthetic stand-in. Encoder and decoder share only the Annex-K
constant tables; DCT, quantization, Huffman, and bitstream logic are
separate code paths, so the round-trip tests below genuinely pin both
directions (plus spec-structure pins that a canceling bug pair could
not fake)."""

import struct

import numpy as np
import pytest

from blockchainspider_spark.functions import jpegcodec as J
from blockchainspider_spark.functions.imagecodec import decode, psnr, qjpeg_encode


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 5 + seed) % 256, (yy * 7 + 2 * seed) % 256, (xx + yy) * 3 % 256],
        axis=-1,
    ).astype(np.uint8)


def test_zigzag_matches_spec_figure5():
    """T.81 Figure 5 first row and tail, plus involution with unzigzag."""
    want_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert J._ZIGZAG[:16].tolist() == want_head
    assert J._ZIGZAG[-4:].tolist() == [47, 55, 62, 63]
    assert (J._ZIGZAG[J._UNZIGZAG] == np.arange(64)).all()


def test_marker_structure_and_byte_stuffing():
    data = J.jpeg_encode(_gradient(16, 16), quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # required segments present, in a legal order
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    # entropy data between SOS payload and EOI carries no bare 0xFF
    sos = data.index(b"\xff\xda")
    (seglen,) = struct.unpack(">H", data[sos + 2:sos + 4])
    entropy = data[sos + 2 + seglen:-2]
    i = 0
    while i < len(entropy):
        if entropy[i] == 0xFF:
            assert entropy[i + 1] == 0x00, "unstuffed 0xFF in entropy data"
            i += 2
        else:
            i += 1


@pytest.mark.parametrize("quality,floor", [(75, 40), (90, 44), (95, 48)])
def test_roundtrip_psnr_on_smooth_content(quality, floor):
    px = _gradient(24, 24)
    dec = J.jpeg_decode(J.jpeg_encode(px, quality=quality))
    assert dec.shape == px.shape
    assert psnr(px, dec) >= floor


def test_non_multiple_of_8_dims_crop_back():
    px = _gradient(30, 41, seed=3)
    dec = J.jpeg_decode(J.jpeg_encode(px, quality=90))
    assert dec.shape == (30, 41, 3)
    assert psnr(px, dec) >= 40


def test_flat_image_is_near_lossless():
    px = np.full((16, 16, 3), 123, np.uint8)
    assert psnr(px, J.jpeg_decode(J.jpeg_encode(px, quality=90))) == float("inf")


def test_420_subsampling_roundtrip():
    """4:2:0 stream: SOF declares 2x2 luma sampling, the decoder's MCU
    interleave + chroma upsample reconstructs within chroma-loss
    tolerance."""
    px = _gradient(30, 42, seed=7)
    data = J.jpeg_encode(px, quality=90, subsampling="420")
    sof = data.index(b"\xff\xc0")
    assert data[sof + 11] == 0x22  # component 1 h=v=2
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert psnr(px, dec) >= 35  # chroma halved: lower than 4:4:4, still close
    # denser chroma-change content must also survive (exercises upsample)
    assert len(data) < len(J.jpeg_encode(px, quality=90))


def _strip_segments(data: bytes, marker_byte: int) -> bytes:
    out = bytearray(data[:2])
    pos = 2
    while pos < len(data):
        marker = data[pos + 1]
        if marker == 0xDA:
            out += data[pos:]
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker != marker_byte:
            out += data[pos:pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def test_missing_dht_uses_standard_tables():
    """OpenDML MJPEG convention: frames may omit DHT; the decoder falls
    back to the Annex-K standard tables (which the encoder used)."""
    px = _gradient(24, 24, seed=5)
    full = J.jpeg_encode(px, quality=90)
    stripped = _strip_segments(full, 0xC4)
    assert b"\xff\xc4" not in stripped.split(b"\xff\xda")[0]
    assert np.array_equal(J.jpeg_decode(stripped), J.jpeg_decode(full))


def test_unsupported_sof_and_truncated_raise_loudly():
    px = _gradient(16, 16)
    data = bytearray(J.jpeg_encode(px))
    sof = bytes(data).index(b"\xff\xc0")
    data[sof + 1] = 0xC3  # lossless sequential — out of scope
    with pytest.raises(J.JpegError, match="unsupported SOF"):
        J.jpeg_decode(bytes(data))
    # a baseline stream mislabeled SOF2 has an Se=63 "DC" scan header,
    # which the progressive path must reject, not misdecode
    data[sof + 1] = 0xC2
    with pytest.raises(J.JpegError, match="Se=0"):
        J.jpeg_decode(bytes(data))
    with pytest.raises(J.JpegError):
        J.jpeg_decode(J.jpeg_encode(px)[:40])
    with pytest.raises(J.JpegError, match="SOI"):
        J.jpeg_decode(b"\x89PNG\r\n")


def test_decode_dispatch_real_vs_legacy_qjpeg():
    """imagecodec.decode('jpeg') routes JFIF bytes to the real codec and
    legacy QJPG fixture bytes to the synthetic one; garbage is loud."""
    px = _gradient(24, 24, seed=9)
    real = J.jpeg_encode(px, quality=95)
    assert psnr(px, decode(real, "jpeg")) >= 40
    legacy = qjpeg_encode(px)
    assert psnr(px, decode(legacy, "jpeg")) >= 40
    with pytest.raises(ValueError, match="neither"):
        decode(b"\x00\x01\x02\x03garbage", "jpeg")


def test_dc_differential_across_blocks():
    """Multi-block image with a big DC jump between blocks — pins the
    differential-DC predictor path on both sides."""
    px = np.zeros((8, 32, 3), np.uint8)
    px[:, 8:16] = 250
    px[:, 16:24] = 10
    px[:, 24:] = 128
    dec = J.jpeg_decode(J.jpeg_encode(px, quality=95))
    assert psnr(px, dec) >= 40


def test_restart_markers_decode():
    """DRI + RSTn stream: build one by re-encoding with restart
    intervals injected through the module's own writer primitives, then
    decode — predictors must reset at each marker."""
    px = _gradient(8, 48, seed=11)  # 6 MCUs in 4:4:4
    base = J.jpeg_encode(px, quality=90)
    # rebuild entropy data with restart_interval=2 using internals
    ycc = J._rgb_to_ycbcr(px.astype(np.uint8))
    q_lum = J._quality_scale(J._QT_LUM, 90)
    q_chr = J._quality_scale(J._QT_CHROM, 90)
    planes = [
        J._encode_plane_coeffs(ycc[..., 0], q_lum),
        J._encode_plane_coeffs(ycc[..., 1], q_chr),
        J._encode_plane_coeffs(ycc[..., 2], q_chr),
    ]
    dc_l = J._canonical_codes(*J._DC_LUM)
    dc_c = J._canonical_codes(*J._DC_CHROM)
    ac_l = J._canonical_codes(*J._AC_LUM)
    ac_c = J._canonical_codes(*J._AC_CHROM)
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    entropy = bytearray()
    bw = J._BitWriter()
    preds = [0, 0, 0]
    for b in range(planes[0].shape[0]):
        if b and b % 2 == 0:
            bw.flush()
            entropy += bw.out
            entropy += bytes([0xFF, 0xD0 + ((b // 2 - 1) % 8)])
            bw = J._BitWriter()
            preds = [0, 0, 0]
        for ci in range(3):
            preds[ci] = J._encode_block(bw, planes[ci][b], preds[ci], *tabs[ci])
    bw.flush()
    entropy += bw.out
    sos = base.index(b"\xff\xda")
    (seglen,) = struct.unpack(">H", base[sos + 2:sos + 4])
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 2)
    data = base[:sos] + dri + base[sos:sos + 2 + seglen] + bytes(entropy) + b"\xff\xd9"
    assert np.array_equal(J.jpeg_decode(data), J.jpeg_decode(base))


def test_grayscale_single_component_decodes():
    """1-component SOF/SOS (pure luma) built from internals — decoder
    broadcasts to RGB."""
    px = _gradient(16, 16, seed=13)
    y = J._rgb_to_ycbcr(px)[..., 0]
    q_lum = J._quality_scale(J._QT_LUM, 90)
    coeffs = J._encode_plane_coeffs(y, q_lum)
    dc_l = J._canonical_codes(*J._DC_LUM)
    ac_l = J._canonical_codes(*J._AC_LUM)
    bw = J._BitWriter()
    pred = 0
    for b in range(coeffs.shape[0]):
        pred = J._encode_block(bw, coeffs[b], pred, dc_l, ac_l)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    body = bytes([0]) + bytes(q_lum.reshape(-1)[J._ZIGZAG].astype(np.uint8))
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 16, 16, 1) + bytes([1, 0x11, 0])
    out += J._dht_segment(0x00, *J._DC_LUM)
    out += J._dht_segment(0x10, *J._AC_LUM)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += bw.out + b"\xff\xd9"
    dec = J.jpeg_decode(bytes(out))
    assert dec.shape == (16, 16, 3)
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    assert np.abs(dec[..., 0].astype(float) - y).mean() < 3.0


def test_mjpeg_avi_roundtrip_and_frame_sampling():
    """MJPEG AVI end-to-end: encode frames as real JFIF '00dc' chunks,
    parse back, and confirm the fourcc + per-frame PSNR."""
    from blockchainspider_spark.functions.avicodec import MJPG, avi_encode, parse_avi

    frames = [_gradient(24, 32, seed=i) for i in range(5)]
    data = avi_encode(frames, fps=10, codec="mjpg", quality=95)
    assert struct.pack("<I", MJPG) in data  # fourcc recorded in strf
    fps, w, h, got = parse_avi(data)
    assert (fps, w, h, len(got)) == (10.0, 32, 24, 5)
    for orig, dec in zip(frames, got):
        assert psnr(orig, dec) >= 40


# ------------------------------------------------ progressive (SOF2)


def test_progressive_bitstream_structure():
    """SOF2 marker present, the libjpeg 10-scan script emitted, and no
    SOF0 — structural pin so a decoder bug can't hide behind a secretly
    baseline bitstream."""
    px = _gradient(20, 28, seed=3)
    data = J.jpeg_encode_progressive(px, quality=90)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data.split(b"\xff\xda")[0]
    assert data.count(b"\xff\xda") == 10


@pytest.mark.parametrize("dims,sub", [
    ((16, 16), "444"), ((16, 16), "420"),
    ((20, 12), "420"),  # non-MCU-aligned 4:2:0: luma grid 3x2 vs padded 4x2 —
                        # pins the interleaved-vs-non-interleaved block grids
    ((17, 9), "444"), ((33, 47), "420"),
])
def test_progressive_decodes_bit_identical_to_baseline(dims, sub):
    """Progressive re-encoding is lossless over the quantized
    coefficients, so decode(progressive) == decode(baseline) EXACTLY —
    every successive-approximation refine path must reconstruct every
    coefficient bit."""
    h, w = dims
    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for q in (50, 95):
        base = J.jpeg_decode(J.jpeg_encode(px, quality=q, subsampling=sub))
        prog = J.jpeg_decode(
            J.jpeg_encode_progressive(px, quality=q, subsampling=sub))
        assert np.array_equal(base, prog)


def test_progressive_restart_markers():
    """DRI in a progressive stream: DC predictors and EOB runs reset at
    every RSTn in every scan."""
    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    base = J.jpeg_decode(J.jpeg_encode(px, quality=85))
    for ri in (1, 3):
        prog = J.jpeg_encode_progressive(px, quality=85, restart_interval=ri)
        assert prog.count(b"\xff\xdd") == 1
        assert np.array_equal(J.jpeg_decode(prog), base)


def test_progressive_through_payload_dispatch():
    """imagecodec.decode('jpeg') handles SOF2 bytes — the crawl payload
    path accepts the format most large web JPEGs actually use."""
    px = _gradient(24, 24, seed=13)
    data = J.jpeg_encode_progressive(px, quality=95)
    assert psnr(px, decode(data, "jpeg")) >= 40


# ------------------------------------------------ EXIF orientation


def test_exif_orientation_parse_and_auto_apply():
    """All 8 orientation tags, both encoders: auto-oriented decode ==
    the documented transform of the raw decode; 5-8 swap dimensions."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    for enc in (J.jpeg_encode, J.jpeg_encode_progressive):
        raw = J.jpeg_decode(enc(px, quality=90))
        for o in range(1, 9):
            data = enc(px, quality=90, exif_orientation=o)
            assert np.array_equal(J.jpeg_decode(data, apply_exif=False), raw)
            auto = J.jpeg_decode(data)
            assert np.array_equal(auto, J.apply_exif_orientation(raw, o))
            assert auto.shape[:2] == ((16, 24) if o >= 5 else (24, 16))


def test_exif_orientation_transforms_pinned():
    """Closed-form pins on a 2x1 asymmetric image: each tag's transform
    matches the EXIF spec's corner mapping (0th row/0th column rules)."""
    px = np.array([[[1, 1, 1], [2, 2, 2]]], np.uint8)  # 1 row, 2 cols
    A = J.apply_exif_orientation
    assert A(px, 2)[0, 0, 0] == 2            # mirrored horizontally
    assert A(px, 3)[0, 0, 0] == 2            # rotated 180
    assert A(px, 6)[0, 0, 0] == 1 and A(px, 6).shape[:2] == (2, 1)  # 90 CW
    assert A(px, 8)[0, 0, 0] == 2 and A(px, 8).shape[:2] == (2, 1)  # 90 CCW
    assert A(px, 5)[1, 0, 0] == 2            # transpose
    with pytest.raises(J.JpegError):
        A(px, 9)


def test_exif_little_endian_and_absent_tag():
    """Intel byte order parses too, and APP1s without an orientation
    entry (or non-EXIF APP1s) leave the default upright."""
    tiff = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1)
            + struct.pack("<HH", 6, 0) + struct.pack("<I", 0))
    assert J._parse_exif_orientation(tiff) == 6
    notag = (b"MM" + struct.pack(">HI", 42, 8) + struct.pack(">H", 1)
             + struct.pack(">HHI", 0x0110, 2, 4) + b"cam\x00"
             + struct.pack(">I", 0))
    assert J._parse_exif_orientation(notag) == 0
    assert J._parse_exif_orientation(b"XX") == 0
