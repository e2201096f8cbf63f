"""Real baseline JPEG (ITU T.81 / JFIF) codec in pure numpy.

Replaces the round-5 ``qjpeg`` synthetic stand-in (VERDICT r5 "Next
round" #2): the payload PSNR invariant and the MJPEG AVI frame path now
run on real DCT/Huffman JFIF bytes. Everything here derives from the
public JPEG spec (ITU-T T.81, Annex K tables) — no external codec
library exists in the container.

Scope (all of baseline sequential DCT):

* **encode**: 8-bit RGB → YCbCr (JFIF BT.601 full-range), 4:4:4, 8×8
  blocks, forward DCT, Annex-K quantization scaled by ``quality``
  (libjpeg's 5000/Q // 200−2Q convention), zigzag, differential DC +
  run-length AC with the Annex-K standard Huffman tables, byte
  stuffing. Output decodes in any standards-compliant reader.
* **decode**: marker parse (APP*/COM skip, DQT, SOF0/SOF2, DHT, DRI,
  SOS), arbitrary Huffman/quant tables (not just the standard ones),
  sampling factors h,v ∈ {1,2} per component (covers 4:4:4, 4:2:2,
  4:2:0 — what real MJPEG emits), restart markers, grayscale or YCbCr.
  **Progressive (SOF2)** is fully supported (round 6): spectral
  selection + successive approximation per T.81 Annex G — DC
  first/refinement scans, AC first scans with EOB runs, and AC
  refinement scans with buffered correction bits. Most large web
  JPEGs are progressive, so a crawl payload path without SOF2 would
  reject the majority of real fetches. Arithmetic coding and
  lossless/hierarchical SOFs still raise loudly.
* **EXIF orientation** (round 6): APP1 TIFF IFD0 tag 0x0112 is parsed
  and auto-applied on decode (the 8 standard transforms), matching
  browser behavior; ``jpeg_decode(data, apply_exif=False)`` returns
  the raw sensor orientation. Both encoders can stamp an orientation
  tag for fixtures.
* **progressive encode** (fixtures + parity oracle): a spec-legal
  SOF2 writer with libjpeg's default 10-scan script (DC Al=1 →
  banded AC firsts → AC refines → DC refine) and per-scan flat
  canonical Huffman tables (all symbols one code length, the all-ones
  code reserved per Annex C) — needed because the Annex-K baseline AC
  tables lack the EOBn symbols progressive scans emit. Progressive
  re-encoding is lossless over the quantized coefficients, so
  ``jpeg_decode(progressive bytes)`` is BIT-EXACTLY equal to
  ``jpeg_decode(baseline bytes)`` at the same quality/subsampling —
  the property tests pin exactly that.

Reference behavior pinned: BlockchainSpider fetches media bytes opaquely
(spider middleware treats responses as payloads); the decode invariant
(PSNR ≥ 40 dB, BASELINE.json) is this repo's addition for the image
axis.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1/K.2: example quantization tables (row-major)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag scan order: _ZIGZAG[k] = flat row-major index of the k-th
# zigzag coefficient (T.81 Figure 5)
def _build_zigzag() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1],
                        rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int32)


_ZIGZAG = _build_zigzag()
_UNZIGZAG = np.argsort(_ZIGZAG)
# spot-pin the spec sequence (T.81 Fig. 5: 0, 1, 8, 16, 9, 2, 3, 10...)
assert _ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
assert _ZIGZAG[-3:].tolist() == [55, 62, 63]

# Annex K.3: standard Huffman tables as (BITS[1..16], HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], vals: list[int]):
    """T.81 Annex C: canonical (code, length) per symbol."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dct_mat() -> np.ndarray:
    k = np.arange(8)[:, None]
    i = np.arange(8)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / 16.0) * 0.5
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_D8 = _dct_mat()


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:       # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """HxW (multiples of 8) → (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _encode_plane_coeffs(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    blocks = _blockify(plane) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _D8, blocks, _D8)
    q = np.round(coef / qtab).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss category, appended-bits value) for a DC diff / AC coeff."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    ssss, bits = _magnitude(dc - pred)
    code, length = dc_codes[ssss]
    bw.put(code, length)
    bw.put(bits, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]      # ZRL
            bw.put(code, length)
            run -= 16
        ssss, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | ssss]
        bw.put(code, length)
        bw.put(bits, ssss)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]          # EOB
        bw.put(code, length)
    return dc


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                exif_orientation: int = 0) -> bytes:
    """8-bit RGB HxWx3 → baseline JFIF bytes (standard tables).
    ``subsampling`` is '444' (one block per component per MCU) or '420'
    (2×2 luma blocks + box-downsampled chroma — what real MJPEG
    streams typically carry). ``exif_orientation`` 1..8 stamps an APP1
    EXIF orientation tag (pixels are written as given; the tag tells
    decoders how to display them)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise JpegError("jpeg_encode expects uint8 HxWx3 RGB")
    if subsampling not in ("444", "420"):
        raise JpegError(f"subsampling {subsampling!r} unsupported")
    s420 = subsampling == "420"
    h, w = pixels.shape[:2]
    mcu_px = 16 if s420 else 8
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)
    q_lum = _quality_scale(_QT_LUM, quality)
    q_chr = _quality_scale(_QT_CHROM, quality)
    if s420:
        cb = ycc[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = ycc[..., 1], ycc[..., 2]
    planes = [
        _encode_plane_coeffs(ycc[..., 0], q_lum),
        _encode_plane_coeffs(cb, q_chr),
        _encode_plane_coeffs(cr, q_chr),
    ]
    dc_l = _canonical_codes(*_DC_LUM)
    dc_c = _canonical_codes(*_DC_CHROM)
    ac_l = _canonical_codes(*_AC_LUM)
    ac_c = _canonical_codes(*_AC_CHROM)

    bw = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    if s420:
        bw_y = pw // 8          # luma blocks per row
        bw_c = pw // 16         # chroma blocks per row
        for my in range(ph // 16):
            for mx in range(pw // 16):
                for by in (0, 1):
                    for bx in (0, 1):
                        bidx = (2 * my + by) * bw_y + (2 * mx + bx)
                        preds[0] = _encode_block(
                            bw, planes[0][bidx], preds[0], dc_l, ac_l)
                cidx = my * bw_c + mx
                for ci in (1, 2):
                    preds[ci] = _encode_block(
                        bw, planes[ci][cidx], preds[ci], dc_c, ac_c)
    else:
        for b in range(planes[0].shape[0]):  # 4:4:4 → MCU = 1 block/comp
            for ci in range(3):
                preds[ci] = _encode_block(
                    bw, planes[ci][b], preds[ci], tabs[ci][0], tabs[ci][1]
                )
    bw.flush()

    y_hv = 0x22 if s420 else 0x11
    out = bytearray(b"\xff\xd8")                               # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"  # APP0
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    if 1 <= exif_orientation <= 8:
        out += _app1_exif(exif_orientation)
    for tq, qt in ((0, q_lum), (1, q_chr)):                    # DQT
        body = bytes([tq]) + bytes(qt.reshape(-1)[_ZIGZAG].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    out += (b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF0
            + bytes([1, y_hv, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += _dht_segment(0x00, *_DC_LUM)                        # DHT ×4
    out += _dht_segment(0x01, *_DC_CHROM)
    out += _dht_segment(0x10, *_AC_LUM)
    out += _dht_segment(0x11, *_AC_CHROM)
    out += (b"\xff\xda" + struct.pack(">H", 12) + bytes([3])   # SOS
            + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                raise JpegError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek_marker(self) -> int | None:
        """At a byte boundary: the marker right ahead, if any."""
        p = self.pos
        if p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] != 0x00:
            return self.data[p + 1]
        return None

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _HuffTable:
    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise JpegError("invalid Huffman code")


_STD_HUFF_CACHE: dict = {}


def _std_huff(is_ac: bool, is_chroma: bool) -> "_HuffTable":
    key = (is_ac, is_chroma)
    if key not in _STD_HUFF_CACHE:
        src = {(False, False): _DC_LUM, (False, True): _DC_CHROM,
               (True, False): _AC_LUM, (True, True): _AC_CHROM}[key]
        _STD_HUFF_CACHE[key] = _HuffTable(*src)
    return _STD_HUFF_CACHE[key]


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_block(br: _BitReader, dc_tab: _HuffTable, ac_tab: _HuffTable,
                  pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    t = dc_tab.decode(br)
    dc = pred + _extend(br.read(t), t)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        run, ssss = rs >> 4, rs & 0x0F
        if ssss == 0:
            if run == 15:       # ZRL
                k += 16
                continue
            break               # EOB
        k += run
        if k > 63:
            raise JpegError("AC run past end of block")
        zz[k] = _extend(br.read(ssss), ssss)
        k += 1
    return zz, dc


def jpeg_decode(data: bytes, apply_exif: bool = True) -> np.ndarray:
    """Baseline or progressive JFIF bytes → uint8 HxWx3 RGB
    (HxWx1-shaped grayscale is broadcast to RGB). EXIF orientation is
    auto-applied unless ``apply_exif=False``. Raises JpegError on
    arithmetic coding / unsupported sampling."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    prog_geo: tuple[int, int, int, int] | None = None  # mcux, mcuy, hmax, vmax
    orientation = 1
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:      # EOI
            if progressive and prog_geo is not None:
                img = _prog_finish(comps, qtabs, h, w, prog_geo[2], prog_geo[3])
                return apply_exif_orientation(img, orientation) if apply_exif else img
            raise JpegError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue            # standalone
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        end = pos + seglen
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":  # APP1 EXIF
            orientation = _parse_exif_orientation(body[6:]) or orientation
        elif marker == 0xDB:    # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                if len(body) < p + 65:
                    raise JpegError("truncated DQT segment")
                zzt = np.frombuffer(body[p + 1:p + 65], np.uint8).astype(np.int32)
                tab = np.zeros(64, np.int32)
                tab[_ZIGZAG] = zzt
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2 (progressive)
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise JpegError(f"sampling {ch}x{cv} unsupported")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF {marker:#x} (lossless/arithmetic/hierarchical)")
        elif marker == 0xC4:    # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xDD:    # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:    # SOS → entropy data follows
            ns = body[0]
            if progressive:
                if prog_geo is None:
                    prog_geo = _prog_setup(comps, h, w)
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                scan = []
                for i in range(ns):
                    cs, tds = body[1 + 2 * i], body[2 + 2 * i]
                    comp = next(c for c in comps if c["id"] == cs)
                    scan.append((comp, dc_tabs.get(tds >> 4),
                                 ac_tabs.get(tds & 0x0F)))
                pos = _decode_prog_scan(data, end, scan, ss, se, ah, al,
                                        prog_geo[0], prog_geo[1],
                                        restart_interval)
                continue
            scan = []
            for i in range(ns):
                cs, tds = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                # MJPEG convention (OpenDML): AVI frames may omit DHT
                # entirely — a scan referencing an undefined table gets
                # the Annex-K standard table of its slot
                dct = dc_tabs.get(tds >> 4) or _std_huff(False, i > 0)
                act = ac_tabs.get(tds & 0x0F) or _std_huff(True, i > 0)
                scan.append((comp, dct, act))
            img = _decode_scan(data, end, scan, qtabs, h, w,
                               restart_interval)
            return apply_exif_orientation(img, orientation) if apply_exif else img
        pos = end
    raise JpegError("no SOS marker found")


def _decode_scan(data, pos, scan, qtabs, h, w, restart_interval):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c, _, _ in scan:
        c["plane"] = np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                              np.float64)
        c["qt"] = qtabs[c["tq"]].astype(np.float64)
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align()
                m = br.peek_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise JpegError("missing restart marker")
                br.pos += 2
                preds = [0] * len(scan)
            for ci, (c, dct, act) in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[ci] = _decode_block(br, dct, act, preds[ci])
                        blk = np.zeros(64, np.float64)
                        blk[_ZIGZAG] = zz
                        blk = blk.reshape(8, 8) * c["qt"]
                        pix = _D8.T @ blk @ _D8 + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0:y0 + 8, x0:x0 + 8] = pix
            mcu += 1
    planes = []
    for c, _, _ in scan:
        p = c["plane"]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(planes) != 3:
        raise JpegError(f"{len(planes)}-component scan unsupported")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


# ------------------------------------------------ progressive decode
# ITU-T T.81 Annex G.2: a progressive frame accumulates quantized
# coefficients across many scans (spectral bands Ss..Se, successive-
# approximation bit positions Ah→Al); dequantize + IDCT happen once,
# at EOI. Coefficient layout: per component, (n_blocks, 64) int32 in
# ZIGZAG index order, blocks row-major over the MCU-padded grid.


def _prog_setup(comps: list[dict], h: int, w: int) -> tuple[int, int, int, int]:
    """Allocate coefficient buffers; returns (mcux, mcuy, hmax, vmax).

    Two block grids per component (T.81 A.2): interleaved scans cover
    the MCU-padded grid (``bx_full`` × ``by_full``); non-interleaved
    scans cover only ceil(component dims / 8) (``bx`` × ``by``) — the
    classic progressive-decoder trap when dims aren't MCU-aligned."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bx_full"] = mcux * c["h"]
        c["by_full"] = mcuy * c["v"]
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        c["bx"] = -(-cw // 8)
        c["by"] = -(-ch_ // 8)
        c["coef"] = np.zeros((c["by_full"] * c["bx_full"], 64), np.int32)
    return mcux, mcuy, hmax, vmax


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Past a scan's entropy data: position of the next real marker
    (skips 0xFF00 stuffing, 0xFF fill bytes, and stray RSTs)."""
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:
            pos += 2
        elif nxt == 0xFF:
            pos += 1
        elif 0xD0 <= nxt <= 0xD7:
            pos += 2
        else:
            return pos
    raise JpegError("no marker terminating progressive scan")


def _decode_prog_scan(data, pos, scan, ss, se, ah, al,
                      mcux, mcuy, restart_interval) -> int:
    """Decode one progressive scan into the components' coefficient
    buffers (mutates ``c['coef']``); returns the byte offset of the
    next marker. ``scan``: list of (comp, dc_tab|None, ac_tab|None)."""
    interleaved = len(scan) > 1
    if ss == 0:
        if se != 0:
            raise JpegError("progressive DC scan must have Se=0")
        if ah == 0 and any(dct is None for _, dct, _ in scan):
            raise JpegError("DC first scan references undefined DC table")
        n_units = mcuy * mcux if interleaved else scan[0][0]["by"] * scan[0][0]["bx"]
    else:
        if interleaved:
            raise JpegError("progressive AC scan must be single-component")
        if ah == 0 and scan[0][2] is None:
            raise JpegError("AC scan references undefined AC table")
        c0 = scan[0][0]
        n_units = c0["by"] * c0["bx"]

    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    state = {"eobrun": 0}

    def dc_first(c, dct, bidx, ci):
        t = dct.decode(br)
        preds[ci] += _extend(br.read(t), t)
        c["coef"][bidx, 0] = preds[ci] << al

    def dc_refine(c, bidx):
        if br.read(1):
            # two's-complement OR — pairs with the encoder's
            # arithmetic-shift point transform (G.1.2.1)
            c["coef"][bidx, 0] |= 1 << al

    def ac_first(c, act, bidx):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        coef = c["coef"][bidx]
        k = ss
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:             # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1   # EOBn: run includes this block
                if r:
                    state["eobrun"] += br.read(r)
                break
            k += r
            if k > se:
                raise JpegError("AC run past end of band")
            coef[k] = _extend(br.read(s), s) << al
            k += 1

    def ac_refine(c, act, bidx):
        coef = c["coef"][bidx]
        p1, m1 = 1 << al, -1 << al

        def correct(k_):
            # history-nonzero coefficient: consume one correction bit
            if br.read(1) and (coef[k_] & p1) == 0:
                coef[k_] += p1 if coef[k_] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = act.decode(br)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:          # EOBn — refine the tail, then run
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.read(r)
                        break
                    # r == 15 → ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise JpegError("AC refinement magnitude must be 1")
                    newval = p1 if br.read(1) else m1
                while k <= se:          # advance r zero-history slots,
                    if coef[k] != 0:    # refining nonzero-history on the way
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise JpegError("AC refine run past end of band")
                    coef[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            br.align()
            m = br.peek_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise JpegError("missing restart marker in progressive scan")
            br.pos += 2
            preds = [0] * len(scan)
            state["eobrun"] = 0
        if ss == 0:
            if interleaved:
                my, mx = divmod(unit, mcux)
                for ci, (c, dct, _) in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bidx = ((my * c["v"] + by) * c["bx_full"]
                                    + mx * c["h"] + bx)
                            if ah == 0:
                                dc_first(c, dct, bidx, ci)
                            else:
                                dc_refine(c, bidx)
            else:
                c, dct, _ = scan[0]
                by_, bx_ = divmod(unit, c["bx"])
                bidx = by_ * c["bx_full"] + bx_
                if ah == 0:
                    dc_first(c, dct, bidx, 0)
                else:
                    dc_refine(c, bidx)
        else:
            c, _, act = scan[0]
            by_, bx_ = divmod(unit, c["bx"])
            bidx = by_ * c["bx_full"] + bx_
            if ah == 0:
                ac_first(c, act, bidx)
            else:
                ac_refine(c, act, bidx)
    return _next_marker_pos(data, br.pos)


def _prog_finish(comps, qtabs, h, w, hmax, vmax) -> np.ndarray:
    """Dequantize + IDCT every accumulated block (vectorized einsum,
    one shot per component), reassemble planes, upsample, crop."""
    planes = []
    for c in comps:
        qt = qtabs[c["tq"]].astype(np.float64)
        n = c["coef"].shape[0]
        blocks = np.zeros((n, 64), np.float64)
        blocks[:, _ZIGZAG] = c["coef"].astype(np.float64)
        blk = blocks.reshape(n, 8, 8) * qt
        pix = np.einsum("ji,njk,kl->nil", _D8, blk, _D8) + 128.0
        by_f, bx_f = c["by_full"], c["bx_full"]
        plane = (pix.reshape(by_f, bx_f, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by_f * 8, bx_f * 8))
        if c["h"] < hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(planes) != 3:
        raise JpegError(f"{len(planes)}-component frame unsupported")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


# ------------------------------------------------ EXIF orientation


def _parse_exif_orientation(tiff: bytes) -> int:
    """TIFF IFD0 tag 0x0112 (SHORT) → orientation 1..8, else 0."""
    if len(tiff) < 8:
        return 0
    if tiff[:2] == b"II":
        fmt = "<"
    elif tiff[:2] == b"MM":
        fmt = ">"
    else:
        return 0
    magic, ifd_off = struct.unpack_from(fmt + "HI", tiff, 2)
    if magic != 42 or ifd_off + 2 > len(tiff):
        return 0
    (n,) = struct.unpack_from(fmt + "H", tiff, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(tiff):
            return 0
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", tiff, off)
        if tag == 0x0112 and typ == 3 and cnt >= 1:
            (val,) = struct.unpack_from(fmt + "H", tiff, off + 8)
            return val if 1 <= val <= 8 else 0
    return 0


def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """The 8 standard EXIF display transforms (tag 0x0112) → upright
    pixels. 5-8 swap width/height."""
    if orientation in (0, 1):
        return px
    if orientation == 2:
        out = px[:, ::-1]
    elif orientation == 3:
        out = px[::-1, ::-1]
    elif orientation == 4:
        out = px[::-1, :]
    elif orientation == 5:
        out = np.transpose(px, (1, 0, 2))
    elif orientation == 6:      # rotate 90° CW
        out = np.transpose(px, (1, 0, 2))[:, ::-1]
    elif orientation == 7:
        out = np.transpose(px, (1, 0, 2))[::-1, ::-1]
    elif orientation == 8:      # rotate 90° CCW
        out = np.transpose(px, (1, 0, 2))[::-1, :]
    else:
        raise JpegError(f"EXIF orientation {orientation} invalid")
    return np.ascontiguousarray(out)


def _app1_exif(orientation: int) -> bytes:
    """Minimal big-endian EXIF APP1: one IFD0 entry (orientation)."""
    tiff = (b"MM" + struct.pack(">HI", 42, 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 0x0112, 3, 1)
            + struct.pack(">HH", orientation, 0)
            + struct.pack(">I", 0))
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


# ------------------------------------------------ progressive encode
# libjpeg's default scan script: exercises every Annex-G decode path
# (interleaved DC first at Al=1, banded AC firsts at two Al levels,
# AC refinement with EOB-run correction bits, DC refinement).
_PROG_SCRIPT: list[tuple[tuple[int, ...], int, int, int, int]] = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
]


class _SymbolStats:
    """Pass-1 emitter: records which Huffman symbols each scan uses."""

    def __init__(self):
        self.sets: dict[tuple[str, int], set[int]] = {}

    def sym(self, slot, s):
        self.sets.setdefault(slot, set()).add(s)

    def bits(self, v, n):
        pass

    def restart(self):
        pass


class _BitEmitter:
    """Pass-2 emitter: writes real codes through a _BitWriter."""

    def __init__(self, codes: dict):
        self.bw = _BitWriter()
        self.codes = codes
        self.rst = 0

    def sym(self, slot, s):
        code, length = self.codes[slot][s]
        self.bw.put(code, length)

    def bits(self, v, n):
        self.bw.put(v, n)

    def restart(self):
        self.bw.flush()
        self.bw.out += bytes([0xFF, 0xD0 + self.rst])
        self.rst = (self.rst + 1) % 8


def _flat_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """All symbols at one code length L with len+1 ≤ 2^L, so the
    all-ones code stays unused (T.81 Annex C padding rule). Optimal
    compression is irrelevant here; spec validity is what matters."""
    vals = sorted(symbols) or [0]
    length = max(1, len(vals).bit_length())
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, vals


def _flush_eobrun(em, slot, st) -> None:
    """Emit a pending EOBn symbol + its appended run bits + any
    buffered correction bits (G.1.2.3)."""
    n = st["eobrun"]
    if n > 0:
        nbits = n.bit_length() - 1
        em.sym(slot, nbits << 4)
        if nbits:
            em.bits(n & ((1 << nbits) - 1), nbits)
        for b in st["corr"]:
            em.bits(b, 1)
        st["eobrun"] = 0
        st["corr"] = []


def _ac_first_block(em, slot, coef, ss, se, al, st) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(coef[k])
        t = abs(v) >> al            # AC point transform: magnitude shift
        if t == 0:
            r += 1
            continue
        _flush_eobrun(em, slot, st)
        while r > 15:
            em.sym(slot, 0xF0)      # ZRL
            r -= 16
        ssss = t.bit_length()
        tv = t if v > 0 else -t
        em.sym(slot, (r << 4) | ssss)
        em.bits(tv if tv > 0 else tv + (1 << ssss) - 1, ssss)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(em, slot, st)


def _ac_refine_block(em, slot, coef, ss, se, al, st) -> None:
    """G.1.2.3 AC successive-approximation refinement: newly-significant
    coefficients get (run|1)+sign, history coefficients get buffered
    correction bits emitted after the next symbol (or with the EOBn)."""
    absv = [0] * (se + 1)
    eob = ss - 1                    # last newly-significant position
    for k in range(ss, se + 1):
        t = abs(int(coef[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    pend: list[int] = []            # correction bits since last symbol
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eobrun(em, slot, st)
            em.sym(slot, 0xF0)
            r -= 16
            for b in pend:
                em.bits(b, 1)
            pend = []
        if t > 1:                   # history-nonzero → correction bit
            pend.append(t & 1)
            continue
        _flush_eobrun(em, slot, st)
        em.sym(slot, (r << 4) | 1)
        em.bits(1 if int(coef[k]) > 0 else 0, 1)
        for b in pend:
            em.bits(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:               # trailing zeros/corrections → EOB run
        st["eobrun"] += 1
        st["corr"].extend(pend)
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(em, slot, st)


def _emit_prog_scan(em, planes, geom, scan_comps, ss, se, ah, al,
                    restart_interval) -> None:
    """Drive one scan through an emitter (symbol pass or bit pass)."""
    # MCU-unit list: each unit is [(ci, block_index), ...]
    if len(scan_comps) > 1:         # interleaved (DC scans only)
        mcux, mcuy = geom["mcux"], geom["mcuy"]
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci in scan_comps:
                    g = geom["comps"][ci]
                    for by in range(g["v"]):
                        for bx in range(g["h"]):
                            unit.append((ci, (my * g["v"] + by) * g["bx_full"]
                                         + mx * g["h"] + bx))
                units.append(unit)
    else:
        ci = scan_comps[0]
        g = geom["comps"][ci]
        units = [[(ci, r * g["bx_full"] + c)]
                 for r in range(g["by"]) for c in range(g["bx"])]

    preds = {ci: 0 for ci in scan_comps}
    st = {"eobrun": 0, "corr": []}
    ac_slot = ("ac", 0 if scan_comps[0] == 0 else 1)
    for u, unit in enumerate(units):
        if restart_interval and u and u % restart_interval == 0:
            if ss > 0:
                _flush_eobrun(em, ac_slot, st)
            em.restart()
            preds = {ci: 0 for ci in scan_comps}
        for ci, bidx in unit:
            coef = planes[ci][bidx]
            if ss == 0:
                if ah == 0:         # DC first: diff-code dc >> Al
                    v = int(coef[0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    ssss, bits = _magnitude(diff)
                    em.sym(("dc", 0 if ci == 0 else 1), ssss)
                    em.bits(bits, ssss)
                else:               # DC refine: one raw bit
                    em.bits((int(coef[0]) >> al) & 1, 1)
            elif ah == 0:
                _ac_first_block(em, ac_slot, coef, ss, se, al, st)
            else:
                _ac_refine_block(em, ac_slot, coef, ss, se, al, st)
    if ss > 0:
        _flush_eobrun(em, ac_slot, st)


def jpeg_encode_progressive(pixels: np.ndarray, quality: int = 90,
                            subsampling: str = "444",
                            exif_orientation: int = 0,
                            restart_interval: int = 0) -> bytes:
    """8-bit RGB HxWx3 → progressive (SOF2) JFIF bytes, libjpeg's
    default 10-scan script, per-scan flat Huffman tables. Progressive
    re-encoding is lossless over the quantized coefficients, so
    decoding this output is bit-identical to decoding
    ``jpeg_encode(pixels, quality, subsampling)``."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise JpegError("jpeg_encode_progressive expects uint8 HxWx3 RGB")
    if subsampling not in ("444", "420"):
        raise JpegError(f"subsampling {subsampling!r} unsupported")
    s420 = subsampling == "420"
    h, w = pixels.shape[:2]
    mcu_px = 16 if s420 else 8
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)
    q_lum = _quality_scale(_QT_LUM, quality)
    q_chr = _quality_scale(_QT_CHROM, quality)
    if s420:
        cb = ycc[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = ycc[..., 1], ycc[..., 2]
    planes = [
        _encode_plane_coeffs(ycc[..., 0], q_lum),
        _encode_plane_coeffs(cb, q_chr),
        _encode_plane_coeffs(cr, q_chr),
    ]
    # geometry: full (padded) grid for interleaved scans, true
    # ceil(dims/8) grid for non-interleaved AC scans
    if s420:
        geom_comps = [
            {"h": 2, "v": 2, "bx_full": pw // 8, "by_full": ph // 8,
             "bx": -(-w // 8), "by": -(-h // 8)},
            {"h": 1, "v": 1, "bx_full": pw // 16, "by_full": ph // 16,
             "bx": -(-(-(-w // 2)) // 8), "by": -(-(-(-h // 2)) // 8)},
            {"h": 1, "v": 1, "bx_full": pw // 16, "by_full": ph // 16,
             "bx": -(-(-(-w // 2)) // 8), "by": -(-(-(-h // 2)) // 8)},
        ]
        mcux, mcuy = pw // 16, ph // 16
    else:
        g = {"h": 1, "v": 1, "bx_full": pw // 8, "by_full": ph // 8,
             "bx": -(-w // 8), "by": -(-h // 8)}
        geom_comps = [dict(g), dict(g), dict(g)]
        mcux, mcuy = pw // 8, ph // 8
    geom = {"mcux": mcux, "mcuy": mcuy, "comps": geom_comps}

    y_hv = 0x22 if s420 else 0x11
    out = bytearray(b"\xff\xd8")                               # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"  # APP0
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    if 1 <= exif_orientation <= 8:
        out += _app1_exif(exif_orientation)
    for tq, qt in ((0, q_lum), (1, q_chr)):                    # DQT
        body = bytes([tq]) + bytes(qt.reshape(-1)[_ZIGZAG].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    out += (b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
            + bytes([1, y_hv, 0, 2, 0x11, 1, 3, 0x11, 1]))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for scan_comps, ss, se, ah, al in _PROG_SCRIPT:
        stats = _SymbolStats()
        _emit_prog_scan(stats, planes, geom, scan_comps, ss, se, ah, al,
                        restart_interval)
        codes = {}
        for slot, syms in stats.sets.items():
            bits, vals = _flat_table(syms)
            codes[slot] = _canonical_codes(bits, vals)
            tc = 0x10 if slot[0] == "ac" else 0x00
            out += _dht_segment(tc | slot[1], bits, vals)
        em = _BitEmitter(codes)
        _emit_prog_scan(em, planes, geom, scan_comps, ss, se, ah, al,
                        restart_interval)
        em.bw.flush()
        ns = len(scan_comps)
        out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ns) + bytes([ns])
        for ci in scan_comps:
            td = (0 if ci == 0 else 1) if ss == 0 and ah == 0 else 0
            ta = (0 if ci == 0 else 1) if ss > 0 else 0
            out += bytes([ci + 1, (td << 4) | ta])
        out += bytes([ss, se, (ah << 4) | al])
        out += em.bw.out
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)
