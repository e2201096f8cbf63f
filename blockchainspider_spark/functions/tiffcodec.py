"""Real baseline TIFF 6.0 codec in pure numpy.

Fifth real image format on the crawl payload path (after PNG, JPEG,
GIF, BMP — functions/imagecodec.py and siblings). Everything derives
from the public TIFF 6.0 specification; no codec library exists in the
container.

Scope, honestly stated:
* decode — both byte orders (II little / MM big), classic (non-Big)
  TIFF, first IFD; strips via RowsPerStrip/StripOffsets/StripByteCounts
  (any strip height); 8-bit samples; PhotometricInterpretation 1
  (BlackIsZero gray, broadcast to RGB), 2 (RGB, extra samples such as
  alpha dropped), 3 (palette via the 16-bit ColorMap, high byte);
  Compression 1 (none), 5 (LZW — MSB-first packing with the spec's
  EARLY-CHANGE width bump, the classic divergence from GIF LZW) and
  32773 (PackBits), each optionally under horizontal differencing
  (Predictor 2). Chunky planar config only; tiled TIFFs, 16-bit
  samples, and planar=2 raise loudly.
* encode — uint8 HxWx3 RGB, chunky, strips of ``rows_per_strip``,
  either byte order, compression none / packbits / lzw (LZW pairs
  with Predictor 2 by default, like real writers). Lossless: decode
  returns the exact input pixels.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


# --------------------------------------------------------------- LZW
# TIFF 6.0 §13: MSB-first bit packing, Clear=256 EOI=257, first entry
# 258, and the "early change" quirk: the code width bumps when the
# NEXT entry would overflow (one code earlier than GIF's LSB variant).


def _lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    s = b""
    for b in data:
        c = bytes([b])
        if s + c in table:
            s += c
            continue
        emit(table[s])
        table[s + c] = next_code
        next_code += 1
        # early change: widen when next_code+1 would not fit
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:          # keep a slot below 4095 + early change
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        s = c
    if s:
        emit(table[s])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)      # missing EOI tolerated
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise TiffError(f"LZW: code {code} out of range (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        # early change, decoder side: the decoder's table lags the
        # encoder's by ONE entry (the encoder adds after writing, the
        # decoder after the NEXT read), so it must widen at 2^w - 2
        # where the encoder widens at 2^w - 1 — the classic TIFF-LZW
        # desync spot
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry


# ----------------------------------------------------------- PackBits


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)      # -(run-1) as unsigned
            out.append(data[i])
            i += run
            continue
        j = i + 1
        while (j < n and j - i < 128
               and not (j + 1 < n and data[j] == data[j + 1])):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128 = no-op per spec
    if len(out) < expected:
        raise TiffError(f"PackBits short: {len(out)} of {expected} bytes")
    return bytes(out[:expected])


# ------------------------------------------------------------- encode

_COMP = {"none": 1, "lzw": 5, "packbits": 32773}


def _entry(fmt: str, tag: int, typ: int, count: int, value: int) -> bytes:
    head = struct.pack(fmt + "HHI", tag, typ, count)
    if typ == 3 and count == 1:
        # inline SHORT occupies the FIRST two bytes of the value field
        # (TIFF 6.0 §2) — packing it as a 4-byte int breaks MM files
        return head + struct.pack(fmt + "H", value) + b"\x00\x00"
    return head + struct.pack(fmt + "I", value)


def tiff_encode(pixels: np.ndarray, compression: str = "lzw",
                byte_order: str = "II", rows_per_strip: int = 8,
                predictor: bool | None = None) -> bytes:
    """uint8 HxWx3 RGB → classic TIFF. ``predictor`` defaults to
    horizontal differencing for LZW (what real writers emit) and off
    otherwise."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise TiffError("tiff_encode expects uint8 HxWx3 RGB")
    if compression not in _COMP:
        raise TiffError(f"compression {compression!r} unsupported")
    if byte_order not in ("II", "MM"):
        raise TiffError("byte_order must be 'II' or 'MM'")
    if predictor is None:
        predictor = compression == "lzw"
    if predictor and compression == "none":
        raise TiffError("Predictor 2 requires a compression scheme")
    fmt = "<" if byte_order == "II" else ">"
    h, w, _ = pixels.shape
    rows_per_strip = max(1, min(rows_per_strip, h))

    strips: list[bytes] = []
    for y0 in range(0, h, rows_per_strip):
        block = pixels[y0:y0 + rows_per_strip].astype(np.int16)
        if predictor:
            block[:, 1:] -= pixels[y0:y0 + rows_per_strip, :-1].astype(np.int16)
        raw = (block & 0xFF).astype(np.uint8).tobytes()
        if compression == "none":
            strips.append(raw)
        elif compression == "lzw":
            strips.append(_lzw_encode(raw))
        else:
            strips.append(_packbits_encode(raw))

    n_strips = len(strips)
    # layout: header(8) | strip data | [strip offset/count arrays if >1]
    # | IFD | bits-per-sample array
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    extra = bytearray()
    if n_strips > 1:
        off_array_pos = pos
        for o in offsets:
            extra += struct.pack(fmt + "I", o)
        cnt_array_pos = pos + 4 * n_strips
        for s in strips:
            extra += struct.pack(fmt + "I", len(s))
        pos += len(extra)
    ifd_pos = pos
    tags = [
        (256, 4, 1, w),                       # ImageWidth
        (257, 4, 1, h),                       # ImageLength
        (258, 3, 3, 0),                       # BitsPerSample → array, patched
        (259, 3, 1, _COMP[compression]),      # Compression
        (262, 3, 1, 2),                       # Photometric RGB
        (273, 4, n_strips,
         offsets[0] if n_strips == 1 else off_array_pos),   # StripOffsets
        (277, 3, 1, 3),                       # SamplesPerPixel
        (278, 4, 1, rows_per_strip),          # RowsPerStrip
        (279, 4, n_strips,
         len(strips[0]) if n_strips == 1 else cnt_array_pos),  # StripByteCounts
        (284, 3, 1, 1),                       # PlanarConfig chunky
    ]
    if predictor:
        tags.append((317, 3, 1, 2))
    tags.sort()
    ifd_len = 2 + 12 * len(tags) + 4
    bps_pos = ifd_pos + ifd_len
    out = bytearray()
    out += byte_order.encode() + struct.pack(fmt + "HI", 42, ifd_pos)
    for s in strips:
        out += s
    out += extra
    out += struct.pack(fmt + "H", len(tags))
    for tag, typ, count, value in tags:
        if tag == 258:
            out += _entry(fmt, 258, 3, 3, bps_pos)
        else:
            out += _entry(fmt, tag, typ, count, value)
    out += struct.pack(fmt + "I", 0)          # next IFD
    out += struct.pack(fmt + "HHH", 8, 8, 8)  # BitsPerSample values
    return bytes(out)


# ------------------------------------------------------------- decode


def _read_values(fmt: str, data: bytes, typ: int, count: int, raw: bytes):
    sizes = {1: 1, 3: 2, 4: 4}
    if typ not in sizes:
        raise TiffError(f"IFD value type {typ} unsupported")
    total = sizes[typ] * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(fmt + "I", raw)
        buf = data[off:off + total]
    code = {1: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(fmt + code * count, buf))


def tiff_decode(data: bytes) -> np.ndarray:
    """Classic TIFF → uint8 HxWx3 RGB (gray broadcast, palette mapped,
    alpha dropped). Raises TiffError on tiles/16-bit/planar=2/unknown
    compression."""
    if data[:2] not in (b"II", b"MM"):
        raise TiffError(f"not a TIFF header: {data[:4]!r}")
    fmt = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(fmt + "HI", data[2:8])
    if magic != 42:
        raise TiffError(f"bad TIFF magic {magic} (43 = BigTIFF, unsupported)")
    (n_tags,) = struct.unpack(fmt + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(fmt + "HHI", data[off:off + 8])
        tags[tag] = _read_values(fmt, data, typ, count, data[off + 8:off + 12])

    if 322 in tags or 323 in tags:
        raise TiffError("tiled TIFF unsupported (strips only)")
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    if not w or not h:
        raise TiffError("missing ImageWidth/ImageLength")
    bps = tags.get(258, [1])
    if any(b != 8 for b in bps):
        raise TiffError(f"BitsPerSample {bps} unsupported (8-bit only)")
    spp = tags.get(277, [len(bps)])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    planar = tags.get(284, [1])[0]
    if planar != 1:
        raise TiffError(f"planar configuration {planar} unsupported (chunky only)")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise TiffError(f"predictor {predictor} unsupported")
    rps = tags.get(278, [h])[0] or h
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets:
        raise TiffError("missing StripOffsets")
    if not counts:
        raise TiffError("missing StripByteCounts")

    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_h = min(rps, h - si * rps)
        expected = strip_h * w * spp
        raw = data[off:off + cnt]
        if comp == 1:
            if len(raw) < expected:
                raise TiffError("uncompressed strip short")
            buf = raw[:expected]
        elif comp == 5:
            buf = _lzw_decode(raw)
            if len(buf) < expected:
                raise TiffError(f"LZW strip short: {len(buf)} of {expected}")
            buf = buf[:expected]
        elif comp == 32773:
            buf = _packbits_decode(raw, expected)
        else:
            raise TiffError(f"compression {comp} unsupported")
        block = np.frombuffer(buf, np.uint8).reshape(strip_h, w, spp)
        if predictor == 2:
            block = np.cumsum(block.astype(np.int64), axis=1).astype(np.uint8)
        rows.append(block)
    img = np.concatenate(rows, axis=0)

    if photo == 3:                              # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise TiffError("palette image without a full ColorMap")
        pal = (np.array(cmap, np.uint32).reshape(3, -1).T >> 8).astype(np.uint8)
        return pal[img[..., 0]]
    if photo == 2:                              # RGB (+ extra samples)
        if spp < 3:
            raise TiffError(f"RGB photometric with {spp} samples")
        return np.ascontiguousarray(img[..., :3])
    if photo == 1:                              # BlackIsZero gray
        g = img[..., 0]
        return np.stack([g, g, g], axis=-1)
    raise TiffError(f"photometric {photo} unsupported")
