"""Real GIF codec (GIF87a encode, GIF87a/89a decode) in pure numpy.

Reference parity: BlockchainSpider fetches arbitrary web payloads
(middlewares cache any content-type); GIF is the third real image
format on the payload path after PNG and baseline JPEG
(functions/imagecodec.py, functions/jpegcodec.py).

Scope, honestly stated:
* encode — single-frame, non-interlaced, one global color table built
  from the EXACT color set; images with more than 256 distinct colors
  raise (quantize first — silent quantization would corrupt the
  lossless round-trip contract this codec is pinned on).
* decode — single- or multi-frame files (first frame returned),
  global/local color tables, 87a and 89a, extensions skipped,
  transparency ignored; interlaced images de-interlace per the spec's
  four-pass row schedule (8/0, 8/4, 4/2, 2/1).
* LZW per the GIF spec: variable-width codes from min_code_size+1 up
  to 12 bits, clear/EOI codes, LSB-first bit packing, 255-byte
  sub-blocks, dictionary reset on overflow; decoder handles the
  KwKwK self-referencing case.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    s = b""
    for ix in indices.tolist():
        c = bytes([ix])
        if s + c in table:
            s += c
            continue
        emit(table[s])
        table[s + c] = next_code
        next_code += 1
        # width grows AFTER a code that needs it could be emitted
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        s = c
    if s:
        emit(table[s])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()

    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                # missing EOI: tolerated by most renderers; stop cleanly
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)

        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise GifError(f"LZW: code {code} out of range (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def quantize_palette(pixels: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Deterministic median-cut color quantization: the explicit opt-in
    for gif_encode on >256-color images (the encoder itself never
    quantizes silently). Boxes split on the widest channel at the
    count-weighted median; each pixel maps to its box's count-weighted
    mean. Images already within ``n_colors`` return unchanged.
    Everything is integer/argsort arithmetic on the sorted unique-color
    table — no RNG, so the palette is reproducible across runs.
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise GifError(f"expected HxWx3, got {pixels.shape}")
    flat = pixels.reshape(-1, 3)
    colors, inverse, counts = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True
    )
    if len(colors) <= n_colors:
        return pixels
    boxes = [np.arange(len(colors))]
    while len(boxes) < n_colors:
        # split the box with the largest (range × count) spread
        best, best_score = -1, -1
        for i, b in enumerate(boxes):
            if len(b) < 2:
                continue
            score = int(colors[b].ptp(axis=0).max()) * int(counts[b].sum())
            if score > best_score:
                best, best_score = i, score
        if best < 0:
            break
        b = boxes.pop(best)
        ch = int(colors[b].ptp(axis=0).argmax())
        order = b[np.argsort(colors[b, ch], kind="stable")]
        cum = np.cumsum(counts[order])
        cut = int(np.searchsorted(cum, cum[-1] / 2)) + 1
        cut = min(max(cut, 1), len(order) - 1)
        boxes += [order[:cut], order[cut:]]
    color_to_box = np.empty(len(colors), np.int32)
    pal = np.empty((len(boxes), 3), np.uint8)
    for i, b in enumerate(boxes):
        color_to_box[b] = i
        w = counts[b].astype(np.float64)
        pal[i] = np.clip(np.round((colors[b] * w[:, None]).sum(0) / w.sum()), 0, 255)
    return pal[color_to_box[inverse]].reshape(pixels.shape)


def gif_encode(pixels: np.ndarray) -> bytes:
    """uint8 HxWx3 → single-frame non-interlaced GIF87a. Lossless: the
    palette is the exact distinct-color set (≤256 or GifError)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise GifError(f"expected HxWx3, got {pixels.shape}")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError(
            f"{len(colors)} distinct colors > 256 — quantize before gif_encode "
            "(this codec never quantizes silently)"
        )
    # palette size must be a power of two ≥ 2
    depth = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << depth, 3), np.uint8)
    pal[: len(colors)] = colors

    out = bytearray(b"GIF87a")
    # logical screen descriptor: global color table, depth-1 sizes
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += pal.tobytes()
    # image descriptor, no local table, not interlaced
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(2, depth)
    out.append(min_code_size)
    lzw = _lzw_encode(indices.astype(np.uint8), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def gif_decode(data: bytes) -> np.ndarray:
    """GIF87a/89a → uint8 HxWx3 (first image frame)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError(f"not a GIF header: {data[:6]!r}")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise GifError(f"unexpected block 0x{b:02x} at {pos - 1}")
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifError("image has neither global nor local color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code_size), np.uint8)
        if len(idx) < w * h:
            raise GifError(f"LZW stream short: {len(idx)} of {w * h} pixels")
        if (idx[: w * h] >= len(pal)).any():
            raise GifError("palette index out of range")
        img = pal[idx[: w * h]].reshape(h, w, 3)
        if iflags & 0x40:
            out_img = np.empty_like(img)
            out_img[interlace_row_order(h)] = img
            return out_img
        return img
    raise GifError("no image descriptor found")


def interlace_row_order(h: int) -> np.ndarray:
    """Storage order of row indices for an interlaced image of height
    ``h`` — the spec's four passes: every 8th row from 0, every 8th
    from 4, every 4th from 2, every 2nd from 1. Stored row k carries
    display row ``order[k]``, so decode is ``out[order] = stored``."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
