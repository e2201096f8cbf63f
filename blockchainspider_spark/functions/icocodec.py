"""ICO (favicon) container codec in pure numpy.

Crawlers fetch favicons on nearly every host they touch; ICO is a
directory of images where each entry is either a PNG payload or a
headerless DIB with ICO-specific quirks (BITMAPINFOHEADER height is
DOUBLED to cover the 1-bit AND transparency mask, and 0 in the
directory's width/height byte means 256). Everything derives from the
public ICONDIR/BITMAPINFOHEADER layouts.

* decode — picks the largest entry by default (or ``index=``); PNG
  entries route through the real PNG codec, DIB entries decode 32bpp
  BGRA, 24bpp BGR, and 8bpp palette (bottom-up, stride-padded), with
  transparency dropped at the RGB boundary like every other codec
  here (alpha/AND mask ignored).
* encode — one entry per image, ``entry_format`` 'png' (the modern
  form) or 'dib' (classic 32bpp BGRA + all-opaque AND mask), so both
  decode paths are round-trip-pinned.
"""

from __future__ import annotations

import struct

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class IcoError(ValueError):
    pass


def _dib_entry(pixels: np.ndarray) -> bytes:
    """uint8 HxWx3 → ICO DIB payload: BITMAPINFOHEADER with doubled
    height, bottom-up 32bpp BGRA XOR data, all-opaque AND mask."""
    h, w = pixels.shape[:2]
    bgra = np.zeros((h, w, 4), np.uint8)
    bgra[..., 0] = pixels[..., 2]
    bgra[..., 1] = pixels[..., 1]
    bgra[..., 2] = pixels[..., 0]
    bgra[..., 3] = 255
    xor = bgra[::-1].tobytes()                      # bottom-up
    and_stride = ((w + 31) // 32) * 4               # 1bpp rows, 32-bit pad
    and_mask = b"\x00" * (and_stride * h)
    hdr = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
                      len(xor) + len(and_mask), 0, 0, 0, 0)
    return hdr + xor + and_mask


def ico_encode(images: list[np.ndarray] | np.ndarray,
               entry_format: str = "png") -> bytes:
    """One or more uint8 HxWx3 images (≤256×256 each) → ICO bytes."""
    if isinstance(images, np.ndarray):
        images = [images]
    if entry_format not in ("png", "dib"):
        raise IcoError(f"entry_format {entry_format!r} unsupported")
    if not images:
        raise IcoError("ico_encode needs at least one image")
    payloads = []
    for px in images:
        if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
            raise IcoError("ico_encode expects uint8 HxWx3 RGB images")
        h, w = px.shape[:2]
        if h > 256 or w > 256:
            raise IcoError(f"{w}x{h} exceeds ICO's 256-pixel limit")
        if entry_format == "png":
            from blockchainspider_spark.functions.imagecodec import png_encode

            payloads.append(png_encode(px))
        else:
            payloads.append(_dib_entry(px))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    offset = 6 + 16 * len(images)
    for px, payload in zip(images, payloads):
        h, w = px.shape[:2]
        out += struct.pack("<BBBBHHII",
                           w & 0xFF, h & 0xFF,       # 0 means 256
                           0, 0, 1, 32, len(payload), offset)
        offset += len(payload)
    for payload in payloads:
        out += payload
    return bytes(out)


def _decode_dib_entry(data: bytes) -> np.ndarray:
    hdr_size, w, h2, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 0)
    if hdr_size < 40:
        raise IcoError(f"DIB header size {hdr_size} unsupported")
    if comp != 0:
        raise IcoError(f"compressed ICO DIB (comp {comp}) unsupported")
    if h2 % 2:
        raise IcoError("ICO DIB height must be doubled (XOR + AND mask)")
    h = h2 // 2
    if bpp == 32:
        raw = np.frombuffer(data[hdr_size:hdr_size + 4 * w * h], np.uint8)
        if len(raw) < 4 * w * h:
            raise IcoError("ICO DIB pixel data short")
        bgra = raw.reshape(h, w, 4)
        rgb = bgra[..., 2::-1]
    elif bpp == 24:
        stride = (w * 3 + 3) & ~3
        raw = np.frombuffer(data[hdr_size:hdr_size + stride * h], np.uint8)
        if len(raw) < stride * h:
            raise IcoError("ICO DIB pixel data short")
        rgb = raw.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)[..., ::-1]
    elif bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 32)
        n_colors = n_colors or 256
        pal = np.frombuffer(data[hdr_size:hdr_size + 4 * n_colors],
                            np.uint8).reshape(n_colors, 4)[:, 2::-1]
        stride = (w + 3) & ~3
        base = hdr_size + 4 * n_colors
        raw = np.frombuffer(data[base:base + stride * h], np.uint8)
        if len(raw) < stride * h:
            raise IcoError("ICO DIB pixel data short")
        idx = raw.reshape(h, stride)[:, :w]
        if (idx >= n_colors).any():
            raise IcoError("ICO palette index out of range")
        rgb = pal[idx]
    else:
        raise IcoError(f"ICO DIB bitcount {bpp} unsupported (8/24/32)")
    return np.ascontiguousarray(rgb[::-1])          # bottom-up → top-down


def ico_entries(data: bytes) -> list[tuple[int, int, int, int]]:
    """Directory listing: (width, height, size, offset) per entry,
    with the 0-means-256 rule applied."""
    if len(data) < 6:
        raise IcoError("ICO too short")
    reserved, rtype, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or rtype != 1 or count == 0:
        raise IcoError("not an ICO (ICONDIR reserved/type/count invalid)")
    out = []
    for i in range(count):
        w, h, _pc, _rsv, _planes, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", data, 6 + 16 * i)
        out.append((w or 256, h or 256, size, off))
    return out


def ico_decode(data: bytes, index: int | None = None) -> np.ndarray:
    """ICO bytes → uint8 HxWx3 RGB of the LARGEST entry (or ``index``).
    PNG entries route through the PNG codec; DIB entries through the
    ICO-quirk DIB path."""
    entries = ico_entries(data)
    if index is None:
        index = max(range(len(entries)),
                    key=lambda i: entries[i][0] * entries[i][1])
    if not 0 <= index < len(entries):
        raise IcoError(f"entry {index} out of range ({len(entries)} entries)")
    _w, _h, size, off = entries[index]
    payload = data[off:off + size]
    if payload[:8] == _PNG_SIG:
        from blockchainspider_spark.functions.imagecodec import png_decode

        return png_decode(payload)
    return _decode_dib_entry(payload)
