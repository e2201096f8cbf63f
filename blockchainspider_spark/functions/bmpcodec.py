"""Real BMP codec (Windows BITMAPINFOHEADER DIBs) in pure numpy.

Reference parity: BlockchainSpider caches arbitrary fetched payloads
(middlewares cache any content-type); BMP is the fourth real image
format on the payload path after PNG, baseline JPEG and GIF. The pixel
layout (bottom-up BGR rows padded to 4 bytes) is the same DIB grammar
functions/avicodec.py already round-trips inside AVI 'movi' chunks —
here it sits behind the standalone BITMAPFILEHEADER.

Scope, honestly stated:
* encode — 24bpp uncompressed BI_RGB, bottom-up (the universally
  compatible form).
* decode — 24bpp BI_RGB (bottom-up, and top-down via negative height)
  and 8bpp palette BI_RGB; other depths/compressions raise loudly
  (BI_RLE8 etc. are vanishingly rare in crawled corpora).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def bmp_encode(pixels: np.ndarray) -> bytes:
    """uint8 HxWx3 RGB → 24bpp bottom-up BI_RGB BMP (lossless)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise BmpError(f"expected uint8 HxWx3, got {pixels.dtype} {pixels.shape}")
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # top-down RGB → bottom-up BGR
    pix = rows.tobytes()
    offset = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    file_hdr = b"BM" + struct.pack("<IHHI", offset + len(pix), 0, 0, offset)
    return file_hdr + info + pix


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP → uint8 HxWx3 RGB. 24bpp BI_RGB (either row order) and
    8bpp palette images decode; everything else raises loudly."""
    if data[:2] != b"BM":
        raise BmpError(f"not a BMP header: {data[:2]!r}")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h_signed, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if hdr_size < 40:
        raise BmpError(f"BITMAPCOREHEADER (size {hdr_size}): not supported")
    if comp != 0 or bpp not in (8, 24):
        raise BmpError(
            f"BMP compression {comp} bitcount {bpp}: only uncompressed "
            "BI_RGB 8bpp-palette and 24bpp decode in this container"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        raw = np.frombuffer(data[offset : offset + stride * h], np.uint8)
        if len(raw) < stride * h:
            raise BmpError(f"pixel data short: {len(raw)} of {stride * h} bytes")
        bgr = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
    else:
        # palette: n_colors BGRX quads between the info header and the pixels
        (n_colors,) = struct.unpack_from("<I", data, 14 + 32)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRX → RGB
        stride = (w + 3) & ~3
        raw = np.frombuffer(data[offset : offset + stride * h], np.uint8)
        if len(raw) < stride * h:
            raise BmpError(f"pixel data short: {len(raw)} of {stride * h} bytes")
        idx = raw.reshape(h, stride)[:, :w]
        if (idx >= n_colors).any():
            raise BmpError("palette index out of range")
        rgb = pal[idx]
    return rgb.copy() if top_down else rgb[::-1].copy()
