"""Image payload codecs + invariants, pure numpy/zlib (no PIL in env).

The payload table (BASELINE.json input_hint) carries opaque ``bytes``
per row. Two codecs ship:

* ``png`` — a real, spec-conformant PNG codec. Encoder writes the
  8-bit RGB / filter-0 / one-IDAT subset (losslessly round-trips
  through any standards-compliant reader); decoder handles filters
  0-4, Adam7 interlacing (seven independently-filtered passes
  scattered onto the pass grid), and every 8-bit color type — gray,
  RGB, palette via PLTE, gray+alpha, RGBA (alpha dropped; 16-bit and
  sub-8-bit depths raise loudly).
* ``jpeg`` — a REAL baseline JFIF codec (functions/jpegcodec.py:
  DCT/Huffman per ITU-T T.81, pure numpy) since round 6. The legacy
  ``qjpeg`` synthetic codec (quantize+zlib, ``QJPG`` magic) is kept
  only to decode r≤5 fixture payloads; ``decode`` dispatches on magic.

Invariant helpers: ``psnr`` (decoded-pixel allclose analog) and
``phash64`` (DCT perceptual hash) — both vectorizable inside pandas UDFs
(functions/payload.py wires them into mapInPandas).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPEG_MAGIC = b"QJPG"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 → minimal valid PNG (color type 2, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per PNG spec §8.2
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


# channels per PNG color type at bit depth 8 (type 3 = palette indices)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_decode(data: bytes) -> np.ndarray:
    """PNG → uint8 HxWx3 RGB. Decodes every 8-bit color type — gray
    (0), RGB (2), palette (3, via PLTE), gray+alpha (4) and RGBA (6) —
    non-interlaced or Adam7. Alpha is DROPPED (feature pipelines read
    the color planes; tRNS likewise ignored); sub-8-bit depths and
    16-bit raise loudly."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat, w, interlace, ct, plte = 8, b"", 0, 0, 2, None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, ct = struct.unpack(">IIBB", body[:10])
            assert bit_depth == 8, f"subset: bit depth 8 only (got {bit_depth})"
            assert ct in _PNG_CHANNELS, f"bad PNG color type {ct}"
            interlace = body[12]
            assert interlace in (0, 1), f"bad PNG interlace method {interlace}"
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    ch = _PNG_CHANNELS[ct]
    if ct == 3 and plte is None:
        raise ValueError("palette PNG without a PLTE chunk")
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if not interlace:
        img = _png_unfilter(raw.reshape(-1, w * ch + 1), w, ch).reshape(-1, w, ch)
    else:
        # Adam7: seven independently-filtered sub-images concatenated in
        # the stream, scattered onto the pass grid (empty passes carry no
        # bytes)
        img = np.zeros((h, w, ch), np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * ch + 1
            rows = raw[off : off + ph * stride].reshape(ph, stride)
            off += ph * stride
            img[y0::ys, x0::xs] = _png_unfilter(rows, pw, ch).reshape(ph, pw, ch)
        assert off == len(raw), "interlaced PNG stream length mismatch"
    if ct == 2:
        return img
    if ct == 3:
        idx = img[..., 0]
        if (idx >= len(plte)).any():
            raise ValueError("PLTE index out of range")
        return plte[idx]
    if ct == 6:
        return img[..., :3].copy()
    # gray / gray+alpha → replicate the luma plane
    return np.repeat(img[..., :1], 3, axis=2)


def _png_unfilter(rows: np.ndarray, w: int, ch: int = 3) -> np.ndarray:
    """Undo PNG row filters over one (sub-)image: ``rows`` is
    (h, 1 + w*ch) filter-byte-prefixed scanlines; returns (h, w*ch)
    uint8. The left neighbor in Sub/Average/Paeth is ``ch`` bytes back
    (bpp per spec §9.2). Filter context never crosses sub-images —
    Adam7 passes call this independently, per spec."""
    h = rows.shape[0]
    out = np.zeros((h, w * ch), np.int32)
    for y in range(h):
        filt, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        if filt == 0:
            out[y] = line
        elif filt == 1:  # Sub
            acc = line.reshape(w, ch)
            for x in range(1, w):
                acc[x] = (acc[x] + acc[x - 1]) & 0xFF
            out[y] = acc.reshape(-1)
        elif filt == 2:  # Up
            out[y] = (line + out[y - 1]) & 0xFF if y else line
        elif filt == 3:  # Average
            prev = out[y - 1] if y else np.zeros(w * ch, np.int32)
            acc = line.reshape(w, ch)
            pr = prev.reshape(w, ch)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                acc[x] = (acc[x] + (left + pr[x]) // 2) & 0xFF
                left = acc[x]
            out[y] = acc.reshape(-1)
        elif filt == 4:  # Paeth
            prev = (out[y - 1] if y else np.zeros(w * ch, np.int32)).reshape(w, ch)
            acc = line.reshape(w, ch)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                up = prev[x]
                ul = prev[x - 1] if x else np.zeros(ch, np.int32)
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
                acc[x] = (acc[x] + pred) & 0xFF
                left = acc[x]
            out[y] = acc.reshape(-1)
        else:
            raise ValueError(f"bad PNG filter {filt}")
    return out.astype(np.uint8)


def qjpeg_encode(pixels: np.ndarray, step: int = 2) -> bytes:
    """Synthetic lossy codec: quantize channel values to ``step`` + zlib."""
    h, w, _ = pixels.shape
    if step == 2 and pixels.dtype == np.uint8:
        # (p & ~1) | 1 == p//2*2 + 1 for uint8 — same quantization, no
        # int32 round trip (the fetch kernel's hot default)
        q = (pixels & np.uint8(0xFE)) | np.uint8(1)
    else:
        q = (pixels.astype(np.int32) // step * step + step // 2).clip(0, 255).astype(np.uint8)
    header = _QJPEG_MAGIC + struct.pack(">HHB", w, h, step)
    return header + zlib.compress(q.tobytes(), 6)


def qjpeg_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _QJPEG_MAGIC, "not a qjpeg payload"
    w, h, _step = struct.unpack(">HHB", data[4:9])
    raw = np.frombuffer(zlib.decompress(data[9:]), np.uint8)
    return raw.reshape(h, w, 3)


def sniff_format(data: bytes) -> str | None:
    """Magic-number content sniffing for the payload dispatch. Real
    crawls cannot trust a server's Content-Type (or a table's ``fmt``
    column built from one): browsers sniff image bytes, and so must
    the payload path. Returns the codec key ``decode`` accepts, or
    None for unrecognized bytes."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:4] == b"\x00\x00\x01\x00" and len(data) >= 22:
        return "ico"
    if data[:4] == _QJPEG_MAGIC:
        return "jpeg"       # legacy r≤5 synthetic fixtures
    return None


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "auto":
        sniffed = sniff_format(data)
        if sniffed is None:
            raise ValueError(
                f"unrecognized image magic {bytes(data[:8])!r} — cannot sniff"
            )
        fmt = sniffed
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        if data[:2] == b"\xff\xd8":  # real JFIF bytes (round 6)
            from blockchainspider_spark.functions.jpegcodec import jpeg_decode

            return jpeg_decode(data)
        if data[:4] == _QJPEG_MAGIC:  # legacy r≤5 synthetic fixtures
            return qjpeg_decode(data)
        raise ValueError("jpeg payload is neither JFIF nor legacy qjpeg")
    if fmt == "gif":  # real LZW codec (round 6)
        from blockchainspider_spark.functions.gifcodec import gif_decode

        return gif_decode(data)
    if fmt == "bmp":  # real DIB codec (round 6)
        from blockchainspider_spark.functions.bmpcodec import bmp_decode

        return bmp_decode(data)
    if fmt == "tiff":  # real TIFF 6.0 codec (round 6 continuation)
        from blockchainspider_spark.functions.tiffcodec import tiff_decode

        return tiff_decode(data)
    if fmt == "webp":  # real VP8L lossless codec (round 6 continuation)
        from blockchainspider_spark.functions.webpcodec import webp_decode

        return webp_decode(data)
    if fmt == "ico":  # favicon container (round 6 continuation)
        from blockchainspider_spark.functions.icocodec import ico_decode

        return ico_decode(data)
    raise NotImplementedError(f"image format {fmt!r}: real decoder not in container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def ssim(a: np.ndarray, b: np.ndarray, win: int = 8) -> float:
    """Mean structural similarity (Wang et al. 2004) over non-overlapping
    ``win``×``win`` luma blocks with the standard constants
    C1=(0.01·255)², C2=(0.03·255)². Color inputs are converted to the
    same BT.601 luma as image_features; trailing partial blocks are
    dropped (inputs here are multiples of 8). Complements psnr() for
    codec gates: PSNR measures pointwise error, SSIM structural damage.
    """
    if a.shape != b.shape:
        raise ValueError(f"ssim: shape mismatch {a.shape} vs {b.shape}")
    luma = np.array([0.299, 0.587, 0.114])
    ya = a.astype(np.float64) @ luma if a.ndim == 3 else a.astype(np.float64)
    yb = b.astype(np.float64) @ luma if b.ndim == 3 else b.astype(np.float64)
    h, w = ya.shape
    bh, bw = h // win, w // win
    if bh == 0 or bw == 0:
        raise ValueError(f"ssim: image {w}x{h} smaller than the {win}x{win} window")
    pa = ya[: bh * win, : bw * win].reshape(bh, win, bw, win).transpose(0, 2, 1, 3)
    pb = yb[: bh * win, : bw * win].reshape(bh, win, bw, win).transpose(0, 2, 1, 3)
    pa = pa.reshape(bh * bw, -1)
    pb = pb.reshape(bh * bw, -1)
    mu_a, mu_b = pa.mean(axis=1), pb.mean(axis=1)
    va = pa.var(axis=1)
    vb = pb.var(axis=1)
    cov = ((pa - mu_a[:, None]) * (pb - mu_b[:, None])).mean(axis=1)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)
_GRAY_W = np.array([0.299, 0.587, 0.114])
_PHASH_MESH: dict = {}  # (h, w) → np.ix_ open mesh for the 32×32 resample


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64, Spark LongType-safe).

    Grayscale → 32x32 area resample → 2D DCT → top-left 8x8 (minus DC)
    vs median → 64 sign bits.
    """
    gray = pixels.astype(np.float64) @ _GRAY_W
    h, w = gray.shape
    mesh = _PHASH_MESH.get((h, w))
    if mesh is None:
        ys = (np.arange(32) * h // 32).clip(0, h - 1)
        xs = (np.arange(32) * w // 32).clip(0, w - 1)
        mesh = np.ix_(ys, xs)
        _PHASH_MESH[(h, w)] = mesh
    small = gray[mesh]
    freq = _DCT32 @ small @ _DCT32.T
    block = freq[:8, :8].ravel()[1:]
    # median of 63 = the 31st order statistic (odd length) — one
    # partition instead of np.median's full machinery; bit packing via
    # packbits (MSB-first over 63 bits == the shift loop's value, which
    # is < 2^63 so no sign wrap ever occurs)
    med = np.partition(block, 31)[31]
    bits = block > med
    return int.from_bytes(np.packbits(bits).tobytes(), "big") >> 1
