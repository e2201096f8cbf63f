"""WebP lossless (VP8L) codec in pure Python/numpy.

Sixth real image format on the crawl payload path. Everything derives
from the public "WebP Lossless Bitstream Specification" (Google,
RFC-style, 2012-2023) — no codec library ships in this container.

* decode — full VP8L feature surface: LSB-first bitstream, all four
  transforms in any order (PREDICTOR with its 14 modes and tile grid,
  COLOR with per-tile cross-channel deltas, SUBTRACT_GREEN,
  COLOR_INDEXING including the ≤16-color pixel-bundling sub-widths),
  color cache (1..11 bits), LZ77 backward references with the 120-entry
  2D distance neighborhood map, simple (1-2 symbol) and
  code-length-coded Huffman codes with the max_symbol early stop, and
  meta-Huffman (entropy-image) group selection. Alpha is decoded and
  dropped at the RGB boundary (the payload contract is HxWx3).
* encode — spec-legal literal stream: optional SUBTRACT_GREEN,
  optional color cache, greedy LZ77 (hash-chained), one Huffman group;
  canonical codes built power-of-two-complete so every emitted code is
  a complete prefix code. The encoder exists to make fixtures
  self-generated; compression competitiveness is a non-goal.

Decoder and encoder share only the constant tables; round-trip tests
are therefore genuine two-sided pins, like the other five codecs.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


# order in which code-length code lengths are stored (spec §6.2.2)
_CLCODE_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


# ------------------------------------------------------------ bit I/O


class _BitReader:
    """LSB-first (VP8L convention — opposite of JPEG/GIF-MSB)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0            # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise WebpError("truncated VP8L stream")
        v = 0
        p = self.pos
        got = 0
        while got < n:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n - got)
            v |= ((byte >> (p & 7)) & ((1 << take) - 1)) << got
            got += take
            p += take
        self.pos = p
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------------- Huffman


class _Huff:
    """Canonical prefix code from code lengths; VP8L canonical order =
    symbols of equal length sorted by symbol index, codes assigned in
    increasing length, READ MSB-first along the code (each code's bits
    arrive one at a time from the LSB-first reader)."""

    __slots__ = ("lookup", "single")

    def __init__(self, lengths: list[int]):
        self.single: int | None = None
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise WebpError("empty Huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.lookup = {}
            return
        # Kraft completeness check (spec requires complete codes)
        if sum(1 << (15 - ln) for ln, _ in nz) != (1 << 15):
            raise WebpError("incomplete Huffman code")
        nz.sort()
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= (ln - prev_len)
            prev_len = ln
            self.lookup[(ln, code)] = sym
            code += 1

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise WebpError("invalid Huffman code in stream")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), matching _Huff's assignment."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code = 0
    prev_len = nz[0][0] if nz else 0
    for ln, sym in nz:
        code <<= (ln - prev_len)
        prev_len = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """Spec §6.2.2: code lengths themselves Huffman-coded, with repeat
    symbols 16/17/18 and the optional max_symbol early stop."""
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLCODE_ORDER[i]] = br.read(3)
    cl_huff = _Huff(cl_lengths) if any(cl_lengths) else None
    if cl_huff is None:
        raise WebpError("empty code-length code")

    if br.read(1):                      # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_code_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_huff.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_code_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[i:i + rep] = [prev_code_len] * min(rep, alphabet_size - i)
            i += rep
        elif s == 17:
            i += 3 + br.read(3)
        else:                           # 18
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise WebpError("code lengths overflow alphabet")
    return lengths


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huff:
    if br.read(1):                      # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):                  # first symbol is 8-bit
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1           # single-symbol: zero bits consumed
            h = _Huff.__new__(_Huff)
            h.single = sym0
            h.lookup = {}
            return h
        sym1 = br.read(8)
        if sym0 >= alphabet_size or sym1 >= alphabet_size:
            raise WebpError("simple-code symbol out of range")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _Huff(lengths)
    lengths = _read_code_lengths(br, alphabet_size)
    return _Huff(lengths)


# -------------------------------------------------- LZ77 prefix codes


def _prefix_decode(br: _BitReader, code: int) -> int:
    """length/distance prefix symbol → value (spec §6.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value → (prefix code, extra bits value, n extra bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    code = 2 * nbits + ((v >> (nbits - 1)) & 1) - 2 + 2
    # reconstruct: extra = nbits - 1
    extra_bits = nbits - 1
    base = (2 + ((code) & 1)) << extra_bits
    return code, value - base - 1, extra_bits


# the 120-entry 2D distance neighborhood (spec §6.2.3), (dx, dy)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (1, 8), (-1, 8), (0, 8), (3, 8), (-3, 8),
    (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7),
]
assert len(_DIST_MAP) == 120


def _plane_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * xsize + dx
    return max(d, 1)


# ----------------------------------------------------- color cache


def _cache_key(argb: int, bits: int) -> int:
    return ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - bits)


# ----------------------------------------------------- entropy image


def _decode_entropy_coded(br: _BitReader, xsize: int, ysize: int,
                          allow_meta: bool) -> np.ndarray:
    """One spatially-coded image (spec §6.2) → uint32 ARGB array
    (ysize, xsize). Used for the main image, transform sub-images, and
    the entropy (meta-Huffman) image itself."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"color-cache bits {cache_bits} out of range")
    meta_huff = None
    n_groups = 1
    huff_bits = 0
    if allow_meta and br.read(1):
        huff_bits = 3 + br.read(3)
        hx = -(-xsize // (1 << huff_bits))
        hy = -(-ysize // (1 << huff_bits))
        meta_huff = _decode_entropy_coded(br, hx, hy, allow_meta=False)
        # group index = (red << 8) | green of the entropy image pixel
        n_groups = int(((meta_huff >> 8) & 0xFFFF).max()) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_huffman_code(br, 256 + 24 + cache_size)
        red = _read_huffman_code(br, 256)
        blue = _read_huffman_code(br, 256)
        alpha = _read_huffman_code(br, 256)
        dist = _read_huffman_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    cache = [0] * cache_size
    n = xsize * ysize
    out = np.zeros(n, np.uint32)
    pos = 0
    while pos < n:
        if meta_huff is not None:
            x, y = pos % xsize, pos // xsize
            mp = int(meta_huff[y >> huff_bits, x >> huff_bits])
            g_huff, r_huff, b_huff, a_huff, d_huff = groups[(mp >> 8) & 0xFFFF]
        else:
            g_huff, r_huff, b_huff, a_huff, d_huff = groups[0]
        s = g_huff.decode(br)
        if s < 256:                     # literal
            g = s
            r = r_huff.decode(br)
            b = b_huff.decode(br)
            a = a_huff.decode(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif s < 256 + 24:              # LZ77 backref
            length = _prefix_decode(br, s - 256)
            dcode = _prefix_decode(br, d_huff.decode(br))
            dist = _plane_distance(dcode, xsize)
            if dist > pos or pos + length > n:
                raise WebpError("LZ77 reference out of bounds")
            for k in range(length):
                px = int(out[pos - dist + k])
                out[pos + k] = px
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
            pos += length
        else:                           # color-cache hit
            idx = s - 256 - 24
            if idx >= cache_size:
                raise WebpError("color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(ysize, xsize)


# ----------------------------------------------------- transforms


def _predict(mode: int, canvas: np.ndarray, x: int, y: int) -> tuple[int, int, int, int]:
    """Per-pixel predictor (spec §4.1), interior pixels only (x>0, y>0
    — the caller applies the border rules: top-left black, top row L,
    left column T). canvas holds DECODED (a,r,g,b) rows above/left.
    TR at the right edge wraps to the leftmost pixel of the row above
    (spec border rule)."""
    def px(yy, xx):
        return canvas[yy, xx]

    w = canvas.shape[1]
    L = px(y, x - 1)
    T = px(y - 1, x)
    TL = px(y - 1, x - 1)
    TR = px(y - 1, x + 1) if x + 1 < w else px(y - 1, 0)
    if mode == 0:
        return 255, 0, 0, 0
    if mode == 1:
        return tuple(L)
    if mode == 2:
        return tuple(T)
    if mode == 3:
        return tuple(TR)
    if mode == 4:
        return tuple(TL)
    if mode == 5:
        avg = ((L.astype(np.int32) + TR) // 2 + T) // 2
        return tuple(avg)
    if mode == 6:
        return tuple((L.astype(np.int32) + TL) // 2)
    if mode == 7:
        return tuple((L.astype(np.int32) + T) // 2)
    if mode == 8:
        return tuple((TL.astype(np.int32) + T) // 2)
    if mode == 9:
        return tuple((T.astype(np.int32) + TR) // 2)
    if mode == 10:
        a = (L.astype(np.int32) + TL) // 2
        b = (T.astype(np.int32) + TR) // 2
        return tuple((a + b) // 2)
    if mode == 11:                       # Select
        p = L.astype(np.int32) + T - TL
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return tuple(L if pl < pt else T)
    if mode == 12:                       # ClampAddSubtractFull
        v = L.astype(np.int32) + T - TL
        return tuple(np.clip(v, 0, 255))
    if mode == 13:                       # ClampAddSubtractHalf
        ave = (L.astype(np.int32) + T) // 2
        d = ave - TL
        # C-style (a-b)/2 truncates toward zero, not floor
        v = ave + np.sign(d) * (np.abs(d) // 2)
        return tuple(np.clip(v, 0, 255))
    raise WebpError(f"predictor mode {mode} invalid")


def _delta(t: int) -> int:
    """Color-transform delta: signed multiply high byte (spec §4.2)."""
    return t - 256 if t >= 128 else t


def _color_transform_inverse(px_g: int, red: int, blue: int,
                             cte: tuple[int, int, int]) -> tuple[int, int]:
    g2r, g2b, r2b = cte
    g_signed = px_g - 256 if px_g >= 128 else px_g
    r = (red + ((_delta(g2r) * g_signed) >> 5)) & 0xFF
    r_signed = r - 256 if r >= 128 else r
    b = blue
    b = (b + ((_delta(g2b) * g_signed) >> 5)) & 0xFF
    b = (b + ((_delta(r2b) * r_signed) >> 5)) & 0xFF
    return r, b


def _apply_inverse_transforms(argb: np.ndarray, transforms: list) -> np.ndarray:
    """Apply collected transforms in reverse order (spec §3)."""
    for ttype, tdata in reversed(transforms):
        h, w = argb.shape
        if ttype == 2:                  # subtract green
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
        elif ttype == 0:                # predictor
            bits, tiles = tdata
            canvas = np.zeros((h, w, 4), np.int32)   # a,r,g,b decoded
            res = np.stack([(argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                            (argb >> 8) & 0xFF, argb & 0xFF], axis=-1).astype(np.int32)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = (255, 0, 0, 0)
                    elif y == 0:        # top row: forced L-prediction
                        pred = tuple(canvas[y, x - 1])
                    elif x == 0:        # left column: forced T-prediction
                        pred = tuple(canvas[y - 1, x])
                    else:
                        tile = int(tiles[y >> bits, x >> bits])
                        mode = (tile >> 8) & 0xFF
                        pred = _predict(mode, canvas, x, y)
                    canvas[y, x] = (res[y, x] + pred) & 0xFF
            argb = ((canvas[..., 0].astype(np.uint32) << 24)
                    | (canvas[..., 1].astype(np.uint32) << 16)
                    | (canvas[..., 2].astype(np.uint32) << 8)
                    | canvas[..., 3].astype(np.uint32))
        elif ttype == 1:                # color transform
            bits, tiles = tdata
            out = argb.copy()
            for y in range(h):
                for x in range(w):
                    tile = int(tiles[y >> bits, x >> bits])
                    # ColorTransformElement packing (libwebp/spec):
                    # green_to_red in the BLUE byte, green_to_blue in
                    # GREEN, red_to_blue in RED
                    g2r = tile & 0xFF
                    g2b = (tile >> 8) & 0xFF
                    r2b = (tile >> 16) & 0xFF
                    px = int(argb[y, x])
                    r, b = _color_transform_inverse(
                        (px >> 8) & 0xFF, (px >> 16) & 0xFF, px & 0xFF,
                        (g2r, g2b, r2b))
                    out[y, x] = (px & 0xFF00FF00) | (r << 16) | b
            argb = out
        elif ttype == 3:                # color indexing
            palette, width_bits, orig_w = tdata
            if width_bits:
                # unbundle packed indices
                per = 8 >> width_bits             # pixels per byte... see below
                ppp = 1 << width_bits             # actually pixels per packed unit
                ibits = 8 >> width_bits
                flat = np.zeros((h, orig_w), np.uint32)
                for y in range(h):
                    for x in range(orig_w):
                        packed = int((argb[y, x >> width_bits] >> 8) & 0xFF)
                        shift = (x & (ppp - 1)) * ibits
                        flat[y, x] = (packed >> shift) & ((1 << ibits) - 1)
                idx = flat
                w_eff = orig_w
            else:
                idx = (argb >> 8) & 0xFF
                w_eff = w
            idx = np.minimum(idx, len(palette) - 1)
            argb = palette[idx.astype(np.int64)].reshape(h, w_eff)
        else:
            raise WebpError(f"transform {ttype} invalid")
    return argb


# ------------------------------------------------------------- decode


def webp_decode(data: bytes) -> np.ndarray:
    """RIFF/WEBP/VP8L bytes → uint8 HxWx3 RGB (alpha dropped)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a RIFF/WEBP container")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"VP8L":
            payload = data[pos + 8:pos + 8 + ln]
            break
        if cid in (b"VP8 ", b"VP8X"):
            raise WebpError(f"{cid.decode().strip()} (lossy/extended) unsupported "
                            "— VP8L lossless only")
        pos += 8 + ln + (ln & 1)
    if payload is None:
        raise WebpError("no VP8L chunk found")
    if payload[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                          # alpha hint
    if br.read(3) != 0:
        raise WebpError("VP8L version != 0")

    transforms = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if any(t[0] == ttype for t in transforms):
            raise WebpError("duplicate transform")
        if ttype == 2:                  # subtract green: no data
            transforms.append((2, None))
        elif ttype in (0, 1):           # predictor / color: tiled sub-image
            bits = 2 + br.read(3)
            tx = -(-xsize // (1 << bits))
            ty = -(-h // (1 << bits))
            tiles = _decode_entropy_coded(br, tx, ty, allow_meta=False)
            transforms.append((ttype, (bits, tiles)))
        else:                           # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_coded(br, n_colors, 1, allow_meta=False)
            # palette entries are delta-coded left-to-right
            pal = pal_img.reshape(-1).astype(np.uint32)
            acc = np.zeros_like(pal)
            prev = np.uint32(0)
            for i in range(len(pal)):
                # componentwise byte addition
                a = ((prev >> 24) + (pal[i] >> 24)) & 0xFF
                r = (((prev >> 16) & 0xFF) + ((pal[i] >> 16) & 0xFF)) & 0xFF
                g = (((prev >> 8) & 0xFF) + ((pal[i] >> 8) & 0xFF)) & 0xFF
                b = ((prev & 0xFF) + (pal[i] & 0xFF)) & 0xFF
                prev = np.uint32((a << 24) | (r << 16) | (g << 8) | b)
                acc[i] = prev
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            orig_w = xsize
            xsize = -(-xsize // (1 << width_bits)) if width_bits else xsize
            transforms.append((3, (acc, width_bits, orig_w)))
    argb = _decode_entropy_coded(br, xsize, h, allow_meta=True)
    argb = _apply_inverse_transforms(argb, transforms)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


# ------------------------------------------------------------- encode


def _flat_lengths(symbols: set[int], alphabet_size: int) -> list[int]:
    """Complete prefix code: pad the used-symbol set to the next power
    of two with the smallest unused symbols, all at one length."""
    syms = sorted(symbols) or [0]
    n = 1
    while n < len(syms):
        n <<= 1
    if n > alphabet_size:
        raise WebpError("alphabet too small for flat code")
    pad = (s for s in range(alphabet_size) if s not in symbols)
    while len(syms) < n:
        syms.append(next(pad))
    length = max(1, n.bit_length() - 1)
    lengths = [0] * alphabet_size
    for s in syms:
        lengths[s] = length
    return lengths


def _write_huffman_code(bw: _BitWriter, lengths: list[int]) -> dict:
    """Emit a code (simple if ≤2 symbols, else code-length-coded flat)."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) == 1:
        bw.write(1, 1)                  # simple
        bw.write(0, 1)                  # one symbol
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        return {used[0]: (0, 0)}
    if len(used) == 2:
        bw.write(1, 1)
        bw.write(1, 1)                  # two symbols
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    # normal code: code-length code with two CL symbols {0, L} at 1 bit
    L = max(lengths)
    bw.write(0, 1)
    # order indices for symbols 0 and L
    need = {0, L}
    max_idx = max(i for i, s in enumerate(_CLCODE_ORDER) if s in need)
    num_cl = max(4, max_idx + 1)
    bw.write(num_cl - 4, 4)
    cl_lengths = {0: 1, L: 1}
    for i in range(num_cl):
        s = _CLCODE_ORDER[i]
        bw.write(cl_lengths.get(s, 0), 3)
    # CL canonical: symbol min(0,L)=0 → code 0, symbol L → code 1
    cl_codes = {0: (0, 1), L: (1, 1)}
    # max_symbol: emit exactly up to the last nonzero
    last = max(used) + 1
    bw.write(1, 1)
    length_nbits = 2 + 2 * 7            # 16 bits, enough for any alphabet here
    bw.write(7, 3)
    bw.write(last - 2, length_nbits)
    for s in range(last):
        code, ln = cl_codes[lengths[s] if lengths[s] else 0]
        # write MSB-first bit by bit (codes are read bitwise)
        for k in range(ln - 1, -1, -1):
            bw.write((code >> k) & 1, 1)
    return _canonical_codes(lengths)


def _put_code(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, ln = codes[sym]
    for k in range(ln - 1, -1, -1):
        bw.write((code >> k) & 1, 1)


def webp_encode(pixels: np.ndarray, use_lz77: bool = True,
                cache_bits: int = 0, subtract_green: bool = True) -> bytes:
    """uint8 HxWx3 RGB → RIFF/WEBP/VP8L (lossless). ``cache_bits`` > 0
    enables the color cache; ``use_lz77`` enables greedy backrefs."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise WebpError("webp_encode expects uint8 HxWx3 RGB")
    if not 0 <= cache_bits <= 11:
        raise WebpError("cache_bits out of range")
    h, w = pixels.shape[:2]
    if w > 16384 or h > 16384:
        raise WebpError("dims exceed VP8L 14-bit limit")
    r = pixels[..., 0].astype(np.uint32)
    g = pixels[..., 1].astype(np.uint32)
    b = pixels[..., 2].astype(np.uint32)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    argb = ((np.uint32(0xFF) << 24) | (r << 16) | (g << 8) | b).reshape(-1)
    n = len(argb)

    # ---- tokenize: literals / cache hits / greedy LZ77 backrefs
    tokens = []                         # ('lit', px) | ('cache', idx) | ('ref', len, dist)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    table: dict[int, int] = {}          # 3-pixel hash → last position
    pos = 0
    MAXLEN = 4096

    def _h3(p):
        return hash((int(argb[p]), int(argb[p + 1]), int(argb[p + 2])))

    while pos < n:
        done = False
        if use_lz77 and pos + 3 <= n:
            key = _h3(pos)
            cand = table.get(key)
            if cand is not None and cand < pos:
                dist = pos - cand
                length = 0
                while (pos + length < n and length < MAXLEN
                       and argb[cand + length] == argb[pos + length]):
                    length += 1
                if length >= 3:
                    tokens.append(("ref", length, dist))
                    for k in range(length):
                        if cache is not None:
                            px = int(argb[pos + k])
                            cache[_cache_key(px, cache_bits)] = px
                        if pos + k + 3 <= n:
                            table[_h3(pos + k)] = pos + k
                    pos += length
                    done = True
            if not done:
                table[key] = pos
        if done:
            continue
        px = int(argb[pos])
        if cache is not None and cache[_cache_key(px, cache_bits)] == px:
            tokens.append(("cache", _cache_key(px, cache_bits)))
        else:
            tokens.append(("lit", px))
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        pos += 1

    # ---- collect symbol sets
    cache_size = (1 << cache_bits) if cache_bits else 0
    g_syms, r_syms, b_syms, a_syms, d_syms = set(), set(), set(), set(), set()
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            g_syms.add((px >> 8) & 0xFF)
            r_syms.add((px >> 16) & 0xFF)
            b_syms.add(px & 0xFF)
            a_syms.add((px >> 24) & 0xFF)
        elif t[0] == "cache":
            g_syms.add(256 + 24 + t[1])
        else:
            lcode, _, _ = _prefix_encode(t[1])
            dcode, _, _ = _prefix_encode(t[2] + 120)
            g_syms.add(256 + lcode)
            d_syms.add(dcode)
    for s in (r_syms, b_syms, a_syms):
        if not s:
            s.add(0)
    if not d_syms:
        d_syms.add(0)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                      # no alpha
    bw.write(0, 3)                      # version
    if subtract_green:
        bw.write(1, 1)                  # transform present
        bw.write(2, 2)                  # SUBTRACT_GREEN
    bw.write(0, 1)                      # no more transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)                      # no meta-huffman

    g_len = _flat_lengths(g_syms, 256 + 24 + cache_size)
    g_codes = _write_huffman_code(bw, g_len)
    r_codes = _write_huffman_code(bw, _flat_lengths(r_syms, 256))
    b_codes = _write_huffman_code(bw, _flat_lengths(b_syms, 256))
    a_codes = _write_huffman_code(bw, _flat_lengths(a_syms, 256))
    d_codes = _write_huffman_code(bw, _flat_lengths(d_syms, 40))

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            _put_code(bw, g_codes, (px >> 8) & 0xFF)
            _put_code(bw, r_codes, (px >> 16) & 0xFF)
            _put_code(bw, b_codes, px & 0xFF)
            _put_code(bw, a_codes, (px >> 24) & 0xFF)
        elif t[0] == "cache":
            _put_code(bw, g_codes, 256 + 24 + t[1])
        else:
            _, length, dist = t
            lcode, lextra, lbits = _prefix_encode(length)
            _put_code(bw, g_codes, 256 + lcode)
            bw.write(lextra, lbits)
            dcode, dextra, dbits = _prefix_encode(dist + 120)
            _put_code(bw, d_codes, dcode)
            bw.write(dextra, dbits)
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
