"""Real AVI container support: UNCOMPRESSED (BI_RGB / 'DIB ') + MJPEG.

Like WAV-PCM and G.711 on the audio side, a raw-frame AVI is a
container format, not a codec: RIFF 'AVI ' → LIST hdrl (avih main
header, strl with the 'vids' stream header + BITMAPINFOHEADER) → LIST
movi with one '00db' chunk per frame holding bottom-up, 4-byte-row-
aligned BGR24 pixels. Since round 6 the 'MJPG' fourcc also decodes for
REAL — each '00dc' chunk is a baseline JFIF image handled by the numpy
JPEG codec (functions/jpegcodec.py), including the OpenDML convention
of frames that omit their Huffman tables. Other compressed fourccs
(h264, …) still refuse loudly. The encoder writes a minimally
conforming file in either flavor — used by tests and available as a
sink.
"""

from __future__ import annotations

import struct

import numpy as np

BI_RGB = 0
MJPG = struct.unpack("<I", b"MJPG")[0]


class AviError(NotImplementedError):
    pass


def _chunks(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen % 2)


def parse_avi(data: bytes):
    """AVI bytes → (fps, width, height, frames) with frames a list of
    (h, w, 3) uint8 RGB arrays (top-down). Only BI_RGB 24bpp streams
    decode; anything else raises AviError naming the compression."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI container")
    width = height = None
    rate, scale, bitcount, compression = 25, 1, None, None
    movi_span = None

    # strf chunks carry a per-stream format struct (BITMAPINFOHEADER for
    # 'vids', WAVEFORMATEX for 'auds'): only parse the one whose
    # preceding strh declared a video stream, or an audio stream's
    # WAVEFORMATEX fields would clobber bitcount/compression.
    cur_stream_type = [None]

    def walk(start: int, end: int):
        nonlocal width, height, rate, scale, bitcount, compression, movi_span
        for cid, off, clen in _chunks(data, start, end):
            if cid == b"LIST":
                ltype = data[off:off + 4]
                if ltype == b"movi":
                    movi_span = (off + 4, off + clen)
                else:
                    walk(off + 4, off + clen)
            elif cid == b"avih":
                width, height = struct.unpack_from("<II", data, off + 32)
            elif cid == b"strh":
                cur_stream_type[0] = data[off:off + 4]
                if cur_stream_type[0] == b"vids":
                    scale, rate = struct.unpack_from("<II", data, off + 20)
            elif cid == b"strf" and cur_stream_type[0] == b"vids":
                # BITMAPINFOHEADER
                bitcount, = struct.unpack_from("<H", data, off + 14)
                compression, = struct.unpack_from("<I", data, off + 16)

    walk(12, len(data))
    if movi_span is None or width is None:
        raise AviError("AVI missing hdrl/movi lists")
    is_mjpg = compression == MJPG
    if not is_mjpg and (compression not in (None, BI_RGB)
                        or bitcount not in (None, 24)):
        raise AviError(
            f"AVI compression {compression!r} bitcount {bitcount}: only "
            "uncompressed BI_RGB 24bpp and MJPG decode in this container"
        )
    row_stride = (width * 3 + 3) & ~3          # rows pad to 4 bytes
    frames = []
    for cid, off, clen in _chunks(data, movi_span[0], movi_span[1]):
        if cid[2:4] not in (b"db", b"dc"):
            continue
        if is_mjpg:
            from blockchainspider_spark.functions.jpegcodec import jpeg_decode

            frames.append(jpeg_decode(data[off:off + clen]))
            continue
        raw = np.frombuffer(data[off:off + clen], dtype=np.uint8)
        rows = raw[: row_stride * height].reshape(height, row_stride)
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        frames.append(bgr[::-1, :, ::-1].copy())  # bottom-up BGR → top-down RGB
    fps = rate / scale if scale else float(rate)
    return fps, width, height, frames


def avi_encode(frames: list[np.ndarray], fps: int = 25,
               codec: str = "rgb", quality: int = 90) -> bytes:
    """RGB frames (h, w, 3 uint8, top-down) → minimal AVI.
    ``codec='rgb'`` writes BI_RGB '00db' chunks; ``codec='mjpg'``
    writes one real baseline-JFIF image per '00dc' chunk."""
    h, w, _ = frames[0].shape
    row_stride = (w * 3 + 3) & ~3
    pad = row_stride - w * 3
    mjpg = codec == "mjpg"
    if mjpg:
        from blockchainspider_spark.functions.jpegcodec import jpeg_encode

    def frame_chunk(f: np.ndarray) -> bytes:
        if mjpg:
            body = jpeg_encode(f, quality=quality)
            cid = b"00dc"
        else:
            bgr = f[::-1, :, ::-1]              # top-down RGB → bottom-up BGR
            body = b"".join(r.tobytes() + b"\x00" * pad for r in bgr)
            cid = b"00db"
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    frame_sz = row_stride * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1_000_000 / fps), frame_sz * fps, 0, 0x10, len(frames), 0, 1,
        frame_sz, w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + (b"MJPG" if mjpg else b"DIB ")
            + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                          0, len(frames), frame_sz, 0, 0, 0)
            + struct.pack("<HHHH", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24,
                       MJPG if mjpg else BI_RGB, frame_sz, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(frame_chunk(f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
