"""Multimodal payload operators: typed binary columns + Arrow-batched kernels.

Images/audio/video ride as opaque ``binary`` columns with typed metadata
(fmt, w, h, …); per-row media work happens inside ``mapInPandas``
kernels — one Python invocation per Arrow batch, numpy per payload.
What's real vs stubbed in this container (no PIL/ffmpeg):

* image decode        — REAL for 'png' (pure-numpy codec) and, since
                        round 6, for real baseline-JFIF 'jpeg'
                        (functions/jpegcodec.py), real LZW 'gif'
                        (functions/gifcodec.py) and real BI_RGB 'bmp'
                        (functions/bmpcodec.py); other formats raise
                        NotImplementedError (clearly gated).
* resize              — REAL: numpy area-average + half-pixel-center
                        bilinear (align_corners=False convention), the
                        latter with a bit-reproducible float64 contract
                        an external SQL engine can replay.
* feature extraction  — REAL: channel means/stds + 64-bit phash.
* video frame-sample  — REAL for BI_RGB and MJPEG AVI (and the
                        synthetic 'rawv' container); other codecs
                        gated behind NotImplementedError.
* audio decode        — REAL for uncompressed WAV/PCM (stdlib `wave`:
                        rate/channels/duration/RMS/peak); compressed
                        codecs gated behind NotImplementedError.

Partitioning: callers should repartition by a content-hash bucket before
these kernels so payload bytes shuffle at most once; the kernels
preserve partitioning (no shuffle inside).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from blockchainspider_spark.functions.imagecodec import decode, phash64

FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean_r double, mean_g double, mean_b double, "
    "std_gray double, phash long"
)

RESIZE_SCHEMA = "image_id string, w int, h int, bytes binary"

FRAME_SCHEMA = "video_id string, frame_idx int, w int, h int, bytes binary"


def area_resize(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area-average resample (uint8 HxWx3)."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h + 1) * h // out_h).clip(0, h)
    xs = (np.arange(out_w + 1) * w // out_w).clip(0, w)
    out = np.zeros((out_h, out_w, 3), np.float64)
    for i in range(out_h):
        for j in range(out_w):
            block = pixels[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.reshape(-1, 3).mean(axis=0)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def bilinear_resize(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resample (uint8 HxWx3), half-pixel sample centers with
    edge clamp — the align_corners=False convention every training
    stack (PIL, torchvision, TF) uses, so thumbnails here match what a
    downstream trainer would produce.

    Determinism/oracle contract: the interpolation is evaluated in
    float64 in EXACTLY this association order —
    ``(1-fy)*((1-fx)*p00 + fx*p01) + fy*((1-fx)*p10 + fx*p11)`` with
    ``f = s - floor(s)`` — and quantized as ``floor(v + 0.5)``. IEEE-754
    doubles make that bit-reproducible, so DuckDB can replay the same
    expression closed-form (gate row mm_image_resize)."""
    h, w, _ = pixels.shape
    sx = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    sy = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - np.floor(sx))[None, :, None]
    fy = (sy - np.floor(sy))[:, None, None]
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    p = pixels.astype(np.float64)
    p00 = p[np.ix_(y0, x0)]
    p01 = p[np.ix_(y0, x1)]
    p10 = p[np.ix_(y1, x0)]
    p11 = p[np.ix_(y1, x1)]
    v = (1.0 - fy) * ((1.0 - fx) * p00 + fx * p01) \
        + fy * ((1.0 - fx) * p10 + fx * p11)
    return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)


_RESIZE_FILTERS = {"area": area_resize, "bilinear": bilinear_resize}


def image_features(images: DataFrame) -> DataFrame:
    """Decode + per-image feature vector (means, std, phash)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "w", "h", "mean_r", "mean_g",
                                   "mean_b", "std_gray", "phash")}
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt).astype(np.float64)
                gray = px @ np.array([0.299, 0.587, 0.114])
                out["image_id"].append(r.image_id)
                out["w"].append(px.shape[1])
                out["h"].append(px.shape[0])
                out["mean_r"].append(float(px[..., 0].mean()))
                out["mean_g"].append(float(px[..., 1].mean()))
                out["mean_b"].append(float(px[..., 2].mean()))
                out["std_gray"].append(float(gray.std()))
                out["phash"].append(phash64(px.astype(np.uint8)))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, FEATURES_SCHEMA)


def pixel_fingerprint(images: DataFrame) -> DataFrame:
    """Decoded-pixel content hash for cross-format image dedup: the
    SAME pixels encoded as png/gif/bmp (all lossless here) share one
    fingerprint, so format-churned duplicates collapse where a raw
    byte hash cannot. Arrow-batched; payload bytes never shuffle —
    downstream dedup groups on the 32-char fp, not the image."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                fps.append(hashlib.md5(
                    np.ascontiguousarray(px, np.uint8).tobytes()
                ).hexdigest())
            out = pdf[["image_id"]].copy()
            out["pixel_fp"] = fps
            yield out

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, "image_id string, pixel_fp string"
    )


def resize_images(images: DataFrame, out_w: int = 8, out_h: int = 8,
                  method: str = "area") -> DataFrame:
    """Decode → resample (``area`` | ``bilinear``) → re-encode (png) —
    thumbnail stage. Area is the antialiased downscale default;
    bilinear is the trainer-convention resample (half-pixel centers)."""
    from blockchainspider_spark.functions.imagecodec import png_encode

    if method not in _RESIZE_FILTERS:
        raise ValueError(f"unknown resize method {method!r} "
                         f"(have: {sorted(_RESIZE_FILTERS)})")
    resample = _RESIZE_FILTERS[method]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "w", "h", "bytes")}
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                small = resample(px, out_w, out_h)
                out["image_id"].append(r.image_id)
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["bytes"].append(png_encode(small))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, RESIZE_SCHEMA)


AUGMENT_SCHEMA = "image_id string, ox int, oy int, flipped boolean, bytes binary, fmt string"


def augment_images(
    images: DataFrame, out_w: int = 8, out_h: int = 8,
    hflip: bool = True, seed: str = "aug",
) -> DataFrame:
    """Deterministic training-time augmentation: seeded random crop +
    horizontal flip. Parameters derive from md5(image_id + '#' + seed)
    — NOT an RNG — so a rerun, a retry after task failure, or a second
    engine produces the byte-identical augmented corpus (the same
    portability argument as dedup.hash_split; DuckDB twin:
    ('0x'||substr(md5(..),1,7))::BIGINT). Per image:

        ox      = int(hex[0:7],  16) % (w - out_w + 1)
        oy      = int(hex[7:14], 16) % (h - out_h + 1)
        flipped = hflip and int(hex[14:16], 16) % 2 == 1

    Emits the augmented png plus the applied params, so downstream
    audits (and the SQL oracle) can verify the geometry independently.
    Scale shape: one Arrow-batched kernel, no shuffle — augmentation is
    a free map over the image scan, like resize.
    """
    import hashlib

    from blockchainspider_spark.functions.imagecodec import png_encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "ox", "oy", "flipped", "bytes", "fmt")}
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                if w < out_w or h < out_h:
                    raise ValueError(
                        f"augment_images: {r.image_id} is {w}x{h}, smaller than "
                        f"the {out_w}x{out_h} crop — resize first"
                    )
                hx = hashlib.md5(f"{r.image_id}#{seed}".encode()).hexdigest()
                ox = int(hx[0:7], 16) % (w - out_w + 1)
                oy = int(hx[7:14], 16) % (h - out_h + 1)
                flipped = hflip and int(hx[14:16], 16) % 2 == 1
                crop = px[oy:oy + out_h, ox:ox + out_w]
                if flipped:
                    crop = crop[:, ::-1]
                out["image_id"].append(r.image_id)
                out["ox"].append(ox)
                out["oy"].append(oy)
                out["flipped"].append(flipped)
                out["bytes"].append(png_encode(np.ascontiguousarray(crop)))
                out["fmt"].append("png")
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, AUGMENT_SCHEMA)


def make_raw_video(frames: list[np.ndarray]) -> bytes:
    """Synthetic 'rawv' container: header + concatenated RGB frames."""
    h, w, _ = frames[0].shape
    return (
        b"RAWV" + struct.pack(">HHI", w, h, len(frames))
        + b"".join(f.tobytes() for f in frames)
    )


def sample_frames(videos: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling: one output row per sampled frame. REAL for
    uncompressed AVI (RIFF 'AVI ' with BI_RGB 'DIB ' frames), for MJPEG
    AVI (each '00dc' chunk a baseline JFIF image decoded by the numpy
    JPEG codec — functions/avicodec.py + jpegcodec.py, round 6), for
    ANIMATED GIF (full compositor: sub-rect delta frames, transparency,
    disposal methods — functions/gifcodec.py, round 6 continuation; the
    dominant animated format in a web crawl), and for the synthetic
    'RAWV' test container; other compressed codecs (h264, …) refuse
    loudly via AviError."""

    def _iter_frames(data: bytes):
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            from blockchainspider_spark.functions.avicodec import parse_avi

            _fps, w, h, frames = parse_avi(data)
            for i, frame in enumerate(frames):
                yield i, w, h, frame
            return
        if data[:6] in (b"GIF87a", b"GIF89a"):
            from blockchainspider_spark.functions.gifcodec import gif_decode_frames

            frames, _delays, _loop = gif_decode_frames(data)
            for i, frame in enumerate(frames):
                yield i, frame.shape[1], frame.shape[0], frame
            return
        if data[:4] != b"RAWV":
            raise NotImplementedError(
                "only uncompressed AVI (BI_RGB) and RAWV decode in this "
                "container (no video codec library present)"
            )
        w, h, n = struct.unpack(">HHI", data[4:12])
        frame_sz = w * h * 3
        for i in range(n):
            chunk = data[12 + i * frame_sz: 12 + (i + 1) * frame_sz]
            yield i, w, h, np.frombuffer(chunk, np.uint8).reshape(h, w, 3)

    from blockchainspider_spark.functions.imagecodec import png_encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("video_id", "frame_idx", "w", "h", "bytes")}
            for r in pdf.itertuples(index=False):
                for idx, w, h, frame in _iter_frames(bytes(r.bytes)):
                    if idx % every_k:
                        continue
                    out["video_id"].append(r.video_id)
                    out["frame_idx"].append(idx)
                    out["w"].append(w)
                    out["h"].append(h)
                    out["bytes"].append(png_encode(frame))
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes").mapInPandas(kernel, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "audio_id string, sample_rate int, n_channels int, n_samples long, "
    "duration_sec double, rms double, peak double"
)


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit little-endian PCM WAV via the stdlib ``wave`` module.
    ``samples``: int16 array, shape (n,) mono or (n, channels)."""
    import io
    import wave as wavmod

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1 if samples.ndim == 1 else samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_audio(audio: DataFrame) -> DataFrame:
    """REAL for WAV with PCM16 (stdlib ``wave``) AND — since round 5 —
    G.711 μ-law/A-law payloads (format tags 7/6, closed-form expansion
    in functions/g711.py, pinned bit-exactly against the stdlib audioop
    oracle) — sample rate, channel count, duration, full-signal RMS and
    peak (samples normalized to [-1, 1) by /32768). Everything else
    (mp3/aac/…) stays gated behind NotImplementedError: no codec
    library ships in this container, and a silent fake would corrupt a
    training pipeline downstream."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from blockchainspider_spark.functions.g711 import parse_wav

        for pdf in batches:
            out = {k: [] for k in ("audio_id", "sample_rate", "n_channels",
                                   "n_samples", "duration_sec", "rms", "peak")}
            for r in pdf.itertuples(index=False):
                if r.fmt != "wav":
                    raise NotImplementedError(
                        f"audio fmt {r.fmt!r}: only WAV (PCM16 / G.711) decodes "
                        "in this container (no codec library present)"
                    )
                sr, nch, samples = parse_wav(bytes(r.bytes))
                n = len(samples) // max(nch, 1)
                x = samples.astype(np.float64) / 32768.0
                out["audio_id"].append(r.audio_id)
                out["sample_rate"].append(sr)
                out["n_channels"].append(nch)
                out["n_samples"].append(n)
                out["duration_sec"].append(n / sr)
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                out["peak"].append(float(np.abs(x).max()) if len(x) else 0.0)
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
