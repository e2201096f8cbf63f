"""Multimodal binary-column plumbing: features, resize, frame sampling."""

import numpy as np
import pandas as pd
import pytest

from blockchainspider_spark.functions.imagecodec import png_decode
from blockchainspider_spark.operators import multimodal as M


def test_image_features(spark, images_df, images_pdf):
    feats = {r.image_id: r for r in M.image_features(images_df).collect()}
    assert len(feats) == len(images_pdf)
    want = {r.image_id: r.phash for r in images_pdf.itertuples(index=False)}
    got = {k: v.phash for k, v in feats.items()}
    assert got == want, "kernel phash must match the stored fixture phash"
    any_row = next(iter(feats.values()))
    assert 0 <= any_row.mean_r <= 255 and any_row.std_gray > 0


def test_resize_roundtrip(spark, images_df):
    small = M.resize_images(images_df.limit(4), out_w=6, out_h=6).collect()
    assert len(small) == 4
    for r in small:
        px = png_decode(bytes(r.bytes))
        assert px.shape == (6, 6, 3)


def test_video_frame_sampling(spark):
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, (8, 8, 3)).astype(np.uint8) for _ in range(7)]
    video = M.make_raw_video(frames)
    df = spark.createDataFrame([("v1", bytearray(video))], "video_id string, bytes binary")
    out = M.sample_frames(df, every_k=2).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 2, 4, 6]
    r0 = next(r for r in out if r.frame_idx == 0)
    assert (png_decode(bytes(r0.bytes)) == frames[0]).all()


def test_decode_audio_wav_roundtrip(spark):
    """Stdlib-wave encode → Spark decode: rate/channels/counts exact,
    RMS/peak match an independent numpy computation; stereo interleave
    flattens into the full-signal stats like the kernel documents."""
    import numpy as np

    from blockchainspider_spark.operators.multimodal import decode_audio, wav_encode

    rng = np.random.default_rng(5)
    mono = (rng.integers(-32768, 32768, 500)).astype(np.int16)
    stereo = (rng.integers(-32768, 32768, (300, 2))).astype(np.int16)
    pdf = pd.DataFrame({
        "audio_id": ["m", "s"],
        "bytes": [wav_encode(mono, 16000), wav_encode(stereo, 44100)],
        "fmt": ["wav", "wav"],
    })
    out = {r.audio_id: r for r in decode_audio(spark.createDataFrame(pdf)).collect()}
    assert out["m"].sample_rate == 16000 and out["m"].n_channels == 1
    assert out["s"].sample_rate == 44100 and out["s"].n_channels == 2
    assert out["m"].n_samples == 500 and out["s"].n_samples == 300
    for key, arr in (("m", mono), ("s", stereo)):
        x = arr.astype(np.float64).ravel() / 32768.0
        assert abs(out[key].rms - np.sqrt((x * x).mean())) < 1e-12
        assert abs(out[key].peak - np.abs(x).max()) < 1e-12
    assert abs(out["s"].duration_sec - 300 / 44100) < 1e-12


def test_decode_audio_compressed_fmt_gated(spark):
    """Compressed formats must refuse loudly, not fake-decode."""
    import pytest as _pytest

    from blockchainspider_spark.operators.multimodal import decode_audio

    pdf = pd.DataFrame({"audio_id": ["x"], "bytes": [b"\x00" * 16], "fmt": ["mp3"]})
    with _pytest.raises(Exception, match="NotImplementedError|only uncompressed|codec"):
        decode_audio(spark.createDataFrame(pdf)).collect()


def test_g711_tables_match_audioop_bit_exactly():
    """The μ-law/A-law expansion tables equal the stdlib audioop oracle
    for every one of the 256 code values (audioop is deprecated for
    3.13 — which is why the decode lives in functions/g711.py and
    audioop is only the oracle here)."""
    import audioop

    import numpy as np

    from blockchainspider_spark.functions.g711 import alaw_decode, ulaw_decode

    codes = bytes(range(256))
    want_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    want_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert (ulaw_decode(codes) == want_u).all()
    assert (alaw_decode(codes) == want_a).all()


def test_decode_audio_g711_wav(spark):
    """A μ-law WAV (format tag 7) decodes for real through the Spark
    operator: stats equal the table-decoded signal exactly; A-law tag 6
    likewise; an unknown tag still refuses loudly."""
    import numpy as np
    import pytest as _pytest

    from blockchainspider_spark.functions.g711 import (
        ulaw_decode,
        ulaw_encode,
        wav_encode_g711,
    )
    from blockchainspider_spark.operators.multimodal import decode_audio

    rng = np.random.default_rng(11)
    pcm = (rng.standard_normal(800) * 8000).astype(np.int16)
    codes = ulaw_encode(pcm)
    wav_u = wav_encode_g711(codes, 8000, 7)
    wav_bad = wav_encode_g711(codes, 8000, 2)  # MS-ADPCM: not supported
    pdf = pd.DataFrame({
        "audio_id": ["u"], "bytes": [wav_u], "fmt": ["wav"],
    })
    out = decode_audio(spark.createDataFrame(pdf)).collect()[0]
    assert out.sample_rate == 8000 and out.n_channels == 1
    assert out.n_samples == 800
    x = ulaw_decode(codes).astype(np.float64) / 32768.0
    assert abs(out.rms - np.sqrt((x * x).mean())) < 1e-12
    assert abs(out.peak - np.abs(x).max()) < 1e-12
    # μ-law is lossy but close: round-tripped signal within codec error
    err = np.abs(ulaw_decode(codes).astype(np.int32) - pcm.astype(np.int32))
    assert err.max() <= 1000  # G.711 step size at |x|≈8000 is ≤ 256

    bad = pd.DataFrame({"audio_id": ["b"], "bytes": [wav_bad], "fmt": ["wav"]})
    with _pytest.raises(Exception, match="format tag 2"):
        decode_audio(spark.createDataFrame(bad)).collect()


def test_avi_roundtrip_and_spark_sampling(spark):
    """Uncompressed AVI is a container, not a codec: encode RGB frames
    → parse back bit-exactly (incl. the bottom-up BGR row order and
    4-byte row padding for a non-multiple-of-4 width), then sample
    frames through the Spark operator; compressed fourccs refuse."""
    import numpy as np
    import pytest as _pytest

    from blockchainspider_spark.functions.avicodec import (
        AviError,
        avi_encode,
        parse_avi,
    )
    from blockchainspider_spark.functions.imagecodec import png_decode
    from blockchainspider_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(5)]
    data = avi_encode(frames, fps=10)
    fps, w, h, got = parse_avi(data)
    assert (fps, w, h, len(got)) == (10.0, 5, 6, 5)
    for a, b in zip(frames, got):
        assert (a == b).all()

    vids = pd.DataFrame({"video_id": ["v1"], "bytes": [data]})
    out = sample_frames(spark.createDataFrame(vids), every_k=2).collect()
    assert sorted(r.frame_idx for r in out) == [0, 2, 4]
    for r in out:
        assert (png_decode(bytes(r.bytes)) == frames[r.frame_idx]).all()

    bad = bytearray(data)
    # flip biCompression in strf to a nonzero fourcc value
    idx = data.find(b"strf")
    bad[idx + 8 + 16:idx + 8 + 20] = (875967048).to_bytes(4, "little")  # 'H264'
    with _pytest.raises((AviError, Exception), match="compression"):
        parse_avi(bytes(bad))


def test_avi_with_audio_stream_still_decodes():
    """A valid BI_RGB video + PCM audio AVI must decode: the audio
    stream's strf is a WAVEFORMATEX whose fields at BITMAPINFOHEADER
    offsets would otherwise clobber bitcount/compression and wrongly
    reject the file."""
    import struct

    import numpy as np

    from blockchainspider_spark.functions.avicodec import avi_encode, parse_avi

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (4, 3, 3), dtype=np.uint8) for _ in range(3)]
    data = avi_encode(frames, fps=10)

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    # audio strl: strh('auds') + strf(WAVEFORMATEX: PCM mono 8 kHz 16-bit)
    strh = (b"auds" + b"\x00" * 4
            + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 0, 0, 0, 0, 0)
            + struct.pack("<HHHH", 0, 0, 0, 0))
    strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    strl_list = b"LIST" + struct.pack("<I", len(strl)) + strl

    i = data.find(b"hdrl")
    (hdrl_size,) = struct.unpack_from("<I", data, i - 4)
    out = bytearray(data)
    out[i + hdrl_size:i + hdrl_size] = strl_list       # append inside hdrl
    struct.pack_into("<I", out, i - 4, hdrl_size + len(strl_list))
    struct.pack_into("<I", out, 4, len(out) - 8)       # RIFF size

    fps, w, h, got = parse_avi(bytes(out))
    assert (fps, w, h, len(got)) == (10.0, 3, 4, 3)
    for a, b in zip(frames, got):
        assert (a == b).all()


def test_g711_encode_decode_fixpoint():
    """ulaw_encode is the nearest-level inverse: re-encoding a decoded
    signal reproduces the same decoded VALUES for all 256 codes (bytes
    may differ where two codes share a level, e.g. 0x7f/0xff both
    decode to 0)."""
    import numpy as np

    from blockchainspider_spark.functions.g711 import ulaw_decode, ulaw_encode

    codes = bytes(range(256))
    vals = ulaw_decode(codes)
    again = ulaw_decode(ulaw_encode(vals))
    assert (again == vals).all()
    # and arbitrary int16 signals decode within the G.711 quantization
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(2000) * 12000).astype(np.int16)
    err = np.abs(ulaw_decode(ulaw_encode(x)).astype(np.int32) - x.astype(np.int32))
    # μ-law step at the top segment is 1024; half-step rounding error
    assert err.max() <= 512, err.max()


def test_decode_audio_alaw_wav(spark):
    """A-law (format tag 6) also decodes through the Spark operator."""
    import numpy as np

    from blockchainspider_spark.functions.g711 import alaw_decode, wav_encode_g711
    from blockchainspider_spark.operators.multimodal import decode_audio

    codes = bytes((i * 37 + 5) % 256 for i in range(400))
    pdf = pd.DataFrame({
        "audio_id": ["a"], "bytes": [wav_encode_g711(codes, 16000, 6)],
        "fmt": ["wav"],
    })
    out = decode_audio(spark.createDataFrame(pdf)).collect()[0]
    x = alaw_decode(codes).astype(np.float64) / 32768.0
    assert out.sample_rate == 16000 and out.n_samples == 400
    assert abs(out.rms - np.sqrt((x * x).mean())) < 1e-12
    assert abs(out.peak - np.abs(x).max()) < 1e-12


def test_augment_images_deterministic_crop_and_flip(spark):
    """Seeded augmentation: params equal the md5 formula, the crop is
    the exact pixel window (reversed when flipped), reruns are
    byte-identical, a different seed moves the window, and an
    undersized image raises."""
    import hashlib

    import numpy as np
    import pytest as _pytest

    from blockchainspider_spark.functions.imagecodec import png_decode, png_encode
    from blockchainspider_spark.operators.multimodal import augment_images

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (16, 16, 3), np.uint8)  # asymmetric content
    pdf = pd.DataFrame({"image_id": ["im-1"], "bytes": [png_encode(px)], "fmt": ["png"]})
    images = spark.createDataFrame(pdf)

    r1 = augment_images(images, 8, 8, seed="aug").collect()[0]
    hx = hashlib.md5(b"im-1#aug").hexdigest()
    ox, oy = int(hx[0:7], 16) % 9, int(hx[7:14], 16) % 9
    flipped = int(hx[14:16], 16) % 2 == 1
    assert (r1.ox, r1.oy, r1.flipped) == (ox, oy, flipped)
    want = px[oy:oy + 8, ox:ox + 8]
    if flipped:
        want = want[:, ::-1]
    assert (png_decode(bytes(r1.bytes)) == want).all()

    r2 = augment_images(images, 8, 8, seed="aug").collect()[0]
    assert bytes(r2.bytes) == bytes(r1.bytes)  # rerun: byte-identical

    r3 = augment_images(images, 8, 8, seed="other").collect()[0]
    assert (r3.ox, r3.oy, r3.flipped) != (r1.ox, r1.oy, r1.flipped)

    r4 = augment_images(images, 8, 8, hflip=False, seed="aug").collect()[0]
    assert r4.flipped is False

    small = spark.createDataFrame(pd.DataFrame({
        "image_id": ["tiny"], "bytes": [png_encode(px[:4, :4])], "fmt": ["png"]}))
    with _pytest.raises(Exception, match="smaller than"):
        augment_images(small, 8, 8).collect()
