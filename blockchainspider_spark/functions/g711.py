"""G.711 μ-law / A-law decode + a permissive WAV parser.

The stdlib ``wave`` module rejects anything but WAVE_FORMAT_PCM, so
compressed-telephony WAVs (format tags 6 = A-law, 7 = μ-law) previously
fell into the loud NotImplementedError gate. Both codecs are pure
closed-form byte→int16 expansions (ITU-T G.711), implemented here as
vectorized numpy table lookups — REAL decode, no codec library needed.
Pinned bit-exactly against the stdlib ``audioop`` expansion for all 256
code values in tests/test_multimodal.py (audioop is deprecated for
3.13, which is exactly why the decode lives here and audioop is only
the test oracle).

``parse_wav`` is a minimal RIFF walker: PCM16 delegates to the stdlib
``wave`` reader (identical behavior to before), tags 6/7 decode via
G.711, anything else still raises NotImplementedError — a silent fake
would corrupt a training pipeline downstream.
"""

from __future__ import annotations

import io
import struct

import numpy as np

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7


def _ulaw_table() -> np.ndarray:
    u = ~np.arange(256, dtype=np.int64) & 0xFF
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign, -sample, sample).astype(np.int16)


def _alaw_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = (a & 0x80) != 0
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    sample = np.where(
        exponent > 0,
        ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
        (mantissa << 4) + 8,
    )
    # A-law sign bit is INVERTED vs μ-law: set bit (after the 0x55 XOR)
    # means positive — audioop/ITU table convention
    return np.where(sign, sample, -sample).astype(np.int16)


_ULAW = _ulaw_table()
_ALAW = _alaw_table()


def ulaw_decode(data: bytes) -> np.ndarray:
    """G.711 μ-law bytes → int16 samples (vectorized table lookup)."""
    return _ULAW[np.frombuffer(data, dtype=np.uint8)]


def alaw_decode(data: bytes) -> np.ndarray:
    """G.711 A-law bytes → int16 samples (vectorized table lookup)."""
    return _ALAW[np.frombuffer(data, dtype=np.uint8)]


def ulaw_encode(samples: np.ndarray) -> bytes:
    """int16 → μ-law bytes (for tests/sinks): nearest-code inverse of
    the decode table via searchsorted over the 256 decoded levels."""
    order = np.argsort(_ULAW.astype(np.int32), kind="stable")
    levels = _ULAW.astype(np.int32)[order]
    idx = np.clip(np.searchsorted(levels, samples.astype(np.int32)), 0, 255)
    left = np.clip(idx - 1, 0, 255)
    pick = np.where(
        np.abs(levels[left] - samples) <= np.abs(levels[np.clip(idx, 0, 255)] - samples),
        left, idx,
    )
    return order[np.clip(pick, 0, 255)].astype(np.uint8).tobytes()


def wav_encode_g711(samples_u8: bytes, sample_rate: int, fmt_tag: int,
                    n_channels: int = 1) -> bytes:
    """Wrap raw G.711 code bytes in a minimal RIFF/WAVE container
    (fmt tag 6 or 7, one byte per sample)."""
    n = len(samples_u8)
    byte_rate = sample_rate * n_channels
    fmt = struct.pack("<HHIIHH", fmt_tag, n_channels, sample_rate,
                      byte_rate, n_channels, 8)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", n) + samples_u8 + (b"\x00" if n % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks) - 4) + chunks


def parse_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV container → (sample_rate, n_channels, int16 samples).

    PCM16 goes through the stdlib reader (bit-identical to the previous
    behavior); G.711 tags 6/7 decode here; other tags raise
    NotImplementedError naming the tag."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE container")
    # walk chunks for fmt + data
    pos, fmt_tag, sr, nch, bits, payload = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt_tag, nch, sr = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
        elif cid == b"data":
            payload = body
        pos += 8 + clen + (clen % 2)
    if fmt_tag is None or payload is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    if fmt_tag == WAVE_FORMAT_PCM:
        if bits != 16:
            raise NotImplementedError("only 16-bit PCM WAV is supported")
        import wave as wavmod

        with wavmod.open(io.BytesIO(data)) as w:
            return (w.getframerate(), w.getnchannels(),
                    np.frombuffer(w.readframes(w.getnframes()), dtype="<i2"))
    if fmt_tag == WAVE_FORMAT_MULAW:
        return sr, nch, ulaw_decode(payload)
    if fmt_tag == WAVE_FORMAT_ALAW:
        return sr, nch, alaw_decode(payload)
    if fmt_tag == 0x0011:  # IMA ADPCM (round 6 continuation)
        from blockchainspider_spark.functions.adpcm import wav_adpcm_decode

        samples, rate = wav_adpcm_decode(data)
        return rate, samples.shape[1], samples.reshape(-1)
    raise NotImplementedError(
        f"WAV format tag {fmt_tag}: only PCM16 (1), A-law (6), μ-law (7), "
        "IMA ADPCM (17) decode in this container"
    )
