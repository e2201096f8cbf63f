"""IMA ADPCM (WAV format tag 0x0011) codec in pure Python/numpy.

The most common compressed WAV encoding in the wild after raw PCM;
extends the audio payload path (PCM16 + G.711 in functions/g711.py)
so a crawler ingesting WAV corpora decodes real 4-bit ADPCM instead
of refusing. Everything derives from the public IMA/DVI ADPCM spec
(IMA Digital Audio Focus Group, 1992) and the Microsoft WAV layout.

* Nibble kernel: the canonical step/index tables; diff accumulated
  from the CURRENT step (step>>3 base + conditional step, step>>1,
  step>>2 terms), sign nibble bit 8, index clamped to [0, 88],
  predictor clamped to int16. Bit-exact against the stdlib ``audioop``
  DVI kernel (same tables, same update order) — the independent
  oracle, modulo nibble packing (audioop packs the first sample in the
  HIGH nibble, IMA WAV in the LOW nibble).
* WAV block layout: per channel a 4-byte block header (int16
  predictor = first sample, step index, reserved), then 4-byte data
  words interleaved by channel (mono: contiguous); samples_per_block =
  (block_align - 4*channels) * 2 / channels + 1.
"""

from __future__ import annotations

import struct

import numpy as np

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


class AdpcmError(ValueError):
    pass


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _decode_nibble(nib: int, pred: int, index: int) -> tuple[int, int]:
    step = STEP_TABLE[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        diff = -diff
    pred = _clamp16(pred + diff)
    index = min(88, max(0, index + INDEX_TABLE[nib & 7]))
    return pred, index


def _encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one sample → (nibble, new predictor, new index). The
    mirror of _decode_nibble: the encoder reconstructs exactly what the
    decoder will, so quantization error never accumulates."""
    step = STEP_TABLE[index]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    tmp = step
    for mask in (4, 2, 1):
        if diff >= tmp:
            nib |= mask
            diff -= tmp
        tmp >>= 1
    pred, index = _decode_nibble(nib, pred, index)
    return nib, pred, index


def adpcm_block_decode(data: bytes, channels: int,
                       block_align: int) -> np.ndarray:
    """Raw IMA-WAV ADPCM frames → int16 samples, shape (n, channels)."""
    if channels not in (1, 2):
        raise AdpcmError(f"{channels} channels unsupported (mono/stereo)")
    if block_align < 4 * channels or (block_align - 4 * channels) % (4 * channels):
        raise AdpcmError(f"block_align {block_align} invalid for {channels}ch")
    out: list[list[int]] = []
    for b0 in range(0, len(data) - block_align + 1, block_align):
        block = data[b0:b0 + block_align]
        preds, idxs = [], []
        for ch in range(channels):
            pred, index, _rsv = struct.unpack_from("<hBB", block, 4 * ch)
            if index > 88:
                raise AdpcmError(f"step index {index} out of range")
            preds.append(pred)
            idxs.append(index)
        chans: list[list[int]] = [[p] for p in preds]   # header = 1st sample
        pos = 4 * channels
        while pos < block_align:
            for ch in range(channels):
                word = block[pos:pos + 4]
                for byte in word:
                    for nib in (byte & 0x0F, byte >> 4):  # low nibble first
                        preds[ch], idxs[ch] = _decode_nibble(
                            nib, preds[ch], idxs[ch])
                        chans[ch].append(preds[ch])
                pos += 4
        n = min(len(c) for c in chans)
        out.extend([[c[i] for c in chans] for i in range(n)])
    return np.array(out, np.int16).reshape(-1, channels)


def adpcm_block_encode(samples: np.ndarray, channels: int,
                       samples_per_block: int = 505) -> tuple[bytes, int]:
    """int16 (n, channels) → raw IMA-WAV ADPCM frames; returns
    (data, block_align). Trailing partial blocks are padded by
    repeating the last sample (decoders emit whole blocks)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.shape[1] != channels:
        raise AdpcmError("channel count mismatch")
    if (samples_per_block - 1) % 8:
        raise AdpcmError("samples_per_block must be 8k+1")
    spb = samples_per_block
    block_align = 4 * channels + (spb - 1) // 2 * channels
    n = samples.shape[0]
    n_blocks = -(-n // spb) if n else 0
    padded = np.vstack([samples,
                        np.repeat(samples[-1:], n_blocks * spb - n, axis=0)]
                       ) if n else samples
    out = bytearray()
    idxs = [0] * channels
    for b in range(n_blocks):
        block = padded[b * spb:(b + 1) * spb]
        preds = [int(block[0, ch]) for ch in range(channels)]
        for ch in range(channels):
            out += struct.pack("<hBB", preds[ch], idxs[ch], 0)
        nibs: list[list[int]] = [[] for _ in range(channels)]
        for i in range(1, spb):
            for ch in range(channels):
                nib, preds[ch], idxs[ch] = _encode_sample(
                    int(block[i, ch]), preds[ch], idxs[ch])
                nibs[ch].append(nib)
        # pack per channel into bytes (low nibble first), interleave
        # 4-byte words across channels
        packed = []
        for ch in range(channels):
            ns = nibs[ch]
            packed.append(bytes(
                ns[i] | (ns[i + 1] << 4) for i in range(0, len(ns), 2)))
        for w in range(0, len(packed[0]), 4):
            for ch in range(channels):
                out += packed[ch][w:w + 4]
    return bytes(out), block_align


def wav_adpcm_encode(samples: np.ndarray, rate: int = 16000,
                     channels: int = 1,
                     samples_per_block: int = 505) -> bytes:
    """int16 samples → a complete RIFF/WAVE file with fmt tag 0x0011
    (including the spec's cbSize=2 samples-per-block extension and the
    fact chunk real writers emit)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    data, block_align = adpcm_block_encode(samples, channels,
                                           samples_per_block)
    n_samples = samples.shape[0]
    byte_rate = rate * block_align // samples_per_block
    fmt = struct.pack("<HHIIHHHH", 0x0011, channels, rate, byte_rate,
                      block_align, 4, 2, samples_per_block)
    fact = struct.pack("<I", n_samples)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_adpcm_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE with fmt tag 0x0011 → (int16 (n, channels), rate).
    Honors the fact chunk's sample count (drops block padding)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AdpcmError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    n_samples = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact" and len(body) >= 4:
            (n_samples,) = struct.unpack_from("<I", body)
        elif cid == b"data":
            frames = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or frames is None:
        raise AdpcmError("missing fmt/data chunk")
    tag, channels, rate, _br, block_align = struct.unpack_from("<HHIIH", fmt)
    if tag != 0x0011:
        raise AdpcmError(f"fmt tag {tag:#06x} is not IMA ADPCM (0x0011)")
    out = adpcm_block_decode(frames, channels, block_align)
    if n_samples is not None:
        out = out[:n_samples]
    return out, rate
