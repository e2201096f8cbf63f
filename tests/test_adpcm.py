"""IMA ADPCM (WAV tag 0x0011): nibble-kernel bit-parity against the
stdlib audioop DVI oracle, WAV block layout round trips, and the
payload-path dispatch."""

import numpy as np
import pytest

from blockchainspider_spark.functions import adpcm as A


def _snr_db(orig: np.ndarray, dec: np.ndarray) -> float:
    o = orig.astype(np.float64)
    e = dec.astype(np.float64) - o
    return 10 * np.log10((o * o).mean() / max((e * e).mean(), 1e-12))


def test_nibble_kernel_bit_exact_vs_audioop():
    """The decode kernel IS audioop's DVI kernel (same tables, same
    update order) — pinned bit-exactly over 4000 random nibbles.
    audioop packs the first sample of a pair in the HIGH nibble; IMA
    WAV uses the LOW nibble, so the oracle stream is repacked."""
    audioop = pytest.importorskip("audioop")
    rng = np.random.default_rng(0)
    nibs = rng.integers(0, 16, 4000).tolist()
    packed = bytes((nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2))
    lin, _state = audioop.adpcm2lin(packed, 2, None)
    want = np.frombuffer(lin, "<i2")
    pred = index = 0
    got = []
    for nb in nibs:
        pred, index = A._decode_nibble(nb, pred, index)
        got.append(pred)
    assert np.array_equal(np.array(got, np.int16), want)


def test_wav_roundtrip_mono_and_stereo_snr():
    t = np.arange(16000)
    left = (6000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    right = (3000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int16)

    dec, rate = A.wav_adpcm_decode(A.wav_adpcm_encode(left, rate=16000))
    assert rate == 16000 and dec.shape == (16000, 1)
    assert _snr_db(left, dec[:, 0]) >= 25      # ~4:1 lossy codec floor
    assert not np.array_equal(dec[:, 0], left)  # genuinely lossy

    st = np.stack([left, right], axis=1)
    dec2, _ = A.wav_adpcm_decode(A.wav_adpcm_encode(st, channels=2))
    assert dec2.shape == st.shape
    # channels must not bleed: per-channel SNR, not just combined
    assert _snr_db(left, dec2[:, 0]) >= 25
    assert _snr_db(right, dec2[:, 1]) >= 25


def test_fact_chunk_trims_block_padding():
    """A length that isn't a whole number of blocks: the encoder pads,
    the fact chunk records the true count, decode honors it."""
    sig = (np.linspace(-8000, 8000, 777)).astype(np.int16)
    dec, _ = A.wav_adpcm_decode(A.wav_adpcm_encode(sig, samples_per_block=505))
    assert dec.shape == (777, 1)
    assert _snr_db(sig, dec[:, 0]) >= 25


def test_block_headers_reset_predictor():
    """Every block header carries the first sample verbatim — a decoder
    that ignores headers drifts across blocks. Use a signal with a DC
    jump exactly at a block boundary."""
    spb = 33
    sig = np.concatenate([np.full(spb, -12000, np.int16),
                          np.full(spb, 15000, np.int16)])
    dec, _ = A.wav_adpcm_decode(A.wav_adpcm_encode(sig, samples_per_block=spb))
    assert int(dec[0, 0]) == -12000 and int(dec[spb, 0]) == 15000


def test_payload_path_dispatch_tag_17(spark):
    """decode_audio handles fmt tag 0x0011 through parse_wav — the
    crawl audio path accepts compressed WAVs, with duration/channels
    exact and RMS within the lossy budget."""
    import pandas as pd

    from blockchainspider_spark.operators.multimodal import decode_audio

    t = np.arange(8000)
    sig = (5000 * np.sin(2 * np.pi * 330 * t / 8000)).astype(np.int16)
    pdf = pd.DataFrame({"audio_id": ["a1"],
                        "bytes": [A.wav_adpcm_encode(sig, rate=8000)],
                        "fmt": ["wav"]})
    row = decode_audio(spark.createDataFrame(pdf)).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_samples) == (8000, 1, 8000)
    want_rms = float(np.sqrt(np.mean((sig / 32768.0) ** 2)))
    assert abs(row.rms - want_rms) < 0.01


def test_loud_gates():
    with pytest.raises(A.AdpcmError, match="RIFF"):
        A.wav_adpcm_decode(b"nope")
    with pytest.raises(A.AdpcmError, match="channels"):
        A.adpcm_block_decode(b"\x00" * 16, channels=3, block_align=8)
    with pytest.raises(A.AdpcmError, match="block_align"):
        A.adpcm_block_decode(b"\x00" * 16, channels=1, block_align=6)
    with pytest.raises(A.AdpcmError, match="8k"):
        A.adpcm_block_encode(np.zeros(8, np.int16), 1, samples_per_block=10)
    # a PCM file is NOT routed here
    from blockchainspider_spark.functions.g711 import parse_wav
    from blockchainspider_spark.operators.multimodal import wav_encode

    sr, nch, _ = parse_wav(wav_encode(np.zeros(10, np.int16), 8000))
    assert (sr, nch) == (8000, 1)
