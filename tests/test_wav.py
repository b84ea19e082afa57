"""WAV codec: round trips across encodings, stereo downmix through the
multimodal seam, rate-drift detection, and audio_features running with
the DEFAULT decoder over real WAV payloads (stubbed before round 3)."""

import struct

import numpy as np
import pytest

from imagingdb_spark import multimodal, wav

rng = np.random.default_rng(13)


# 8-bit: 1/254 rounding + the spec's 127-encode/128-decode scale asymmetry
# gives ~0.012 worst case
@pytest.mark.parametrize("bits,tol", [(8, 0.02), (16, 1e-4), (32, 1e-8)])
def test_pcm_roundtrip(bits, tol):
    a = rng.uniform(-0.99, 0.99, size=256)
    back, rate, ch = wav.decode_wav(wav.encode_wav(a, 16000, bits=bits))
    assert rate == 16000 and ch == 1 and back.shape == a.shape
    assert np.abs(back - a).max() < tol


def test_stereo_shape_and_downmix():
    a = rng.uniform(-0.9, 0.9, size=(128, 2))
    blob = wav.encode_wav(a, 8000)
    back, rate, ch = wav.decode_wav(blob)
    assert ch == 2 and back.shape == (128, 2)
    mono = multimodal.decode_pcm(blob, 8000)
    np.testing.assert_allclose(mono, back.mean(axis=1))


def test_ieee_float_read():
    a = rng.uniform(-1, 1, size=64).astype(np.float32)
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    raw = a.tobytes()
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    blob = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    back, rate, _ = wav.decode_wav(blob)
    np.testing.assert_allclose(back, a.astype(np.float64))


class TestErrors:
    def test_non_wav_rejected(self):
        with pytest.raises(ValueError, match="WAV"):
            wav.decode_wav(b"not audio")

    def test_compressed_rejected(self):
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
        chunks = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(ValueError, match="format tag"):
            wav.decode_wav(b"RIFF" + struct.pack("<I", len(chunks)) + chunks)

    def test_rate_drift_detected(self):
        blob = wav.encode_wav(np.zeros(8), 16000)
        with pytest.raises(ValueError, match="sample_rate"):
            multimodal.decode_pcm(blob, 44100)


def test_audio_features_with_default_decoder(spark):
    """End-to-end through Spark with NO injected fake: real WAV payloads
    decoded by the default codec inside mapInPandas."""
    a = rng.uniform(-0.8, 0.8, size=1024)
    df = spark.createDataFrame(
        [("c1", wav.encode_wav(a, 16000), 16000)],
        "clip_id string, payload binary, sample_rate int",
    )
    r = multimodal.audio_features(df, window=256).collect()[0]
    assert r["n_samples"] == 1024 and r["n_windows"] == 4
    # 16-bit quantization: features match within quantization error
    assert r["rms"] == pytest.approx(float(np.sqrt((a * a).mean())), abs=1e-3)
    assert r["peak"] == pytest.approx(float(np.abs(a).max()), abs=1e-3)
