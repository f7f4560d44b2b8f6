"""WAV codec: own RIFF/PCM/float parser cross-checked against the
independent stdlib ``wave`` implementation, plus the Spark-side
decode_audio / audio_features operators over genuine WAV payloads."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from pangeo_forge_recipes_spark.audioio import decode_wav, encode_wav


def _stdlib_wav(samples_i16: np.ndarray, rate: int, channels: int) -> bytes:
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples_i16.astype("<i2").tobytes())
    return bio.getvalue()


def test_decode_matches_stdlib_writer():
    """stdlib wave writes the file; our decoder must read it exactly."""
    rng = np.random.RandomState(0)
    pcm = rng.randint(-32768, 32767, size=500, dtype=np.int64)
    blob = _stdlib_wav(pcm, 8000, 1)
    arr, rate = decode_wav(blob)
    assert rate == 8000
    assert arr.shape == (500, 1)
    np.testing.assert_allclose(arr[:, 0], pcm / 32768.0, atol=1e-7)


def test_stdlib_reads_our_encoder():
    """Our encoder writes the file; stdlib wave must read it exactly."""
    t = np.linspace(0, 1, 200)
    samples = 0.25 * np.sin(2 * np.pi * 5 * t)
    blob = encode_wav(samples, 16000, bits=16)
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        back = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    np.testing.assert_array_equal(
        back, np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2")
    )


def test_stereo_roundtrip():
    rng = np.random.RandomState(1)
    samples = rng.uniform(-0.9, 0.9, size=(300, 2))
    arr, rate = decode_wav(encode_wav(samples, 44100, bits=16))
    assert arr.shape == (300, 2)
    assert rate == 44100
    np.testing.assert_allclose(arr, samples, atol=1.0 / 32768)


@pytest.mark.parametrize("bits,atol", [(8, 1 / 128), (16, 1 / 32768), (24, 1 / (1 << 23)), (32, 1e-7)])
def test_bit_depths(bits, atol):
    rng = np.random.RandomState(bits)
    samples = rng.uniform(-0.99, 0.99, size=257)
    arr, rate = decode_wav(encode_wav(samples, 22050, bits=bits))
    np.testing.assert_allclose(arr[:, 0], samples, atol=atol * 1.01)


def test_24bit_negative_values_exact():
    samples = np.array([-1.0, -0.5, 0.0, 0.5, 0.999])
    arr, _ = decode_wav(encode_wav(samples, 8000, bits=24))
    hi = ((1 << 23) - 1) / (1 << 23)
    np.testing.assert_allclose(arr[:, 0], np.clip(samples, -1, hi), atol=2 / (1 << 23))


def test_skips_extra_chunks():
    """LIST/fact chunks between fmt and data are walked over."""
    blob = bytearray(encode_wav(np.zeros(10) + 0.5, 8000, bits=16))
    # splice a LIST chunk after fmt (ends at 12+8+16=36)
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    spliced = bytes(blob[:36]) + extra + bytes(blob[36:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    arr, rate = decode_wav(spliced)
    assert arr.shape == (10, 1)
    np.testing.assert_allclose(arr[:, 0], 0.5, atol=1e-4)


def test_gates():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # unsupported codec (e.g. ADPCM, format code 2) raises clearly
    blob = bytearray(encode_wav(np.zeros(4), 8000, bits=16))
    blob[20:22] = struct.pack("<H", 2)
    with pytest.raises(NotImplementedError, match="format code 2"):
        decode_wav(bytes(blob))


def test_spark_decode_audio_and_features(spark):
    """End-to-end over Spark: synthesize real WAV payloads, decode, and
    extract features; closed-form triangle wave checks the values."""
    from pangeo_forge_recipes_spark.operators.multimodal import (
        attach_wav_media,
        audio_features,
        decode_audio,
    )

    base = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    media = attach_wav_media(base, n_samples=64, sample_rate=8000)
    decoded = decode_audio(media)
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert len(rows) == 8
    idx = np.arange(64)
    for d, row in rows.items():
        assert row["sample_rate"] == 8000
        assert row["channels"] == 1
        period = 8 + d % 23
        tri = (np.abs((idx % period) * 2.0 / period - 1.0) * 2.0 - 1.0) * 0.5
        np.testing.assert_allclose(row["samples"], tri, atol=1.5 / 32768)
    feats = {r["doc_id"]: r for r in audio_features(decoded).collect()}
    for d, row in feats.items():
        assert row["duration_s"] == pytest.approx(64 / 8000)
        assert 0.0 < row["rms"] < 0.5
        assert row["peak"] <= 0.5 + 1e-6
