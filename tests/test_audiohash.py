"""Audio fingerprint near-dup: hash invariants (gain/noise robustness,
separation), the banded Hamming join vs brute force, mixed-payload
flow."""

from __future__ import annotations

import numpy as np
import pytest

from pangeo_forge_recipes_spark.audioio import encode_wav
from pangeo_forge_recipes_spark.operators import audiohash as ah


def _ham(a, b):
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _tone():
    # harmonic-rich, music-like: 7 decaying harmonics of 220 Hz
    t = np.arange(16000) / 16000.0
    return sum((0.5 / k) * np.sin(2 * np.pi * 220 * k * t) for k in range(1, 8)) / 2.0


def _chirpy():
    t = np.arange(16000) / 16000.0
    return (np.sin(2 * np.pi * 261.6 * t * (1 + 0.5 * t)) * np.exp(-2 * t)) * 0.8


@pytest.fixture(scope="module")
def clips(spark):
    """0/1 identical tone; 2 gain-scaled; 3 lightly noisy; 10 chirp;
    11 white noise; 20 a non-audio payload (fake-decode path)."""
    rng = np.random.RandomState(3)
    tone = _tone()
    rows = [
        (0, bytearray(encode_wav(tone, 16000))),
        (1, bytearray(encode_wav(tone, 16000))),
        (2, bytearray(encode_wav(tone * 0.3, 16000))),
        (3, bytearray(encode_wav(np.clip(tone + rng.randn(16000) * 0.01, -1, 1), 16000))),
        (10, bytearray(encode_wav(_chirpy(), 16000))),
        (11, bytearray(encode_wav(rng.randn(16000) * 0.2, 16000))),
        (20, bytearray(b"not audio at all, just bytes")),
    ]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_fingerprint_invariants():
    tone = _tone()
    f = ah.fingerprint_bits(tone)
    assert f == ah.fingerprint_bits(tone.copy())
    assert _ham(f, ah.fingerprint_bits(tone * 0.5)) == 0  # gain-invariant
    assert _ham(f, ah.fingerprint_bits(tone * 0.01)) == 0  # rank bits
    rng = np.random.RandomState(9)
    assert _ham(f, ah.fingerprint_bits(tone + rng.randn(16000) * 0.01)) <= 4
    assert _ham(f, ah.fingerprint_bits(_chirpy())) > 8
    # degenerate inputs hash without error
    ah.fingerprint_bits(np.zeros(5))
    ah.fingerprint_bits(np.arange(16) / 16.0)


def test_fingerprint_matches_independent_numpy_recompute():
    """The full 64-bit hash, recomputed here from the documented
    algorithm with straight numpy (no calls into audiohash internals):
    8 segments → rfft power → 8 log-band MEAN powers (DC excluded) →
    top-4 bands per segment (stable ties by band index) → MSB-first
    packbits. This is the oracle the driver slot's docstring points at."""
    for clip in (_tone(), _chirpy(), np.random.RandomState(5).randn(4096)):
        x = np.asarray(clip, dtype=np.float64)
        if x.size < 128:
            x = np.resize(x, 128)
        seg = x[: (x.size // 8) * 8].reshape(8, x.size // 8)
        power = np.abs(np.fft.rfft(seg, axis=1)) ** 2
        n_bins = power.shape[1] - 1
        edges = np.unique(np.round(np.geomspace(1, n_bins, 9)).astype(int))
        if len(edges) < 9:
            edges = 1 + (np.arange(9) * n_bins) // 8
        edges = edges[:9]
        cells = np.empty((8, 8))
        for b in range(8):
            lo, hi = edges[b], max(edges[b + 1], edges[b] + 1)
            cells[:, b] = power[:, lo : min(hi, power.shape[1])].mean(axis=1)
        want = 0
        for s in range(8):
            top = np.argsort(-cells[s], kind="stable")[:4]
            for b in range(8):
                want = (want << 1) | (1 if b in top else 0)
        assert ah.fingerprint_bits(clip) == want


def test_audio_fingerprint_dataframe(spark, clips):
    out = {r["doc_id"]: r["afp"] for r in ah.audio_fingerprint(clips).collect()}
    assert len(out) == 7  # fake-decode payload flows through too
    assert out[0] == out[1] == out[2]  # identical + gain-scaled
    assert _ham(out[0], out[3]) <= 4
    assert _ham(out[0], out[10]) > 8 and _ham(out[0], out[11]) > 8
    out2 = {
        r["doc_id"]: r["afp"]
        for r in ah.audio_fingerprint(clips.repartition(4)).collect()
    }
    assert out == out2  # partitioning-invariant


def test_near_dup_matches_brute_force(spark, clips):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ah.audio_near_dup(clips, max_hamming=6).collect()
    }
    hashes = {r["doc_id"]: r["afp"] for r in ah.audio_fingerprint(clips).collect()}
    ids = sorted(hashes)
    want = {
        (a, b): _ham(hashes[a], hashes[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _ham(hashes[a], hashes[b]) <= 6
    }
    assert got == want  # pigeonhole: radius 6 < 8 bands ⟹ full recall
    assert (0, 1) in got and (0, 2) in got and (0, 3) in got
    assert all(10 not in p and 11 not in p for p in got)


def test_fake_decode_payloads_hash_distinctly():
    """Review regression: sub-128-sample clips (every fake-decoded
    non-audio payload is 64 samples) used to produce empty bands, NaN
    cells, and ONE constant fingerprint — flagging all non-audio rows
    as mutual duplicates."""
    import hashlib
    import warnings

    hashes = set()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the NaN path warned; none allowed
        for blob in (b"doc one", b"doc two", b"doc three"):
            digest = hashlib.sha256(blob).digest()
            fake = (
                np.frombuffer((digest * 2)[:64], dtype=np.uint8).astype("float32")
                / 255.0
                - 0.5
            )
            hashes.add(ah.fingerprint_bits(fake))
    assert len(hashes) == 3


def test_fingerprint_batch_matches_scalar():
    """r13 batched-FFT path: fingerprint_bits_batch groups clips by
    length and runs one stacked rfft per group — bits must be identical
    to the scalar pin above for every clip, across mixed lengths
    (including sub-min_len fake-decode payloads and odd sizes)."""
    rng = np.random.RandomState(7)
    clips = []
    for n in (7, 64, 128, 129, 200, 256, 256, 1000, 4096):
        for _ in range(5):
            clips.append(rng.standard_normal(n))
    idx = np.arange(256)
    for d in range(40):
        period = 8 + d % 23
        clips.append(
            (np.abs((idx % period) * 2.0 / period - 1.0) * 2.0 - 1.0) * 0.5
        )
    single = np.array([ah.fingerprint_bits(c) for c in clips], dtype=np.uint64)
    batch = ah.fingerprint_bits_batch(clips)
    assert batch.dtype == np.uint64
    assert (single == batch).all()
