"""Perceptual audio fingerprinting + near-duplicate detection — the
audio member of the engine's hash family (text SimHash, image pHash),
riding the same banded-Hamming pair engine.

The fingerprint is a spectral rank hash (the public robust-hash
family: Haitsma-Kalker band-energy signs, rank-ordered spectral
features): downmix to mono → 8 equal time segments → rFFT power per
segment → 8 log-spaced bands (MEAN power per bin, so band width never
dominates content) → within each segment the 4 most energetic bands
set their bit. Rank order is exactly gain-invariant and a perturbation
must reorder band energies across the segment's rank median to flip a
bit, so re-encoded/noisy copies land within a small Hamming radius
while different material disagrees on ~a third of the 64 cells.

Distributed shape: hashing is one ``mapInPandas`` over the binary
media column through :func:`.multimodal.decode_audio` (the engine's
own WAV codec) — O(n log n) in clip samples, no shuffle; pairs come
from :func:`.dedup.hamming_near_dup` (one banded exchange, window
bucket stats, star fallback). All float64 numpy — deterministic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .dedup import hamming_near_dup
from .multimodal import decode_audio

_SEGMENTS = 8
_BANDS = 8


def _band_edges(n_bins: int) -> np.ndarray:
    """Log-spaced band edges over the positive-frequency bins (DC
    excluded); requires ``n_bins ≥ _BANDS`` (the caller guarantees it by
    upsampling tiny clips) and ALWAYS returns ``_BANDS`` non-empty
    in-range bands — the first formulation padded past ``n_bins`` for
    short clips, producing empty bands, NaN cells, and one constant
    fingerprint for EVERY sub-128-sample payload (review finding:
    all fake-decoded non-audio rows flagged as mutual duplicates)."""
    edges = np.unique(
        np.round(np.geomspace(1, n_bins, _BANDS + 1)).astype(np.intp)
    )
    if len(edges) < _BANDS + 1:
        # too few distinct log edges (n_bins close to _BANDS): integer
        # linear split, strictly increasing whenever n_bins >= _BANDS
        edges = 1 + (np.arange(_BANDS + 1) * n_bins) // _BANDS
    return edges[: _BANDS + 1]


def fingerprint_bits(samples: np.ndarray) -> int:
    """64-bit spectral fingerprint of one mono clip (any length ≥ 8)."""
    x = np.asarray(samples, dtype=np.float64)
    # guarantee every segment yields >= _BANDS positive-frequency bins
    # (seg_len >= 2*_BANDS): tiny clips — including the 64-sample
    # fake-decode payloads of non-audio rows — tile up, so their hash
    # stays CONTENT-dependent instead of collapsing to one constant
    min_len = _SEGMENTS * 2 * _BANDS
    if x.size < min_len:
        x = np.resize(x, min_len)
    seg_len = x.size // _SEGMENTS
    segs = x[: seg_len * _SEGMENTS].reshape(_SEGMENTS, seg_len)
    power = np.abs(np.fft.rfft(segs, axis=1)) ** 2
    n_bins = power.shape[1] - 1  # DC excluded
    edges = _band_edges(n_bins)
    cells = np.empty((_SEGMENTS, _BANDS), dtype=np.float64)
    for b in range(_BANDS):
        lo, hi = edges[b], edges[b + 1]
        hi = max(hi, lo + 1)
        # MEAN power per bin, not sum: log-spaced bands differ in width
        # by ~500× and a width-proportional noise floor would swamp any
        # actual content (a pure tone hashed identical to white noise)
        cells[:, b] = power[:, lo : min(hi, power.shape[1])].mean(axis=1)
    # rank bits WITHIN each segment: the 4 most energetic of the 8 bands
    # set their bit. Rank order is exactly gain-invariant (no log, no
    # epsilon — two earlier formulations died here: a global median over
    # sum-cells was width-biased into a constant pattern, and log1p's
    # absolute +1 broke gain invariance at quantization-floor cells),
    # and a perturbation must reorder band energies across the segment's
    # median rank to flip a bit. argsort is stable, so exact ties break
    # by band index — deterministic.
    order = np.argsort(-cells, axis=1, kind="stable")
    bits = np.zeros((_SEGMENTS, _BANDS), dtype=np.uint8)
    rows = np.repeat(np.arange(_SEGMENTS), _BANDS // 2)
    bits[rows, order[:, : _BANDS // 2].ravel()] = 1
    return int(np.packbits(bits.ravel()).view(">u8")[0])


def fingerprint_bits_batch(arrays: list) -> np.ndarray:
    """Vectorized :func:`fingerprint_bits` over many clips (r13, guide
    §4.2): clips are grouped by effective length and each group runs ONE
    ``np.fft.rfft`` over a stacked ``(m·_SEGMENTS, seg_len)`` matrix
    instead of one tiny transform per clip — same per-row 1-D transform,
    so the bits are identical to the scalar path (pinned in
    tests/test_audiohash.py). Corpora are typically one or a few distinct
    clip lengths, so the grouping is near-free. Returns uint64[len]."""
    out = np.empty(len(arrays), dtype=np.uint64)
    min_len = _SEGMENTS * 2 * _BANDS
    by_len: dict = {}
    for i, a in enumerate(arrays):
        x = np.asarray(a, dtype=np.float64)
        if x.size < min_len:
            x = np.resize(x, min_len)
        by_len.setdefault(x.size, ([], []))
        by_len[x.size][0].append(i)
        by_len[x.size][1].append(x)
    half = _BANDS // 2
    rows = np.repeat(np.arange(_SEGMENTS), half)
    for size, (idxs, xs) in by_len.items():
        m = len(xs)
        seg_len = size // _SEGMENTS
        segs = np.stack(xs)[:, : seg_len * _SEGMENTS].reshape(
            m * _SEGMENTS, seg_len
        )
        power = np.abs(np.fft.rfft(segs, axis=1)) ** 2
        n_bins = power.shape[1] - 1
        edges = _band_edges(n_bins)
        cells = np.empty((m * _SEGMENTS, _BANDS), dtype=np.float64)
        for b in range(_BANDS):
            lo, hi = edges[b], edges[b + 1]
            hi = max(hi, lo + 1)
            cells[:, b] = power[:, lo : min(hi, power.shape[1])].mean(axis=1)
        cells = cells.reshape(m, _SEGMENTS, _BANDS)
        order = np.argsort(-cells, axis=2, kind="stable")
        bits = np.zeros((m, _SEGMENTS, _BANDS), dtype=np.uint8)
        ii = np.repeat(np.arange(m), _SEGMENTS * half)
        jj = np.tile(rows, m)
        bits[ii, jj, order[:, :, :half].reshape(m, -1).ravel()] = 1
        words = (
            np.packbits(bits.reshape(m, _SEGMENTS * _BANDS), axis=1)
            .view(">u8")
            .ravel()
            .astype(np.uint64)
        )
        out[np.asarray(idxs, dtype=np.intp)] = words
    return out


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Map-side fingerprint: ``(id_col, afp long)`` — one row per clip,
    decoded through the engine's WAV codec (non-audio payloads take the
    deterministic fake path, so mixed corpora keep flowing)."""
    decoded = decode_audio(
        df.select(df[id_col].alias("doc_id"), df[media_col].alias("media"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fingerprint_bits_batch(list(pdf["samples"]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "afp": out.view(np.int64)})

    out = decoded.mapInPandas(run, "doc_id long, afp long")
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out


def audio_near_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_hamming: int = 6,
    bucket_cap: int = 1000,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate clip pairs ``(id_a < id_b, hamming)`` — guaranteed
    recall while ``max_hamming ≤ bands - 1``; see
    :func:`.dedup.hamming_near_dup`."""
    sigs = audio_fingerprint(df, id_col, media_col)
    return hamming_near_dup(
        sigs,
        "afp",
        id_col=id_col,
        max_hamming=max_hamming,
        bucket_cap=bucket_cap,
        bands=bands,
    )
