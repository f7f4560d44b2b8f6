"""CCNet-style language-model quality scoring: per-document
cross-entropy under a character n-gram model trained on a reference
corpus (the public CCNet recipe scores documents with a KenLM model and
keeps the low-perplexity tail; a byte-trigram model with add-k smoothing
is the dependency-free analog, deterministic and cross-engine exact).

Scale shape:

* training is ONE aggregation: per-partition numpy trigram counting
  (``np.unique`` over 24-bit packed ids — no Python loops) → hash-agg
  sum; the model is the distinct-trigram table (byte-text corpora hold
  at most 2^24 and practically ~10^5-10^6 rows ≈ MBs), broadcast once;
* scoring is map-only: per-batch vectorized ``np.searchsorted`` lookups
  against the broadcast arrays — no shuffle, no join;
* everything is integer/float arithmetic on byte values — reproducible
  across runs, partitionings, and platforms.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ORDER = 3  # byte trigrams: context = 2 bytes, predict the third


def _pack_ids(data: bytes) -> np.ndarray:
    """24-bit packed trigram ids of a byte string (empty for len < 3)."""
    a = np.frombuffer(data, dtype=np.uint8)
    if a.size < _ORDER:
        return np.zeros(0, dtype=np.int64)
    return (
        a[:-2].astype(np.int64) << 16
    ) | (a[1:-1].astype(np.int64) << 8) | a[2:].astype(np.int64)


def train_char_lm(
    df: DataFrame, col: str = "text"
) -> Tuple[np.ndarray, np.ndarray]:
    """Distributed byte-trigram counting → (sorted trigram ids, counts)."""

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [
                _pack_ids(t.encode("utf-8", "surrogatepass"))
                for t in pdf[col].astype(str)
            ]
            if not ids:
                continue
            allids = np.concatenate(ids) if ids else np.zeros(0, np.int64)
            if allids.size == 0:
                continue
            uniq, cnt = np.unique(allids, return_counts=True)
            yield pd.DataFrame({"tri": uniq, "cnt": cnt.astype(np.int64)})

    agg = (
        df.select(col)
        .mapInPandas(count, "tri long, cnt long")
        .groupBy("tri")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    # r12 (guide §2.4): sort the ≤2^24-row model table on the driver —
    # the former .orderBy("tri") added a full range-partition exchange
    # to the train job just to order rows the driver re-materializes
    # into numpy arrays anyway.
    tri = np.array([r["tri"] for r in agg], dtype=np.int64)
    cnt = np.array([r["cnt"] for r in agg], dtype=np.int64)
    order = np.argsort(tri, kind="stable")
    return tri[order], cnt[order]


def _context_table(tri: np.ndarray, cnt: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Aggregate trigram counts to their 16-bit contexts (sorted)."""
    ctx = tri >> 8
    uniq, inverse = np.unique(ctx, return_inverse=True)
    totals = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(totals, inverse, cnt)
    return uniq, totals


def score_cross_entropy(
    df: DataFrame,
    model: Tuple[np.ndarray, np.ndarray],
    col: str = "text",
    k_smooth: float = 0.5,
    out: str = "bits_per_char",
) -> DataFrame:
    """Attach per-document cross-entropy (bits per predicted byte) under
    the trigram model: -mean log2 (c(tri)+k)/(c(ctx)+k*256). Lower =
    more target-like; documents shorter than 3 bytes get NULL."""
    spark = df.sparkSession
    tri, cnt = model
    ctx, ctot = _context_table(tri, cnt)
    bc = spark.sparkContext.broadcast(
        (tri, cnt.astype(np.float64), ctx, ctot.astype(np.float64))
    )
    fields = df.schema.fieldNames()
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out} double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tri_b, cnt_b, ctx_b, ctot_b = bc.value
        for pdf in batches:
            vals = []
            for t in pdf[col].astype(str):
                ids = _pack_ids(t.encode("utf-8", "surrogatepass"))
                if ids.size == 0:
                    vals.append(None)
                    continue
                pos = np.searchsorted(tri_b, ids)
                pos_ok = (pos < len(tri_b)) & (
                    tri_b[np.minimum(pos, len(tri_b) - 1)] == ids
                )
                c = np.where(pos_ok, cnt_b[np.minimum(pos, len(tri_b) - 1)], 0.0)
                cpos = np.searchsorted(ctx_b, ids >> 8)
                cok = (cpos < len(ctx_b)) & (
                    ctx_b[np.minimum(cpos, len(ctx_b) - 1)] == (ids >> 8)
                )
                ct = np.where(cok, ctot_b[np.minimum(cpos, len(ctx_b) - 1)], 0.0)
                logp = np.log2(c + k_smooth) - np.log2(ct + k_smooth * 256.0)
                vals.append(float(-logp.mean()))
            res = pdf[fields].copy()
            res[out] = pd.array(vals, dtype="float64")
            yield res

    return df.mapInPandas(score, schema)


def quality_filter(
    df: DataFrame,
    reference: DataFrame,
    col: str = "text",
    max_bits_per_char: float | None = None,
    keep_fraction: float | None = 0.5,
    k_smooth: float = 0.5,
) -> DataFrame:
    """CCNet-shaped filter: train on the reference corpus, score the raw
    corpus, keep documents under a cross-entropy ceiling — either an
    absolute ``max_bits_per_char`` or the corpus ``keep_fraction``
    quantile (computed with Spark's exact ``percentile``; swap
    approx_percentile at 100 TB)."""
    model = train_char_lm(reference, col)
    scored = score_cross_entropy(df, model, col, k_smooth)
    if max_bits_per_char is None:
        if keep_fraction is None:
            raise ValueError("need max_bits_per_char or keep_fraction")
        cut = scored.agg(
            F.expr(f"percentile(bits_per_char, {float(keep_fraction)})")
        ).collect()[0][0]
    else:
        cut = max_bits_per_char
    return scored.where(F.col("bits_per_char") <= float(cut))


def perplexity_buckets(
    df: DataFrame,
    reference: DataFrame,
    col: str = "text",
    cuts: Tuple[float, float] = (1 / 3, 2 / 3),
    k_smooth: float = 0.5,
) -> DataFrame:
    """CCNet's head/middle/tail split: score the corpus against the
    reference LM and label each document by its cross-entropy tercile
    (``head`` = lowest perplexity, most reference-like; CCNet trains on
    head+middle and discards or down-weights tail).

    One extra driver-side quantile pass over the scored corpus (exact
    ``percentile`` here; swap ``approx_percentile`` at 100 TB — the
    label assignment itself is a broadcast of two cut points, map-only).
    Adds ``bits_per_char`` and ``ppl_bucket`` columns."""
    lo_q, hi_q = cuts
    model = train_char_lm(reference, col)
    scored = score_cross_entropy(df, model, col, k_smooth)
    lo, hi = scored.agg(
        F.expr(f"percentile(bits_per_char, {float(lo_q)})"),
        F.expr(f"percentile(bits_per_char, {float(hi_q)})"),
    ).collect()[0]
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col("bits_per_char") <= float(lo), F.lit("head"))
        .when(F.col("bits_per_char") <= float(hi), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


__all__ = [
    "train_char_lm",
    "score_cross_entropy",
    "quality_filter",
    "perplexity_buckets",
]
