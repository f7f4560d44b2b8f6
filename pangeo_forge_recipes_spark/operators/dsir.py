"""Data selection via importance resampling (DSIR-style): score raw
documents by how target-like their hashed n-gram distribution is, then
resample proportionally.

The public method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): fit bag-of-hashed-n-gram unigram+bigram
distributions p (target corpus) and q (raw corpus) over B buckets, score
every raw document with log w = Σ_ngrams log(p_b / q_b), and sample with
Gumbel-top-k on the log-weights.

Spark-first shape at 100 TB:

* the two histograms are ONE aggregation each — explode n-grams, hash to
  a bucket, map-side-combining count; driver/broadcast state is O(B)
  (default 8192 buckets ≈ 64 KB), never corpus-sized;
* per-document scoring is an explode → broadcast-join against the B-row
  log-ratio table → sum — all JVM-side, no Python in the hot path;
* the n-gram bucket hash is md5-prefix based (the repo's deterministic
  cross-engine convention), so weights are reproducible across runs,
  partitionings, and engines;
* Gumbel keys derive from md5(doc_id) — the "random" resample is a
  deterministic function of the data, re-runnable at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKENIZE = (
    "filter(split(lower(regexp_replace({col}, '[^A-Za-z0-9]+', ' ')), ' '), "
    "x -> x != '')"
)


def _ngrams_expr(col: str) -> str:
    """SQL array of unigram + bigram strings for text column ``col``.

    The token array is bound ONCE via a higher-order-function trick
    (a single-element ``transform`` whose lambda receives the array),
    so the regex tokenization is evaluated once per document — inlining
    it inside the bigram lambda's ``element_at`` would re-tokenize the
    whole text per element, O(tokens²) per document (measured 52 s vs
    1.5 s on the sf0.1 corpus)."""
    toks = _TOKENIZE.format(col=col)
    body = (
        "concat(t, CASE WHEN size(t) < 2 THEN array() ELSE "
        "transform(slice(t, 1, size(t) - 1), "
        "(x, i) -> concat(x, ' ', element_at(t, i + 2))) END)"
    )
    return f"element_at(transform(array({toks}), t -> {body}), 1)"


def _bucket(col: Column, buckets: int) -> Column:
    """Deterministic md5-prefix bucket hash (cross-engine reproducible)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets
    )


def hashed_ngram_counts(
    df: DataFrame, col: str = "text", buckets: int = 8192
) -> DataFrame:
    """(bucket, cnt) histogram of hashed unigrams+bigrams — one
    map-side-combining aggregation, output ≤ ``buckets`` rows."""
    grams = df.select(
        F.explode(F.expr(_ngrams_expr(col))).alias("gram")
    )
    return (
        grams.select(_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _log_ratio_array(
    raw: DataFrame,
    target: DataFrame,
    col: str,
    buckets: int,
    alpha: float,
):
    """B-element log-ratio vector: log((p_b + α̂)/(q_b + α̂)) with add-α
    smoothing on both normalized distributions.

    The two histograms are collected to the driver (≤ ``buckets`` rows
    each — O(buckets) driver state, the module's documented contract).
    r12 optimization (guide §2.4): the two histogram aggregations run as
    ONE job over the union of both corpora tagged by side — same two
    scans, but scheduled together so neither waits on the other's stage
    tail — and the ratio table becomes a plain Python list the caller
    embeds as a single array literal, replacing the former B-row
    broadcast-join relation."""
    import math

    tagged = target.select(
        F.lit(1).alias("__is_p"), F.col(col).alias(col)
    ).unionByName(raw.select(F.lit(0).alias("__is_p"), F.col(col).alias(col)))
    grams = tagged.select(
        "__is_p", F.explode(F.expr(_ngrams_expr(col))).alias("gram")
    )
    hist = (
        grams.select("__is_p", _bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("__is_p", "bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    p_counts = {int(r[1]): int(r[2]) for r in hist if r[0] == 1}
    q_counts = {int(r[1]): int(r[2]) for r in hist if r[0] == 0}
    p_tot = sum(p_counts.values())
    q_tot = sum(q_counts.values())
    return [
        math.log((p_counts.get(b, 0) + alpha) / (p_tot + alpha * buckets))
        - math.log((q_counts.get(b, 0) + alpha) / (q_tot + alpha * buckets))
        for b in range(buckets)
    ]


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """Attach ``log_weight`` (Σ log p/q over the doc's hashed n-grams) to
    every raw document.

    r12 optimization (guide §2.3/§2.4): scoring is computed INLINE per
    row — the doc's gram array folds over a single broadcast-literal
    log-ratio array (``aggregate(transform(grams, g → lr[bucket(g)]))``)
    — replacing the former explode → broadcast-join → groupBy(doc) sum →
    sort-merge-join-back pipeline. The scoring pass is now a pure map
    (zero exchanges); only the histogram job shuffles (≤ 2·B tiny rows).
    Documents with no n-grams get log_weight 0 (``aggregate`` over an
    empty array returns the 0.0 seed)."""
    import numpy as np

    lr = _log_ratio_array(raw, target, col, buckets, alpha)
    lr_lit = F.lit(np.asarray(lr, dtype="float64"))
    bucket_of = (
        "CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT) % " f"{buckets}"
    )
    weight = F.expr(
        f"aggregate(transform({_ngrams_expr(col)}, "
        f"g -> element_at(__lr, CAST({bucket_of} AS INT) + 1)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return (
        raw.withColumn("__lr", lr_lit)
        .withColumn("log_weight", weight)
        .drop("__lr")
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    alpha: float = 1.0,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k resample of ``n`` raw documents proportional to their
    importance weights (the DSIR selection step). The Gumbel key is a
    deterministic function of md5(doc_id) — reproducible across runs and
    partitionings; plans as a distributed TakeOrdered, never a full
    sort."""
    weighted = importance_weights(raw, target, col, id_col, buckets, alpha)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )
    # clamp away from {0,1} so the double log stays finite
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    gumbel = -F.log(-F.log(u))
    key = F.col("log_weight") / F.lit(float(temperature)) + gumbel
    return (
        weighted.withColumn("__key", key)
        .orderBy(F.desc("__key"))
        .limit(n)
        .drop("__key")
    )


__all__ = [
    "hashed_ngram_counts",
    "importance_weights",
    "dsir_sample",
]
