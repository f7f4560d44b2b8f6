"""Training-data assembly operators: sequence packing, shard layout,
stratified sampling, and cross-document n-gram span dedup.

These are the operations that sit between a cleaned corpus and a
training run:

- :func:`with_global_order` / :func:`pack_sequences` — deterministic
  corpus shuffle and GPT-style concat-and-chunk sequence packing (every
  document lands at a stable token offset; sequences are fixed
  ``seq_len`` windows over the concatenated token stream),
- :func:`shard_assign` / :func:`write_shards` — deterministic balanced
  shard layout for a multi-host data loader,
- :func:`stratified_sample` — exact per-stratum quotas (by language,
  source, ...) with a deterministic md5 ranking, stable across engines,
  runs and repartitionings,
- :func:`crossdoc_ngram_dup` — per-document fraction of word n-grams
  shared with other documents (the n-gram-granular approximation of
  suffix-array substring dedup à la "Deduplicating Training Data Makes
  Language Models Better").

100 TB notes: nothing here collects the corpus. The global prefix sum
behind packing is two passes — per-partition partial sums (one tiny
driver collect of O(partitions) rows) broadcast back as offsets — the
classic distributed scan, so packing never funnels through a single
window task. Shard assignment and stratified ranking are md5
expressions / per-stratum windows (shuffle ∝ corpus, no driver state).
The n-gram dup join's big side is the exploded gram stream; the gram
frequency table it joins against is aggregated map-side first.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.textexprs import TextExprs

__all__ = [
    "with_global_order",
    "pack_sequences",
    "pack_summary",
    "shard_assign",
    "write_shards",
    "stratified_sample",
    "crossdoc_ngram_dup",
]


def _order_key(id_col: str):
    """Deterministic shuffle key: md5 of the id — engine- and
    partitioning-stable, uniform, reproducible without a seed."""
    return F.md5(F.col(id_col).cast("string"))


def with_global_order(
    df: DataFrame,
    id_col: str = "doc_id",
    out_col: str = "ord_key",
) -> DataFrame:
    """Attach the deterministic global-shuffle key. Sorting by
    ``(out_col, id_col)`` is the corpus's canonical training order."""
    return df.withColumn(out_col, _order_key(id_col))


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    id_col: str = "doc_id",
    count_col: str = "token_count",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in the
    deterministic md5 order and the concatenated token stream is cut into
    fixed ``seq_len`` sequences; each document is tagged with the sequence
    its first token falls in (``seq_id``) plus its global token offset.

    The global running sum is a distributed scan, not a single-partition
    window: range-partition by the order key, per-partition partial sums,
    one O(partitions) driver collect, broadcast offsets. Output columns:
    input columns + ``ord_key``, ``token_offset``, ``seq_id``.
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 4)
    keyed = with_global_order(df, id_col).repartitionByRange(
        num_partitions, "ord_key", id_col
    )
    # pass 1: per-partition token totals (tiny driver collect, O(partitions))
    pid = F.spark_partition_id()
    totals = (
        keyed.select(pid.alias("pid"), F.col(count_col))
        .groupBy("pid")
        .agg(F.sum(count_col).alias("tot"))
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["tot"] or 0
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField, StructType

    out_fields = keyed.schema.fieldNames() + ["token_offset", "seq_id"]
    schema = StructType(
        list(keyed.schema.fields)
        + [StructField("token_offset", LongType()), StructField("seq_id", LongType())]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one partition per task: local cumsum + broadcast global offset.
        # rows inside a range partition still need the canonical sort —
        # repartitionByRange places, but does not order within.
        rows = pd.concat(list(batches)) if batches else None
        if rows is None or not len(rows):
            return
        rows = rows.sort_values(["ord_key", id_col], kind="mergesort")
        import pyspark

        part = pyspark.TaskContext.get().partitionId()
        start = bc.value.get(part, 0)
        cum = rows[count_col].cumsum() - rows[count_col]
        rows["token_offset"] = (cum + start).astype("int64")
        rows["seq_id"] = (rows["token_offset"] // seq_len).astype("int64")
        yield rows[out_fields]

    return keyed.mapInPandas(scan, schema)


def pack_summary(
    packed: DataFrame, count_col: str = "token_count", id_col: str = "doc_id"
) -> DataFrame:
    """Per-sequence packing stats over :func:`pack_sequences` output."""
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(count_col).alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .orderBy("seq_id")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic shard assignment: the md5 bucket of the id (the same
    portable hash the train/val/test splitter uses) — uniform in
    expectation, stable across engines and repartitionings, and pure
    JVM-side expression (no shuffle at assignment time; the shuffle
    happens once, inside :func:`write_shards`' partitioned write)."""
    expr = TextExprs("spark", "text").sample_bucket(
        f"cast({id_col} as string)", n_shards
    )
    return df.withColumn(out_col, F.expr(expr).cast("int"))


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> None:
    """Materialize the shard layout: one parquet directory per shard
    (``shard=N/``), each shard internally in canonical md5 order so a
    data loader streams it sequentially."""
    (
        shard_assign(df, n_shards, id_col)
        .withColumn("ord_key", _order_key(id_col))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "ord_key", id_col)
        .drop("ord_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    n_per_stratum: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum quota sample: the ``n_per_stratum`` documents
    with the smallest md5 rank inside each stratum. Deterministic (no
    seed drift between runs or engines) and exact (unlike
    ``df.sampleBy``, which is only proportional in expectation). One
    shuffle on the stratum key; per-stratum windows scale out because
    strata are independent — a skewed stratum bounds a single task at
    O(stratum), the usual salting escape applies if one stratum dominates.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(_order_key(id_col), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def crossdoc_ngram_dup(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document duplicated-span fraction: the share of a document's
    word ``n``-grams that also occur in at least one *other* document —
    the n-gram-granular approximation of exact substring dedup
    (reference point: suffix-array dedup in "Deduplicating Training
    Data Makes Language Models Better"; this trades exact spans for a
    pure explode → hash-aggregate → equi-join plan).

    Output: (id, n_grams, dup_grams, dup_frac, keep) where ``keep`` is
    the ``dup_frac <= threshold`` gate. Docs shorter than ``n`` tokens
    have no grams and are kept.

    Scale shape: grams explode to ~tokens rows; the frequency table
    aggregates map-side before its shuffle; the join back is an
    equi-join on the gram string (AQE handles the skewed empty-ish
    grams). No driver state, no windows.
    """
    e = TextExprs("spark", text_col)
    grams = df.select(
        F.col(id_col), F.explode(F.expr(e.token_ngrams(n))).alias("gram")
    )
    # distinct per (doc, gram): a gram repeated inside ONE doc is
    # repetition (filters.top_ngram_fraction), not cross-doc duplication
    doc_grams = grams.distinct()
    freq = doc_grams.groupBy("gram").agg(F.count("*").alias("nd"))
    per_doc = (
        doc_grams.join(freq, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("dup_grams"),
        )
    )
    n_g = F.coalesce("n_grams", F.lit(0))
    dup_g = F.coalesce("dup_grams", F.lit(0))
    frac = F.round(dup_g / F.greatest(n_g, F.lit(1)).cast("double"), 4)
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        n_g.alias("n_grams"),
        dup_g.alias("dup_grams"),
        frac.alias("dup_frac"),
        (frac <= threshold).alias("keep"),
    )
