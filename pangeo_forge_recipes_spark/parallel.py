"""Partitioning helpers shared by the CPU-bound extension operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the cluster's default parallelism, but only
    when the incoming plan has fewer partitions (e.g. a single-row-group
    parquet file → one unsplittable scan task). Already-parallel inputs —
    a cached repartitioned view, a post-shuffle stage — pass through
    untouched, avoiding a pointless extra exchange."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        current = 1
    if current >= target:
        return df
    return df.repartition(target)
