"""Streaming ingestion: FilePattern-as-stream and watermarked rollups.

The reference has no streaming engine — its incrementality is batch append
(``StoreToZarr(append_dim=...)``, reference ``transforms.py:673-693``) plus
merkle-hash resume (``patterns.py:302-318``). A growing FilePattern over a
date range *is* a file-arrival stream (SURVEY §2.8), so this module closes
the gap Spark-natively:

* :func:`stream_manifest` — a Structured Streaming source over a manifest
  directory: each arriving text file lists ``<concat_pos>,<url>`` lines
  (the streaming rendition of ``pattern.items()``);
* :func:`stream_append_to_zarr` — ``foreachBatch`` micro-batch appends
  through the exact same batch pipeline kernels (open → index → split →
  combine → aligned region write), in arrival order. Append is
  order-sensitive along the append dim, so micro-batches process
  positions monotonically — late files belong in a backfill batch run,
  exactly like the reference's non-idempotent append;
* :func:`watermarked_event_rollup` — event-time windowed aggregation with
  a watermark for late data (the streaming face of the
  ``events_hourly_rollup`` batch query).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_STREAM_SCHEMA = "value string"


def stream_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Streaming DataFrame of ``(pos, url)`` rows from a growing manifest
    directory. Producers append one text file per batch of new source
    files, each line ``<concat_pos>,<url>``."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 8)
        .load(manifest_dir)
    )
    split = F.split("value", ",", 2)
    return raw.select(
        split.getItem(0).cast("long").alias("pos"),
        split.getItem(1).alias("url"),
    )


def stream_append_to_zarr(
    spark: SparkSession,
    manifest_dir: str,
    target_root: str,
    store_name: str,
    concat_dim: str,
    target_chunks: Dict[str, int],
    file_type: str = "npz",
    checkpoint_dir: Optional[str] = None,
    available_now: bool = True,
):
    """Micro-batch append: every arriving manifest batch becomes one
    ``store_to_zarr`` append run over its files (ordered by position).

    The first batch bootstraps the store (``mode=w``); subsequent batches
    append along ``concat_dim``. Returns the StreamingQuery; callers
    ``awaitTermination()``. State the harness needs (positions already
    ingested) lives in the streaming checkpoint — restart-safe.
    """
    from ..patterns import pattern_from_file_sequence
    from ..storage import is_object_url
    from ..transforms import store_to_zarr
    from ..zarrio import ZARR_JSON, _store_for

    store_path = os.path.join(target_root, store_name)
    if checkpoint_dir is None:
        if is_object_url(target_root):
            # Spark's checkpoint filesystem goes through Hadoop, not the
            # engine's native object client — require an explicit
            # (local/HDFS/s3a-equipped) location instead of failing deep
            # inside the stream start
            raise ValueError(
                "stream_append_to_zarr: pass checkpoint_dir explicitly "
                "when target_root is an object-store url (the streaming "
                "checkpoint needs a Spark-accessible filesystem)"
            )
        checkpoint_dir = os.path.join(target_root, f"{store_name}.ckpt")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = sorted(batch_df.collect(), key=lambda r: r["pos"])
        if not rows:
            return
        urls = [r["url"] for r in rows]
        pattern = pattern_from_file_sequence(urls, concat_dim, file_type=file_type)
        # scheme-dispatched existence probe: LocalStore here would both
        # mis-answer for object-store targets AND create a literal
        # "s3:" directory as a side effect (r9 self-review)
        existing = _store_for(store_path).exists(ZARR_JSON)
        store_to_zarr(
            spark,
            pattern,
            target_root,
            store_name,
            target_chunks=target_chunks,
            append_dim=concat_dim if existing else None,
            consolidate_coords=False,
            consolidated_metadata=False,
        )

    stream = stream_manifest(spark, manifest_dir)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: drop repeat (key) arrivals as data
    streams in, keeping first-arrival rows. State is bounded by the
    watermark — Spark discards per-key state older than the watermark
    horizon, so the dedup map never grows unboundedly on an infinite
    stream (the batch equivalent is a plain ``dropDuplicates``; at 100 TB
    the streaming form is how dedup-at-ingest actually runs). Works on a
    streaming or batch DataFrame identically."""
    keys = keys or ["user_id", ts_col]
    if events.isStreaming:
        events, restore = _ltz_event_time(events, ts_col)
        return restore(events.withWatermark(ts_col, watermark).dropDuplicates(keys))
    return events.dropDuplicates(keys)


def _ltz_event_time(events: DataFrame, ts_col: str):
    """Watermarks only accept TIMESTAMP (LTZ) event time; parquet sources
    read under ``spark.sql.timestampType=TIMESTAMP_NTZ`` surface NTZ
    columns. Cast NTZ → LTZ for the watermark and hand back a restorer that
    casts the column back, so the operator is type-preserving. Lossless
    because the session timezone is pinned to UTC (session.py)."""
    if dict(events.dtypes).get(ts_col) != "timestamp_ntz":
        return events, lambda df: df
    cast = events.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))

    def restore(df: DataFrame) -> DataFrame:
        if ts_col in df.columns:
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp_ntz"))
        return df

    return cast, restore


def watermarked_event_rollup(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling-window rollup with late-data watermarking —
    works on a streaming or batch events DataFrame identically (run it on
    ``spark.readStream`` parquet over the events table)."""
    was_ntz = dict(events.dtypes).get(ts_col) == "timestamp_ntz"
    events, _ = _ltz_event_time(events, ts_col)
    start = F.col("win.start")
    if was_ntz:
        start = start.cast("timestamp_ntz")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            start.alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
