"""Structured Streaming tests: streamed incremental append equals the batch
result; watermarked rollup over a streamed events table equals the batch
aggregation."""

from __future__ import annotations

import os
import shutil
import time

import pytest

from pangeo_forge_recipes_spark.dsio import open_zarr_group, write_npz
from pangeo_forge_recipes_spark.ndset import assert_equal, concat
from pangeo_forge_recipes_spark.streaming import (
    stream_append_to_zarr,
    watermarked_event_rollup,
)

from .data_generation import make_ds


def test_stream_append_equals_batch(spark, tmp_path):
    ds0 = make_ds(nt=4, start="2010-01-01")
    ds1 = make_ds(nt=4, start="2010-01-05")
    files_dir = str(tmp_path / "files")
    manifest_dir = str(tmp_path / "manifest")
    os.makedirs(files_dir)
    os.makedirs(manifest_dir)

    paths = []
    for i, ds in enumerate([ds0, ds1]):
        for j in range(2):
            p = os.path.join(files_dir, f"f{i}_{j}.npz")
            write_npz(p, ds.isel(time=slice(2 * j, 2 * j + 2)))
            paths.append(p)

    # batch 1: the first dataset's files
    with open(os.path.join(manifest_dir, "batch0.txt"), "w") as f:
        f.write("\n".join(f"{i},{p}" for i, p in enumerate(paths[:2])))

    q = stream_append_to_zarr(
        spark, manifest_dir, str(tmp_path / "t"), "s.zarr",
        concat_dim="time", target_chunks={"time": 2},
    )
    q.awaitTermination(120)
    assert_equal(open_zarr_group(str(tmp_path / "t" / "s.zarr")), ds0, check_attrs=False)

    # batch 2 arrives: the second dataset's files → appended
    with open(os.path.join(manifest_dir, "batch1.txt"), "w") as f:
        f.write("\n".join(f"{i},{p}" for i, p in enumerate(paths[2:])))
    q2 = stream_append_to_zarr(
        spark, manifest_dir, str(tmp_path / "t"), "s.zarr",
        concat_dim="time", target_chunks={"time": 2},
    )
    q2.awaitTermination(120)

    expected = concat([ds0, ds1], "time")
    assert_equal(
        open_zarr_group(str(tmp_path / "t" / "s.zarr")), expected, check_attrs=False
    )


def test_watermarked_rollup_stream_equals_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_events = spark.read.parquet(os.path.join(sf, "events.parquet"))
    from pyspark.sql import functions as F

    if dict(batch_events.dtypes).get("ts") == "bigint":
        batch_events = batch_events.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    # copy to a stream-source dir (parquet streaming source needs a schema)
    src = str(tmp_path / "stream_src")
    batch_events.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        watermarked_event_rollup(stream, "1 hour", "2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; every emitted
    # window must match the batch aggregation exactly
    streamed = spark.read.parquet(out_dir)
    batch = watermarked_event_rollup(batch_events, "1 hour", "2 hours")
    b = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    s_rows = streamed.collect()
    assert len(s_rows) > 0
    for r in s_rows:
        key = (r["window_start"], r["event_type"])
        assert b[key] == (r["n"], r["total_value"])
