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
from pangeo_forge_recipes_spark.streaming.stateful import stateful_sessionize

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
    q.awaitTermination()
    assert_equal(open_zarr_group(str(tmp_path / "t" / "s.zarr")), ds0, check_attrs=False)

    # batch 2 arrives: the second dataset's files → appended
    with open(os.path.join(manifest_dir, "batch1.txt"), "w") as f:
        f.write("\n".join(f"{i},{p}" for i, p in enumerate(paths[2:])))
    q2 = stream_append_to_zarr(
        spark, manifest_dir, str(tmp_path / "t"), "s.zarr",
        concat_dim="time", target_chunks={"time": 2},
    )
    q2.awaitTermination()

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
    q.awaitTermination()
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


def test_streaming_dedup_drops_repeats_across_batches(spark, tmp_path):
    """Duplicate keys arriving in a LATER micro-batch must still be
    dropped: dedup state persists between batches (within the watermark)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pangeo_forge_recipes_spark.streaming.append import streaming_dedup

    rows = [
        (1, pd.Timestamp("2024-01-01 10:00:00"), "a"),
        (1, pd.Timestamp("2024-01-01 10:00:00"), "a"),  # dup within batch 0
        (2, pd.Timestamp("2024-01-01 11:00:00"), "b"),
    ]
    later = [
        (1, pd.Timestamp("2024-01-01 10:00:00"), "a"),  # dup across batches
        (3, pd.Timestamp("2024-01-01 12:00:00"), "a"),
    ]
    cols = ["user_id", "ts", "event_type"]
    events = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    spark.createDataFrame(pd.DataFrame(rows, columns=cols)).coalesce(1).write.parquet(
        str(tmp_path / "src/d0")
    )
    spark.createDataFrame(pd.DataFrame(later, columns=cols)).coalesce(1).write.parquet(
        str(tmp_path / "src/d1")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src/d*"))
    )
    q = (
        streaming_dedup(stream, keys=["user_id", "event_type", "ts"])
        .writeStream.format("memory")
        .queryName("_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("_dedup_test").collect()
    assert sorted((r["user_id"], r["event_type"]) for r in out) == [
        (1, "a"),
        (2, "b"),
        (3, "a"),
    ]
    # batch DataFrames take the plain dropDuplicates path, same result
    batch = streaming_dedup(events, keys=["user_id", "event_type", "ts"])
    assert batch.count() == 2


def test_stateful_sessionize_carries_state_across_batches(spark, tmp_path):
    """Two micro-batches split at a date boundary: the per-user
    (last_date, counts) state must persist between batches so the final
    update equals the batch LAG-based sessionization over all events."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for user in (1, 2, 3):
        for day, nev in [("2024-01-01", 3), ("2024-01-02", 2), ("2024-01-04", user)]:
            for k in range(nev):
                rows.append((eid, pd.Timestamp(f"{day} 0{k+1}:00:00"), user))
                eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    events = spark.createDataFrame(pdf)

    src = str(tmp_path / "src")
    # batch 0: days 1-2; batch 1: day 4 — one file each, one trigger each
    events.filter(F.col("ts") < "2024-01-03").coalesce(1).write.parquet(
        src + "/d0"
    )
    events.filter(F.col("ts") >= "2024-01-03").coalesce(1).write.parquet(
        src + "/d1"
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/d*")
    )
    q = (
        stateful_sessionize(stream)
        .writeStream.format("memory")
        .queryName("_sessions_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per user per batch — keep the latest
    updates = spark.table("_sessions_test").collect()
    assert len(updates) >= 3
    final = {}
    for r in updates:
        final[r["user_id"]] = (r["n_sessions"], r["n_events"])
    # 3 distinct days → 3 sessions; events: 3 + 2 + user
    for user in (1, 2, 3):
        assert final[user] == (3, 5 + user), (user, final[user])


def test_streaming_minhash_dedup_flags_cross_batch_near_dups(spark, tmp_path):
    """Near-dup docs split ACROSS micro-batches: the per-bucket first-seen
    state must persist so a batch-2 arrival collides with its batch-1
    twin; unrelated docs are never flagged."""
    import pandas as pd

    from pangeo_forge_recipes_spark.streaming import streaming_minhash_dedup

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the river runs quietly beneath the old stone bridge"
    )
    other = (
        "completely different material about fourier transforms and "
        "spectral methods for partial differential equations in physics"
    )
    rows = [
        (1, base),
        (2, other),
        # batch 2 arrivals: 3 is a near-dup of 1, 4 unrelated
        (3, base + " extra tail words"),
        (4, "unrelated text on medieval trade routes and salt taxation in europe"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    src = str(tmp_path / "docs")
    docs.filter("doc_id <= 2").coalesce(1).write.parquet(src + "/b0")
    docs.filter("doc_id > 2").coalesce(1).write.parquet(src + "/b1")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        streaming_minhash_dedup(stream)
        .writeStream.format("memory")
        .queryName("_minhash_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("_minhash_stream_test").collect()
    pairs = {(r["doc_id"], r["first_doc_id"]) for r in out}
    assert (3, 1) in pairs, pairs  # cross-batch collision caught
    flagged = {r["doc_id"] for r in out}
    assert 2 not in flagged and 4 not in flagged  # no false flags
    # batch parity: the streamed pair shares a batch LSH bucket, i.e. it
    # is exactly a batch candidate pair
    from pangeo_forge_recipes_spark.operators.dedup import minhash_band_hashes

    bh = minhash_band_hashes(spark.createDataFrame(pdf)).collect()
    by_doc = {}
    for r in bh:
        by_doc.setdefault(r["doc_id"], set()).add((r["band"], r["band_hash"]))
    assert by_doc[1] & by_doc[3], "streamed pair must share a batch LSH bucket"


def test_streaming_domain_cap_admits_across_batches(spark, tmp_path):
    """The per-host admit count persists across micro-batches: with cap=3
    and 2 hits for host A in batch 1, only ONE more A doc is admitted in
    batch 2 (the smallest id), and host B is capped independently."""
    import pandas as pd

    from pangeo_forge_recipes_spark.streaming import streaming_domain_cap

    def url(host, i):
        return f"https://{host}.example.com/p{i}"

    rows = [
        # batch 1: a x2, b x1
        (1, url("a", 1)), (2, url("a", 2)), (3, url("b", 3)),
        # batch 2: a x3 (ids 11 < 12 < 13 -> only 11 admitted), b x2 (both)
        (11, url("a", 11)), (12, url("a", 12)), (13, url("a", 13)),
        (14, url("b", 14)), (15, url("b", 15)),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "url"])
    docs = spark.createDataFrame(pdf)
    src = str(tmp_path / "docs")
    docs.filter("doc_id < 10").coalesce(1).write.parquet(src + "/b0")
    docs.filter("doc_id > 10").coalesce(1).write.parquet(src + "/b1")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        streaming_domain_cap(stream, cap=3)
        .writeStream.format("memory")
        .queryName("_domain_cap_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("_domain_cap_stream_test").collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], set()).add(r["doc_id"])
    assert by_host["a.example.com"] == {1, 2, 11}
    assert by_host["b.example.com"] == {3, 14, 15}


def test_streaming_domain_cap_duckdb_parity(spark, tmp_path):
    """Dual-engine check in the driver-slot shape: over a single
    micro-batch, first-arrived (ascending id) admission is exactly a
    row_number window ordered by id — the oracle a future driver slot
    uses (the _stream_minhash_q pattern: one-file stream, SQL-derivable
    semantics)."""
    import duckdb

    from pangeo_forge_recipes_spark.streaming import streaming_domain_cap

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet").selectExpr(
        "doc_id",
        "concat('https://site', cast(doc_id % 7 as string), '.example.com/',"
        " source, '/p', cast(doc_id as string)) AS url",
    )
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_domain_cap(stream, cap=30)
        .writeStream.format("memory")
        .queryName("_domain_cap_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["doc_id"], r["host"])
        for r in spark.table("_domain_cap_parity").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        (int(r[0]), r[1])
        for r in con.execute("""
WITH u AS (SELECT doc_id,
                  'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host
           FROM documents),
r AS (SELECT doc_id, host,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rn
      FROM u)
SELECT doc_id, host FROM r WHERE rn <= 30
""").fetchall()
    )
    assert got == want




def test_stateful_ttl_handler_logic():
    """state_ttl_ms logic against the REAL handler closures (Spark's
    timeout machinery is upstream; ours is eviction-on-timeout and the
    per-update setTimeoutDuration)."""
    import pandas as pd

    from pangeo_forge_recipes_spark.streaming.stateful import (
        _domain_cap_fold_handler,
        _minhash_flag_handler,
    )

    class FakeState:
        def __init__(self, value=None, timed_out=False):
            self._v = value
            self.hasTimedOut = timed_out
            self.removed = False
            self.armed = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self.removed = True
            self._v = None

        def setTimeoutDuration(self, ms):
            self.armed = ms

    # domain cap: timed-out invocation evicts, emits nothing
    st = FakeState(value=(3,), timed_out=True)
    out = list(_domain_cap_fold_handler(3, "doc_id", 1000)(("h",), iter([]), st))
    assert out == [] and st.removed
    # live invocation: admits smallest ids across chunks, arms the timeout
    st = FakeState()
    chunks = [pd.DataFrame({"doc_id": [9, 5]}), pd.DataFrame({"doc_id": [2]})]
    out = list(_domain_cap_fold_handler(2, "doc_id", 1000)(("h",), iter(chunks), st))
    assert list(out[0]["doc_id"]) == [2, 5]
    assert st.get == (2,) and st.armed == 1000
    # ttl=None never arms
    st = FakeState()
    list(_domain_cap_fold_handler(2, "doc_id", None)(("h",), iter([pd.DataFrame({"doc_id": [1]})]), st))
    assert st.armed is None
    # minhash flagger: eviction + arming + first-seen semantics
    st = FakeState(value=(7,), timed_out=True)
    out = list(_minhash_flag_handler("doc_id", 500)((3,), iter([]), st))
    assert out == [] and st.removed
    st = FakeState(value=(7,))
    out = list(
        _minhash_flag_handler("doc_id", 500)(
            (3,), iter([pd.DataFrame({"doc_id": [8, 7]})]), st
        )
    )
    assert list(out[0]["doc_id"]) == [8] and list(out[0]["first_doc_id"]) == [7]
    assert st.armed == 500
    # chunk-boundary determinism (r8 review finding): when a group spans
    # several Arrow chunks the representative must be the GLOBAL min,
    # not the min of the first chunk — ids collect across chunks first
    st = FakeState()
    chunks = [pd.DataFrame({"doc_id": [9, 5]}), pd.DataFrame({"doc_id": [2, 8]})]
    out = list(_minhash_flag_handler("doc_id", None)((1,), iter(chunks), st))
    assert st.get == (2,)
    assert list(out[0]["doc_id"]) == [5, 8, 9]
    assert set(out[0]["first_doc_id"]) == {2}


def test_streaming_hamming_dedup_cross_modal(spark, tmp_path):
    """Image pHash signatures split across micro-batches through the
    generic 64-bit streaming dedup: a batch-2 near-identical image
    collides with its batch-1 twin's bucket; a distinct image is never
    flagged. (Signatures are computed map-side on the stream — the same
    decode-through-own-codecs path as batch.)"""
    import numpy as np
    import pandas as pd

    from pangeo_forge_recipes_spark.operators.imagehash import image_phash
    from pangeo_forge_recipes_spark.pngio import encode_png
    from pangeo_forge_recipes_spark.streaming import streaming_hamming_dedup

    i, j = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    base = ((i * 3 + j * 5) % 256).astype(np.uint8)
    near = np.roll(base, 1, axis=1)  # one-pixel shift: hamming <= 6
    other = (np.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "media": [
                bytearray(encode_png(base)),
                bytearray(encode_png(other)),
                bytearray(encode_png(near)),  # batch 2: near-dup of 1
                bytearray(encode_png(base)),  # batch 2: exact dup of 1
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    src = str(tmp_path / "imgs")
    docs.filter("doc_id <= 2").coalesce(1).write.parquet(src + "/b0")
    docs.filter("doc_id > 2").coalesce(1).write.parquet(src + "/b1")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    sigs = image_phash(stream)
    q = (
        streaming_hamming_dedup(sigs, "phash")
        .writeStream.format("memory")
        .queryName("_hamming_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("_hamming_stream_test").collect()
    pairs = {(r["doc_id"], r["first_doc_id"]) for r in out}
    assert (4, 1) in pairs, pairs  # exact dup collides in every band
    assert (3, 1) in pairs, pairs  # pigeonhole: shift <= 6 < 8 bands
    flagged = {r["doc_id"] for r in out}
    assert 2 not in flagged and 1 not in flagged
