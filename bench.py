"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries execute end-to-end into a noop sink (full materialization, no
driver collect cost). Each query is timed as best-of-2 to damp JIT/cache
warmup jitter; the Spark session is built before timing starts.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pangeo_forge_recipes_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q13_customer_distribution",
    "q16_supplier_cnt",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_inactive_customers",
    "topk_customers",
    "window_running_total",
    "set_ops_customers",
    "events_multi_grain_rollup",
    "events_sessions",
    "asof_last_order",
    "range_join_orders",
    "skew_salted_join",
    "text_doc_metrics",
    "text_fingerprints",
    "sample_split_stats",
    "top_bigrams",
    "corpus_clean",
    "dedup_exact",
    "dedup_ngram_signature",
    "dedup_minhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_simhash",
    "embedding_near_dup",
    "multimodal_stats",
    "multimodal_features",
    "dedup_clusters",
    "dedup_ngram_spans",
    "pack_sequences",
    "corpus_shards",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _bench_zarr_pipeline(spark) -> dict:
    """BASELINE.md's reference-parity perf proxy: wall-clock of the full
    store_to_zarr round (manifest → schema pass → open → split → shuffled
    combine+write) over a ~50 MB synthetic hypercube in 8 files."""
    import shutil
    import tempfile

    import numpy as np

    from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable

    nt, nlat, nlon = 64, 180, 360
    rng = np.random.RandomState(7)
    ds = NDDataset(
        {
            "foo": Variable(
                ("time", "lat", "lon"),
                rng.standard_normal((nt, nlat, nlon)),
            ),
            "bar": Variable(
                ("time", "lat", "lon"),
                rng.randint(0, 10_000, (nt, nlat, nlon)).astype("int32"),
            ),
        },
        {
            "time": Variable(("time",), np.arange(nt, dtype="int64")),
            "lat": Variable(("lat",), np.linspace(-89.5, 89.5, nlat)),
            "lon": Variable(("lon",), np.linspace(0.5, 359.5, nlon)),
        },
        {},
        {"time": nt, "lat": nlat, "lon": nlon},
    )
    tmp = tempfile.mkdtemp(prefix="pfrs_bench_")
    try:
        paths = []
        for i in range(8):
            p = os.path.join(tmp, f"f{i}.npz")
            write_npz(p, ds.isel(time=slice(8 * i, 8 * i + 8)))
            paths.append(p)
        pattern = pattern_from_file_sequence(
            paths, "time", nitems_per_file=8, file_type="npz"
        )
        # best-of-2 (same policy as the queries): first run pays the python
        # worker warm-up for this stage shape. chunks=16 spans two 8-step
        # files → the true rechunk shuffle; chunks=8 aligns with files →
        # the zero-shuffle fast path
        out = {}
        for label, chunk in (("shuffled", 16), ("aligned", 8)):
            wall, mb = None, 0.0
            for run in range(2):
                t0 = time.perf_counter()
                result = store_to_zarr(
                    spark, pattern, tmp, f"bench_{label}{run}.zarr",
                    target_chunks={"time": chunk},
                )
                dt = time.perf_counter() - t0
                wall = dt if wall is None else min(wall, dt)
                mb = result.bytes_written / 1e6
                assert result.shuffled == (label == "shuffled")
            out[label] = {
                "wall": round(wall, 3),
                "mb_written": round(mb, 1),
                "mb_per_s": round(mb / wall, 1),
            }

        # kerchunk branch: combined virtual references over the same files
        from pangeo_forge_recipes_spark import write_combined_reference

        wall = None
        for run in range(2):
            t0 = time.perf_counter()
            write_combined_reference(
                spark, pattern, tmp, f"bench_ref{run}", max_refs_per_merge=4
            )
            dt = time.perf_counter() - t0
            wall = dt if wall is None else min(wall, dt)
        out["kerchunk"] = {"wall": round(wall, 3)}

        # incremental append: bootstrap from half the files, append the rest
        first = pattern_from_file_sequence(
            paths[:4], "time", nitems_per_file=8, file_type="npz"
        )
        rest = pattern_from_file_sequence(
            paths[4:], "time", nitems_per_file=8, file_type="npz"
        )
        wall = None
        for run in range(2):
            store_to_zarr(
                spark, first, tmp, f"bench_app{run}.zarr",
                target_chunks={"time": 8}, consolidate_coords=False,
            )
            t0 = time.perf_counter()
            store_to_zarr(
                spark, rest, tmp, f"bench_app{run}.zarr",
                target_chunks={"time": 8}, append_dim="time",
                consolidate_coords=False,
            )
            dt = time.perf_counter() - t0
            wall = dt if wall is None else min(wall, dt)
        out["append"] = {"wall": round(wall, 3)}
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark(app_name="pfrs-bench")
    queries = entrymod.queries()

    # one warm query to JIT the scan path before any timing
    entrymod._register(spark, sf_dir)
    spark.table("lineitem").count()

    # pipeline proxy first: measured before the query storm churns the
    # python worker pool (box shows 2-3x wall variance under load)
    pipeline = _bench_zarr_pipeline(spark)

    # per-query latency: sequential, best-of-2
    timings = {}
    for name in HEADLINE:
        fn = queries[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # suite throughput: all headline queries submitted concurrently (FAIR
    # scheduler) — the engine-level wall-clock for the whole workload;
    # overlaps scheduler fixed costs exactly as a real multi-query workload
    # would
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(
            pool.map(
                lambda name: _materialize(queries[name](spark, sf_dir)), HEADLINE
            )
        )
    concurrent_wall = round(time.perf_counter() - t0, 3)

    # apples-to-apples reference: the DuckDB oracle SQL for every headline
    # query that has one, same parquet inputs, single process
    import duckdb

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # the hash-family replication oracles (minhash/simhash/clusters/lsh/ivf/
    # multimodal sha) are correctness artifacts written for the sf0.01 gate:
    # they deliberately do O(n²) all-pairs work that the Spark operators
    # avoid, so at sf0.1 they measure the oracle, not the engine. The
    # apples-to-apples baseline is the shared-ANSI + cheap-oracle set.
    replication_oracles = {
        "dedup_minhash_pairs",
        "dedup_clusters",
        "dedup_simhash",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "multimodal_features",
    }
    duck_total, duck_n = 0.0, 0
    for name in HEADLINE:
        if name in oracles and name not in replication_oracles:
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            duck_total += time.perf_counter() - t0
            duck_n += 1

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_concurrent",
                "value": concurrent_wall,
                "unit": "sec",
                "queries": timings,
                "sequential_total": round(sum(timings.values()), 3),
                "duckdb_oracle_wall": round(duck_total, 3),
                "duckdb_oracle_queries": duck_n,
                "zarr_pipeline": pipeline,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
