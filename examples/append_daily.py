"""Incremental append — engine rendition of the reference's
``StoreToZarr(append_dim=...)`` flow (``transforms.py:673-693``) with
merkle-hash resume detection (``patterns.py:302-318``): day 1 builds the
store, day 2's run detects the already-processed prefix and appends only
the new files.

Run: PYTHONPATH=/root/repo python examples/append_daily.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from data_generation import make_ds

from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
from pangeo_forge_recipes_spark.dsio import write_npz
from pangeo_forge_recipes_spark.ndset import assert_equal, concat
from pangeo_forge_recipes_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="append_")

    day1 = make_ds(nt=4, start="2010-01-01")
    day2 = make_ds(nt=4, start="2010-01-05")
    paths = []
    for label, ds in (("a", day1), ("b", day2)):
        for j in range(2):
            p = os.path.join(work, f"{label}{j}.npz")
            write_npz(p, ds.isel(time=slice(2 * j, 2 * j + 2)))
            paths.append(p)

    # initial build from day-1 files (coords stay chunk-grained: appends
    # grow them region by region)
    p1 = pattern_from_file_sequence(paths[:2], "time", nitems_per_file=2, file_type="npz")
    store_to_zarr(spark, p1, work, "daily.zarr", target_chunks={"time": 2},
                  consolidate_coords=False)

    # next day: the full pattern; merkle prefix match proves p1 is already
    # ingested, so only the suffix files run — with append_dim offsets
    p_full = pattern_from_file_sequence(paths, "time", nitems_per_file=2, file_type="npz")
    start = p_full.start_processing_from(p1.sha256())
    assert start is not None, "prefix mismatch — would require a full rebuild"
    suffix = pattern_from_file_sequence(paths[2:], "time", nitems_per_file=2, file_type="npz")
    result = store_to_zarr(spark, suffix, work, "daily.zarr",
                           target_chunks={"time": 2}, append_dim="time",
                           consolidate_coords=False)

    assert_equal(result.open(), concat([day1, day2], "time"), check_attrs=False)
    print(f"appended day 2 → {result.path}: dims {result.open().sizes} — verified")


if __name__ == "__main__":
    main()
