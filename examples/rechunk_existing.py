"""Rechunk an existing Zarr store — engine rendition of the reference's
``examples/feedstock/gpcp_rechunk.py:16-40``: a 1-element pattern over a
store url, re-stored with new target chunks (exercises the split path
where target dims are absent from the index).

Run: PYTHONPATH=/root/repo python examples/rechunk_existing.py
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
from pangeo_forge_recipes_spark.ndset import assert_equal
from pangeo_forge_recipes_spark.session import get_spark
from pangeo_forge_recipes_spark.zarrio import open_group


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="rechunk_")

    # build the "existing" store, chunked {time: 1}
    ds = make_ds(nt=8)
    src = os.path.join(work, "files")
    os.makedirs(src)
    paths = []
    for i in range(8):
        p = os.path.join(src, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(i, i + 1)))
        paths.append(p)
    first = store_to_zarr(
        spark,
        pattern_from_file_sequence(paths, "time", nitems_per_file=1, file_type="npz"),
        work, "fine.zarr", target_chunks={"time": 1},
    )

    # 1-element pattern over the store → new chunking {time: 4}
    pattern = pattern_from_file_sequence([first.path], "time", file_type="zarr")
    result = store_to_zarr(
        spark, pattern, work, "coarse.zarr", target_chunks={"time": 4}
    )
    assert_equal(result.open(), ds)
    foo = open_group(result.path)["foo"]
    assert foo.chunks[0] == 4, foo.chunks
    print(f"rechunked {first.path} (time:1) -> {result.path} (time:4) — verified")


if __name__ == "__main__":
    main()
