"""The canonical 1-D concat recipe — engine rendition of the reference's
``examples/feedstock/gpcp_from_gcs.py:44-55``: a date-keyed FilePattern,
opened and combined along ``time``, rechunked and written as Zarr v3.

Run: PYTHONPATH=/root/repo python examples/gpcp_like.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from data_generation import make_ds

from pangeo_forge_recipes_spark import ConcatDim, FilePattern, store_to_zarr
from pangeo_forge_recipes_spark.dsio import write_npz
from pangeo_forge_recipes_spark.ndset import assert_equal
from pangeo_forge_recipes_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="gpcp_like_")

    # "archive": one file per day, like gpcp's one-netcdf-per-date layout
    ds = make_ds(nt=10)
    dates = list(range(10))
    for d in dates:
        write_npz(os.path.join(work, f"gpcp_day_{d:02d}.npz"), ds.isel(time=slice(d, d + 1)))

    pattern = FilePattern(
        lambda time: os.path.join(work, f"gpcp_day_{time:02d}.npz"),
        ConcatDim("time", keys=dates, nitems_per_file=1),
        file_type="npz",
    )

    result = store_to_zarr(
        spark,
        pattern,
        target_root=work,
        store_name="gpcp.zarr",
        target_chunks={"time": 4},
        attrs={"recipe": "gpcp_like"},
    )
    assert_equal(result.open(), ds, check_attrs=False)  # store adds pangeo-forge:recipe
    print(f"wrote {result.path}: {result.n_chunks_written} chunks, "
          f"{result.bytes_written/1e6:.1f} MB — round-trip verified")


if __name__ == "__main__":
    main()
