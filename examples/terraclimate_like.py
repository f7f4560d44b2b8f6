"""User preprocessor recipe — engine rendition of the reference's
``examples/feedstock/terraclimate.py:59-215``: per-fragment metadata
fixes, variable drops/renames and value masking run as a preprocess
callable inside the open stage (the UDF surface of SURVEY §2.10).

Run: PYTHONPATH=/root/repo python examples/terraclimate_like.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
from data_generation import make_ds

from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
from pangeo_forge_recipes_spark.dsio import write_npz
from pangeo_forge_recipes_spark.session import get_spark


def preprocess(index, ds):
    """Drop one variable, rename another, mask negatives, fix attrs —
    the terraclimate recipe's shape of cleanup."""
    ds = ds.drop_vars(["bar"]).rename({"foo": "soil_moisture"})
    ds = ds.where("soil_moisture", lambda a: a > 0)  # mask negatives → NaN
    ds.attrs["title"] = "terraclimate-like cleaned dataset"
    return index, ds


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="terra_")

    ds = make_ds(nt=6)
    paths = []
    for i in range(3):
        p = os.path.join(work, f"terra_{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)

    pattern = pattern_from_file_sequence(paths, "time", nitems_per_file=2, file_type="npz")
    result = store_to_zarr(
        spark, pattern, work, "terra.zarr",
        target_chunks={"time": 3}, preprocess=preprocess,
    )
    out = result.open()
    assert set(out.data_vars) == {"soil_moisture"}, out.data_vars.keys()
    sm = out.data_vars["soil_moisture"].data
    assert np.isnan(sm[ds.data_vars["foo"].data <= 0]).all()
    print(f"wrote {result.path}: vars {sorted(out.data_vars)} with masking "
          "and renames applied in the open stage — verified")


if __name__ == "__main__":
    main()
