"""Virtual-Zarr reference recipe — engine rendition of the reference's
``examples/feedstock/hrrr_kerchunk_concat_step.py:43-57``: scan each
source file into byte-range references, reduce them in concat order, and
serialize a reference file that readers open without copying any data.

Uses netcdf3 sources to show the native classic-format scanner.

Run: PYTHONPATH=/root/repo python examples/kerchunk_reference.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
from data_generation import make_ds

from pangeo_forge_recipes_spark import pattern_from_file_sequence, write_combined_reference
from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
from pangeo_forge_recipes_spark.ndset import Variable, assert_equal
from pangeo_forge_recipes_spark.netcdf3 import write_netcdf3
from pangeo_forge_recipes_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="kerchunk_")

    ds = make_ds(nt=6)
    paths = []
    for i in range(3):
        p = os.path.join(work, f"model_step_{i}.nc")
        write_netcdf3(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)

    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="netcdf3"
    )
    ref_path = write_combined_reference(
        spark, pattern, work, "hrrr_like", max_refs_per_merge=2
    )

    # open through the reference — no bytes were copied, netcdf3 is read
    # in place via byte ranges
    virtual = open_reference_dataset(ref_path)
    expected = ds.isel()
    for name, var in expected.data_vars.items():
        if var.dtype == np.int64:  # classic netcdf has no int64
            expected.data_vars[name] = Variable(
                var.dims, var.data.astype("int32"), dict(var.attrs), dict(var.encoding)
            )
    assert_equal(virtual, expected)
    print(f"reference file {ref_path} opens the {len(paths)} netcdf3 files "
          "as one dataset — verified")


if __name__ == "__main__":
    main()
