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

    # -- the HRRR 2-D shape over GRIB2 sources -------------------------------
    # the reference feedstock concatenates kerchunked GRIB along one dim;
    # the engine's nested ordered reduce handles two (outer slices ->
    # inner combine -> outer combine), here (time x latitude)
    from pangeo_forge_recipes_spark import ConcatDim, FilePattern
    from pangeo_forge_recipes_spark.grib2io import write_grib2
    from pangeo_forge_recipes_spark.ndset import NDDataset

    rng = np.random.default_rng(5)
    nt, nj, ni = 4, 6, 9
    gds = NDDataset(
        {"t": Variable(("time", "latitude", "longitude"),
                       np.round(rng.uniform(250, 310, (nt, nj, ni)) * 128) / 128)},
        {"time": Variable(("time",), np.datetime64("2024-03-01T00", "ns")
                          + np.arange(nt) * np.timedelta64(6, "h")),
         "latitude": Variable(("latitude",), np.linspace(60.0, 30.0, nj)),
         "longitude": Variable(("longitude",), np.linspace(0.0, 40.0, ni))},
        {}, {"time": nt, "latitude": nj, "longitude": ni},
    )
    for ti in range(2):
        for li in range(2):
            sub = gds.isel(time=slice(2 * ti, 2 * ti + 2),
                           latitude=slice(3 * li, 3 * li + 3))
            write_grib2(os.path.join(work, f"hrrr_t{ti}_l{li}.grib2"), sub)
    pattern2d = FilePattern(
        lambda time, latitude: os.path.join(work, f"hrrr_t{time}_l{latitude}.grib2"),
        ConcatDim("time", keys=[0, 1], nitems_per_file=2),
        ConcatDim("latitude", keys=[0, 1], nitems_per_file=3),
        file_type="grib",
    )
    ref2d = write_combined_reference(
        spark, pattern2d, work, "hrrr_like_2d", concat_dims=["time", "latitude"]
    )
    v2 = open_reference_dataset(ref2d)
    np.testing.assert_allclose(
        np.asarray(v2.data_vars["t"].data), gds.data_vars["t"].data
    )
    print("2-D (time x latitude) GRIB kerchunk combine — verified")


if __name__ == "__main__":
    main()
