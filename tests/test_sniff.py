"""FileType.unknown auto-detection (the engine analog of the reference's
xarray-backend guess at openers.py:53-60 — magic numbers decide here)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pangeo_forge_recipes_spark.dsio import write_npz
from pangeo_forge_recipes_spark.ndset import assert_equal
from pangeo_forge_recipes_spark.openers import (
    open_with_ndset,
    read_schema,
    sniff_file_type,
)
from pangeo_forge_recipes_spark.patterns import FileType

from .data_generation import make_ds


def test_sniff_every_native_format(tmp_path):
    from pangeo_forge_recipes_spark.hdf5io import write_hdf5
    from pangeo_forge_recipes_spark.kerchunkio import scan_npz, write_reference_json
    from pangeo_forge_recipes_spark.netcdf3 import write_netcdf3

    ds = make_ds(nt=4)

    p = str(tmp_path / "a.bin")  # extension deliberately wrong everywhere
    write_npz(p, ds)
    assert sniff_file_type(p) == FileType.npz

    p = str(tmp_path / "b.bin")
    write_netcdf3(p, ds)
    assert sniff_file_type(p) == FileType.netcdf3

    p = str(tmp_path / "c.bin")
    write_hdf5(p, ds)
    assert sniff_file_type(p) == FileType.netcdf4

    refs = scan_npz(str(tmp_path / "a.bin"))
    p = str(tmp_path / "d.bin")
    write_reference_json(refs, p)
    assert sniff_file_type(p) == FileType.kerchunk

    # zarr: a directory with metadata
    from pangeo_forge_recipes_spark.aggregation import dataset_to_schema
    from pangeo_forge_recipes_spark.dsio import schema_to_zarr

    zp = str(tmp_path / "e.bin")
    schema_to_zarr(dataset_to_schema(ds), zp, target_chunks={"time": 2})
    assert sniff_file_type(zp) == FileType.zarr

    bad = str(tmp_path / "junk.bin")
    with open(bad, "wb") as f:
        f.write(b"\xde\xad\xbe\xef" * 4)
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_file_type(bad)


def test_sniff_grib(tmp_path):
    from pangeo_forge_recipes_spark.grib2io import write_grib2
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable

    rng = np.random.default_rng(5)
    nt, nj, ni = 2, 4, 6
    ds = NDDataset(
        {"t": Variable(("time", "latitude", "longitude"),
                       np.round(rng.uniform(250, 300, (nt, nj, ni)) * 64) / 64)},
        {
            "time": Variable(("time",), np.datetime64("2024-01-01", "ns")
                             + np.arange(nt) * np.timedelta64(6, "h")),
            "latitude": Variable(("latitude",), np.linspace(50, 40, nj),
                                 {"units": "degrees_north"}),
            "longitude": Variable(("longitude",), np.linspace(0, 10, ni),
                                  {"units": "degrees_east"}),
        },
        {},
        {"time": nt, "latitude": nj, "longitude": ni},
    )
    p = str(tmp_path / "g.bin")
    write_grib2(p, ds)
    assert sniff_file_type(p) == FileType.grib


def test_unknown_opens_and_schemas_via_sniff(tmp_path):
    ds = make_ds(nt=4)
    p = str(tmp_path / "mystery")
    write_npz(p, ds)
    out = open_with_ndset(p, FileType.unknown)
    assert_equal(out, ds)
    schema = read_schema(p, FileType.unknown)
    assert schema["dims"]["time"] == 4


def test_sniff_hdf5_userblock(tmp_path):
    """HDF5 signature behind a 512-byte userblock still detects."""
    from pangeo_forge_recipes_spark.hdf5io import write_hdf5

    ds = make_ds(nt=3)
    inner = str(tmp_path / "inner.h5")
    write_hdf5(inner, ds)
    shifted = str(tmp_path / "shifted.h5")
    with open(inner, "rb") as f, open(shifted, "wb") as g:
        g.write(b"\x00" * 512)
        g.write(f.read())
    assert sniff_file_type(shifted) == FileType.netcdf4
