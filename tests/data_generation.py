"""Synthetic dataset generator — port of the reference's test data spec
(``/root/reference/tests/data_generation.py:6-45`` and FIXTURES.md F1):
seeded daily time × lat(18) × lon(36) grid with float ``foo`` and int
``bar`` (deliberately heterogeneous dtypes), CF time encoding."""

from __future__ import annotations

import numpy as np

from pangeo_forge_recipes_spark.ndset import NDDataset, Variable


def make_ds(nt: int = 10, non_dim_coords: bool = False, start: str = "2010-01-01") -> NDDataset:
    np.random.seed(2)
    ny, nx = 18, 36
    time = np.datetime64(start, "ns") + np.arange(nt) * np.timedelta64(1, "D")
    lon = (np.arange(nx) + 0.5) * 360 / nx
    lat = (np.arange(ny) + 0.5) * 180 / ny
    foo = np.random.rand(nt, ny, nx)
    bar = np.random.randint(0, 10, size=(nt, ny, nx))
    dims = ("time", "lat", "lon")

    coords = {
        "time": Variable(
            ("time",),
            time,
            encoding={"units": f"days since {start}", "calendar": "proleptic_gregorian"},
        ),
        "lat": Variable(("lat",), lat, {"units": "degrees_north", "long_name": "latitude"}),
        "lon": Variable(("lon",), lon, {"units": "degrees_east", "long_name": "longitude"}),
    }
    if non_dim_coords:
        coords["timestep"] = Variable(("time",), np.arange(nt))
        coords["baz"] = Variable(("lat", "lon"), np.random.rand(ny, nx))

    return NDDataset(
        data_vars={
            "bar": Variable(dims, bar, {"long_name": "Beautiful Bar"}),
            "foo": Variable(dims, foo, {"long_name": "Fantastic Foo"}),
        },
        coords=coords,
        attrs={"conventions": "CF 1.6"},
    )


def split_ds_into_files(ds: NDDataset, tmpdir: str, items_per_file: int = 1) -> list:
    """Write the dataset as a sequence of npz files along time (the
    reference's ``sequential_1d``/``2d`` fixtures, conftest.py:60-146)."""
    import os

    from pangeo_forge_recipes_spark.dsio import write_npz

    os.makedirs(tmpdir, exist_ok=True)
    nt = ds.sizes["time"]
    paths = []
    for i, start in enumerate(range(0, nt, items_per_file)):
        sub = ds.isel(time=slice(start, min(start + items_per_file, nt)))
        path = os.path.join(tmpdir, f"file_{i:03d}.npz")
        write_npz(path, sub)
        paths.append(path)
    return paths
