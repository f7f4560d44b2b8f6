"""Shared synthetic archive for the example feedstock: four daily npz
files with a deterministic closed-form field (examples are
self-contained — a real feedstock would list archive urls instead)."""

from __future__ import annotations

import os
import tempfile

import numpy as np


def ensure_archive() -> list:
    """Create (once) and return the 4-file daily archive paths."""
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable

    root = os.path.join(tempfile.gettempdir(), "pfrs_example_archive")
    os.makedirs(root, exist_ok=True)
    paths = [os.path.join(root, f"day_{i}.npz") for i in range(4)]
    if all(os.path.exists(p) for p in paths):
        return paths
    nlat, nlon = 9, 18
    for i, path in enumerate(paths):
        temp = (
            10.0 * i
            + np.arange(nlat, dtype="float64")[:, None]
            + 0.1 * np.arange(nlon, dtype="float64")[None, :]
        )[None]
        ds = NDDataset(
            {"temp": Variable(("time", "lat", "lon"), temp, {"units": "K"})},
            {
                "time": Variable(("time",), np.array([i], dtype="int64")),
                "lat": Variable(("lat",), np.arange(nlat, dtype="float64")),
                "lon": Variable(("lon",), np.arange(nlon, dtype="float64")),
            },
        )
        tmp = path + ".tmp"
        write_npz(tmp, ds)
        os.replace(tmp, path)  # concurrent loads see whole files only
    return paths
