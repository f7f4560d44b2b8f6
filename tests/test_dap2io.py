"""OPeNDAP/DAP2: pure-Python wire client against a real (local, threaded)
HTTP server, plus the Zarr pipeline running end-to-end from opendap
sources (reference parity: engine row ``openers.py:44`` and the
``narr_opendap.py`` feedstock, which opens remote ``dodsC`` URLs with no
download/cache step)."""

from __future__ import annotations

import numpy as np
import pytest

from .data_generation import make_ds
from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
from pangeo_forge_recipes_spark.aggregation import dataset_to_schema
from pangeo_forge_recipes_spark.dap2io import (
    dap2_schema,
    parse_das,
    parse_dds,
    read_dap2,
    serve_ndsets,
)
from pangeo_forge_recipes_spark.ndset import NDDataset, Variable, assert_equal
from pangeo_forge_recipes_spark.openers import open_with_ndset, read_schema
from pangeo_forge_recipes_spark.patterns import FileType


@pytest.fixture(scope="module")
def served():
    ds = make_ds(nt=6, non_dim_coords=False)
    parts = {f"part{i}": ds.isel(time=slice(2 * i, 2 * i + 2)) for i in range(3)}
    with serve_ndsets({"full": ds, **parts}) as srv:
        yield srv, ds


def test_read_round_trip(served):
    srv, ds = served
    got = read_dap2(srv.url_for("full"))
    assert_equal(got, ds)
    # int64 has no DAP2 representation: served as Float64, values exact
    assert got.data_vars["bar"].data.dtype == np.dtype("f8")
    assert got.coords["time"].data.dtype == np.dtype("M8[ns]")
    assert got.coords["time"].encoding["units"] == "days since 2010-01-01"


def test_projection_prunes_transfer(served):
    srv, ds = served
    got = read_dap2(srv.url_for("full"), projection=["foo", "time"])
    assert set(got.data_vars) == {"foo"}
    # grid maps (time/lat/lon) ride along with the projected array
    assert set(got.coords) == {"time", "lat", "lon"}
    np.testing.assert_allclose(got.data_vars["foo"].data, ds.data_vars["foo"].data)


def test_schema_matches_full_open(served):
    srv, ds = served
    sch = dap2_schema(srv.url_for("full"))
    full = dataset_to_schema(read_dap2(srv.url_for("full")))
    assert sch["dims"] == full["dims"]
    assert sorted(sch["coords"]) == sorted(full["coords"])
    assert sorted(sch["data_vars"]) == sorted(full["data_vars"])
    assert sch["coords"]["time"]["dtype"] == "datetime64[ns]"
    assert sch["data_vars"]["foo"]["shape"] == [6, 18, 36]
    assert sch["attrs"]["conventions"] == "CF 1.6"


def test_openers_route_opendap(served):
    srv, ds = served
    got = open_with_ndset(srv.url_for("full"), file_type=FileType.opendap)
    assert_equal(got, ds)
    sch = read_schema(srv.url_for("full"), file_type=FileType.opendap)
    assert sch["dims"] == {"time": 6, "lat": 18, "lon": 36}


def test_small_int_types_round_trip():
    ds = NDDataset(
        {
            "b": Variable(("x",), np.arange(5, dtype="u1"), {"k": "v"}),
            "s": Variable(("x",), np.array([-3, 0, 7, 1000, -1000], dtype="i2")),
            "u": Variable(("x",), np.array([0, 9, 65535, 1, 2], dtype="u2")),
        },
        {"x": Variable(("x",), np.arange(5, dtype="i4"))},
        {"note": 'quote " and backslash \\ survive'},
        {"x": 5},
    )
    with serve_ndsets({"t": ds}) as srv:
        got = read_dap2(srv.url_for("t"))
    assert_equal(got, ds)
    assert got.data_vars["b"].data.dtype == np.dtype("u1")
    assert got.data_vars["s"].data.dtype == np.dtype("i2")
    assert got.data_vars["u"].data.dtype == np.dtype("u2")
    assert got.attrs["note"] == 'quote " and backslash \\ survive'


def test_parse_dds_grid_and_das():
    dds = parse_dds(
        "Dataset {\n"
        "    Float64 time[time = 4];\n"
        "    Grid {\n"
        "     ARRAY:\n"
        "        Float32 air[time = 4][y = 2][x = 3];\n"
        "     MAPS:\n"
        "        Float64 time[time = 4];\n"
        "        Float64 y[y = 2];\n"
        "        Float64 x[x = 3];\n"
        "    } air;\n"
        "} air.nc;\n"
    )
    assert dds["name"] == "air.nc"
    air = [v for v in dds["vars"] if v["name"] == "air"][0]
    assert air["dims"] == [("time", 4), ("y", 2), ("x", 3)]
    assert [m["name"] for m in air["maps"]] == ["time", "y", "x"]
    das = parse_das(
        "Attributes {\n"
        "    air {\n"
        '        String units "K";\n'
        "        Float64 scale 1.5;\n"
        "        Int32 levels 1, 2, 3;\n"
        "    }\n"
        "    NC_GLOBAL {\n"
        '        String title "t";\n'
        "    }\n"
        "}\n"
    )
    assert das["air"] == {"units": "K", "scale": 1.5, "levels": [1, 2, 3]}
    assert das["NC_GLOBAL"] == {"title": "t"}


def test_store_to_zarr_from_opendap(spark, served, tmp_path):
    """The narr_opendap feedstock shape: remote DAP endpoints straight into
    StoreToZarr, no caching stage, opens running inside executors."""
    srv, ds = served
    urls = [srv.url_for(f"part{i}") for i in range(3)]
    pattern = pattern_from_file_sequence(
        urls, "time", nitems_per_file=2, file_type="opendap"
    )
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "dap.zarr", target_chunks={"time": 3}
    )
    got = result.open()
    # served ints come back as Float64 (DAP2 wire limit); values exact
    assert_equal(got, ds)


# ---------------------------------------------------------------------------
# hyperslab constraints (server-side subsetting)
# ---------------------------------------------------------------------------


def test_parse_constraint_forms():
    from pangeo_forge_recipes_spark.dap2io import parse_constraint

    assert parse_constraint("t") == ("t", None)
    assert parse_constraint("t[0:1:3]") == ("t", [(0, 1, 3)])
    assert parse_constraint("t[2:5]") == ("t", [(2, 1, 5)])
    assert parse_constraint("t[4]") == ("t", [(4, 1, 4)])
    assert parse_constraint("t[0:2:8][1:3]") == ("t", [(0, 2, 8), (1, 1, 3)])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_constraint("t[0:1:2:3]")


def test_dap2_hyperslab_subset_roundtrip():
    import numpy as np

    from pangeo_forge_recipes_spark.dap2io import read_dap2, serve_ndsets
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable

    nt, ny = 8, 5
    data = np.arange(nt * ny, dtype="float64").reshape(nt, ny)
    ds = NDDataset(
        {"t": Variable(("time", "y"), data)},
        {"time": Variable(("time",), np.arange(nt, dtype="int64")),
         "y": Variable(("y",), np.arange(ny, dtype="int64"))},
        {}, {"time": nt, "y": ny},
    )
    with serve_ndsets({"d": ds}) as srv:
        url = srv.url_for("d")
        # explicit hyperslab (stop inclusive)
        sub = read_dap2(url, projection=["t[2:1:5][1:1:3]"])
        np.testing.assert_array_equal(sub.data_vars["t"].data, data[2:6, 1:4])
        # grid maps slice with the array
        np.testing.assert_array_equal(sub.coords["time"].data, np.arange(2, 6))
        np.testing.assert_array_equal(sub.coords["y"].data, np.arange(1, 4))
        # strided
        s2 = read_dap2(url, projection=["t[0:2:6][0:1:4]"])
        np.testing.assert_array_equal(s2.data_vars["t"].data, data[0:7:2, :])
        # isel builds the same constraint from dim slices
        s3 = read_dap2(url, isel={"time": slice(2, 6), "y": slice(1, 4)})
        np.testing.assert_array_equal(s3.data_vars["t"].data, data[2:6, 1:4])
        np.testing.assert_array_equal(s3.coords["time"].data, np.arange(2, 6))

def test_dap2_projection_slabs_survive_isel():
    """Caller-embedded hyperslabs must not be dropped when isel is also
    given: unrelated-variable slabs pass through verbatim; a double
    constraint on the same dimension raises instead of silently losing
    the projection subset."""
    import numpy as np
    import pytest as _pytest

    from pangeo_forge_recipes_spark.dap2io import read_dap2, serve_ndsets
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable

    nt, ny, nx = 8, 5, 4
    t = np.arange(nt * ny, dtype="float64").reshape(nt, ny)
    u = np.arange(nx, dtype="float64") * 10
    ds = NDDataset(
        {"t": Variable(("time", "y"), t), "u": Variable(("x",), u)},
        {"time": Variable(("time",), np.arange(nt, dtype="int64")),
         "y": Variable(("y",), np.arange(ny, dtype="int64")),
         "x": Variable(("x",), np.arange(nx, dtype="int64"))},
        {}, {"time": nt, "y": ny, "x": nx},
    )
    with serve_ndsets({"d": ds}) as srv:
        url = srv.url_for("d")
        # t keeps its explicit slab; isel constrains only u's dim
        got = read_dap2(
            url, projection=["t[0:1:3][0:1:4]", "u"], isel={"x": slice(1, 3)}
        )
        np.testing.assert_array_equal(got.data_vars["t"].data, t[0:4, :])
        np.testing.assert_array_equal(got.data_vars["u"].data, u[1:3])
        # double constraint on the same dim: explicit error, not silent loss
        with _pytest.raises(ValueError, match="isel also constrains"):
            read_dap2(url, projection=["t[0:1:3][0:1:4]"],
                      isel={"time": slice(0, 2)})
