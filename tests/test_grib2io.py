"""GRIB2 container: pure-Python write/scan/schema/read with message-filter
pushdown, plus the Zarr and kerchunk pipelines running end-to-end from
grib sources (reference parity: ``openers.py:40-47`` grib engine row,
kerchunk ``scan_grib`` at ``openers.py:191-199``, and the GRIB
message-filter reader-pushdown row of SURVEY §2)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pangeo_forge_recipes_spark import (
    pattern_from_file_sequence,
    store_to_zarr,
    write_combined_reference,
)
from pangeo_forge_recipes_spark.grib2io import (
    grib2_schema,
    read_grib2,
    scan_grib2,
    scan_grib2_messages,
    write_grib2,
)
from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
from pangeo_forge_recipes_spark.ndset import NDDataset, Variable, assert_equal
from pangeo_forge_recipes_spark.openers import open_with_ndset, read_schema
from pangeo_forge_recipes_spark.patterns import FileType


def make_grib_ds(nt: int = 4, start: str = "2024-03-01T00") -> NDDataset:
    """A grib-flavored dataset: regular lat/lon grid, values quantized to
    a binary grid so simple packing round-trips exactly."""
    rng = np.random.default_rng(12)
    nj, ni = 6, 9
    time = np.datetime64(start, "ns") + np.arange(nt) * np.timedelta64(6, "h")
    lat = np.linspace(60.0, 30.0, nj)  # north → south, GRIB convention
    lon = np.linspace(0.0, 40.0, ni)
    t = np.round(rng.uniform(250, 310, (nt, nj, ni)) * 128) / 128
    u = np.round(rng.standard_normal((nt, nj, ni)) * 64) / 64 * 8
    return NDDataset(
        {
            "t": Variable(("time", "latitude", "longitude"), t),
            "u": Variable(("time", "latitude", "longitude"), u),
        },
        {
            "time": Variable(("time",), time),
            "latitude": Variable(("latitude",), lat, {"units": "degrees_north"}),
            "longitude": Variable(("longitude",), lon, {"units": "degrees_east"}),
        },
        {},
        {"time": nt, "latitude": nj, "longitude": ni},
    )


def _strip_grib_attrs(ds: NDDataset) -> NDDataset:
    out = ds.isel()
    for name, var in out.data_vars.items():
        out.data_vars[name] = Variable(var.dims, var.data, {}, dict(var.encoding))
    for name, var in out.coords.items():
        out.coords[name] = Variable(var.dims, var.data, {}, dict(var.encoding))
    return out


def test_write_read_roundtrip(tmp_path):
    ds = make_grib_ds()
    p = str(tmp_path / "t.grib2")
    write_grib2(p, ds, levels={"u": ("heightAboveGround", 10)})
    assert len(scan_grib2_messages(p)) == 8  # 2 vars × 4 times
    rt = read_grib2(p)
    for v in ("t", "u"):
        np.testing.assert_array_equal(rt.data_vars[v].data, ds.data_vars[v].data)
    np.testing.assert_array_equal(rt["time"].data, ds["time"].data)
    np.testing.assert_allclose(rt["latitude"].data, ds["latitude"].data)
    np.testing.assert_allclose(rt["longitude"].data, ds["longitude"].data)
    assert rt.data_vars["u"].attrs["typeOfLevel"] == "heightAboveGround"
    assert rt.data_vars["u"].attrs["level"] == 10.0


def test_message_filter_pushdown(tmp_path):
    ds = make_grib_ds()
    p = str(tmp_path / "t.grib2")
    write_grib2(p, ds, levels={"u": ("heightAboveGround", 10)})
    flt = read_grib2(p, filter_by_keys={"typeOfLevel": "surface"})
    assert set(flt.data_vars) == {"t"}
    flt2 = read_grib2(p, filter_by_keys={"shortName": "u"})
    assert set(flt2.data_vars) == {"u"}
    with pytest.raises(ValueError, match="unsupported filter key"):
        read_grib2(p, filter_by_keys={"bogus": 1})
    with pytest.raises(ValueError, match="no GRIB2 messages match"):
        read_grib2(p, filter_by_keys={"shortName": "prmsl"})


def test_header_only_schema(tmp_path):
    ds = make_grib_ds(nt=3)
    p = str(tmp_path / "t.grib2")
    write_grib2(p, ds)
    schema = grib2_schema(p)
    assert schema["dims"] == {"time": 3, "latitude": 6, "longitude": 9}
    assert set(schema["data_vars"]) == {"t", "u"}
    assert schema["data_vars"]["t"]["dtype"] == "float64"
    assert schema["coords"]["time"]["dtype"] == "datetime64[ns]"
    # filter applies to the schema as well (pushdown must be consistent
    # between the schema pass and the open pass)
    only_t = grib2_schema(p, filter_by_keys={"shortName": "t"})
    assert set(only_t["data_vars"]) == {"t"}


def test_scan_references_equal_direct_read(tmp_path):
    ds = make_grib_ds()
    p = str(tmp_path / "t.grib2")
    write_grib2(p, ds)
    refs = scan_grib2(p)
    # data chunks are whole-message byte ranges, not inlined
    chunk_refs = [v for k, v in refs.items() if "/c/" in k and not k.startswith(("time", "lat", "lon"))]
    assert any(isinstance(v, list) for v in chunk_refs)
    via = open_reference_dataset(refs)
    assert_equal(_strip_grib_attrs(via), _strip_grib_attrs(read_grib2(p)), check_attrs=False)


def test_openers_route_grib(tmp_path):
    ds = make_grib_ds(nt=2)
    p = str(tmp_path / "t.grib2")
    write_grib2(p, ds, levels={"u": ("heightAboveGround", 10)})
    opened = open_with_ndset(f"file://{p}", FileType.grib)
    assert set(opened.data_vars) == {"t", "u"}
    # cfgrib-style backend_kwargs filter
    only_u = open_with_ndset(
        p, FileType.grib,
        xarray_open_kwargs={"backend_kwargs": {"filter_by_keys": {"shortName": "u"}}},
    )
    assert set(only_u.data_vars) == {"u"}
    assert read_schema(p, FileType.grib)["dims"]["time"] == 2
    assert set(
        read_schema(
            p, FileType.grib, xarray_open_kwargs={"filter_by_keys": {"shortName": "t"}}
        )["data_vars"]
    ) == {"t"}


def test_unrepresentable_packing_raises(tmp_path):
    nj, ni = 3, 4
    ds = NDDataset(
        {"t": Variable(("time", "latitude", "longitude"), np.full((1, nj, ni), 0.1) * np.arange(ni))},
        {
            "time": Variable(("time",), np.array(["2024-01-01"], dtype="datetime64[ns]")),
            "latitude": Variable(("latitude",), np.linspace(10, 0, nj)),
            "longitude": Variable(("longitude",), np.linspace(0, 3, ni)),
        },
        {},
        {"time": 1, "latitude": nj, "longitude": ni},
    )
    with pytest.raises(ValueError, match="not .*representable"):
        write_grib2(str(tmp_path / "t.grib2"), ds)


def _write_split(tmp_path, ds, nt_per_file):
    paths = []
    nt = ds.sizes["time"]
    for i, start in enumerate(range(0, nt, nt_per_file)):
        p = str(tmp_path / f"f{i}.grib2")
        write_grib2(p, ds.isel(time=slice(start, start + nt_per_file)))
        paths.append(p)
    return paths


def test_store_to_zarr_from_grib(spark, tmp_path):
    ds = make_grib_ds(nt=6)
    paths = _write_split(tmp_path, ds, 2)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="grib"
    )
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "out.zarr", target_chunks={"time": 3}
    )
    assert_equal(
        _strip_grib_attrs(result.open()), _strip_grib_attrs(ds), check_attrs=False
    )


def test_store_to_zarr_grib_filter_pushdown(spark, tmp_path):
    """filter_by_keys flows through the composite: schema pass and open
    pass both see only the matching messages."""
    ds = make_grib_ds(nt=4)
    paths = _write_split(tmp_path, ds, 2)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="grib"
    )
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "flt.zarr", target_chunks={"time": 2},
        xarray_open_kwargs={"filter_by_keys": {"shortName": "t"}},
    )
    out = result.open()
    assert set(out.data_vars) == {"t"}
    np.testing.assert_array_equal(out.data_vars["t"].data, ds.data_vars["t"].data)


def test_kerchunk_pipeline_from_grib(spark, tmp_path):
    ds = make_grib_ds(nt=6)
    paths = _write_split(tmp_path, ds, 2)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="grib"
    )
    ref_path = write_combined_reference(
        spark, pattern, str(tmp_path), "ref", max_refs_per_merge=2
    )
    assert os.path.exists(ref_path)
    combined = open_reference_dataset(ref_path)
    assert_equal(
        _strip_grib_attrs(combined), _strip_grib_attrs(ds), check_attrs=False
    )


@pytest.mark.parametrize("packing", ["complex", "complex-diff1", "complex-diff2"])
def test_complex_packing_roundtrip(tmp_path, packing):
    """Templates 5.2/5.3: complex packing (group splitting, spatial
    differencing) round-trips bit-exactly through write → read."""
    ds = make_grib_ds(nt=3)
    path = str(tmp_path / "cplx.grib2")
    write_grib2(path, ds, packing=packing)
    rt = read_grib2(path)
    assert_equal(_strip_grib_attrs(rt), ds, check_attrs=False)
    # the file really is complex-packed, not silently simple
    msgs = scan_grib2_messages(path)
    want_tmpl = 2 if packing == "complex" else 3
    assert all(m["drs_template"] == want_tmpl for m in msgs)
    if want_tmpl == 3:
        order = int(packing[-1])
        assert all(m["spatial_order"] == order for m in msgs)


def test_ieee_packing_roundtrip(tmp_path):
    """Template 5.4/7.4: raw IEEE floats — exact for any float32 field,
    including ones no 2^E grid can represent."""
    ds = make_grib_ds(nt=2)
    # make the field non-quantized: raw float64 noise sits on no 2^E grid,
    # so simple packing would raise on it
    rng = np.random.default_rng(99)
    ds.data_vars["t"].data[:] = rng.uniform(250, 310, ds.data_vars["t"].data.shape)
    path = str(tmp_path / "ieee.grib2")
    write_grib2(path, ds, packing="ieee")
    rt = read_grib2(path)
    for v in ("t", "u"):
        np.testing.assert_array_equal(
            rt.data_vars[v].data,
            ds.data_vars[v].data.astype("float32").astype("float64"),
        )
    msgs = scan_grib2_messages(path)
    assert all(m["drs_template"] == 4 for m in msgs)
    # simple packing really would have rejected this field
    with pytest.raises(ValueError, match="2\\^E"):
        write_grib2(str(tmp_path / "no.grib2"), ds, packing="simple")


@pytest.mark.parametrize("scale", [1.0, 300.0])
def test_png_packing_roundtrip(tmp_path, scale):
    """Template 5.41/7.41: scaled ints ride a PNG code stream (8-bit gray
    for small ranges, 24-bit RGB for wide ones)."""
    ds = make_grib_ds(nt=2)
    for v in ("t", "u"):
        ds.data_vars[v].data[:] = (
            np.round(ds.data_vars[v].data * 128) / 128 * scale
        )
    path = str(tmp_path / "png.grib2")
    write_grib2(path, ds, packing="png")
    rt = read_grib2(path)
    for v in ("t", "u"):
        np.testing.assert_array_equal(rt.data_vars[v].data, ds.data_vars[v].data)
    msgs = scan_grib2_messages(path)
    assert all(m["drs_template"] == 41 for m in msgs)
    # payload is a genuine PNG stream
    with open(path, "rb") as f:
        raw = f.read()
    assert b"\x89PNG\r\n\x1a\n" in raw


def test_png_packing_with_bitmap_and_kerchunk(tmp_path):
    """PNG packing composes with section-6 bitmaps (NaN points) and the
    grib2-msg kerchunk codec."""
    ds = make_grib_ds(nt=2)
    ds.data_vars["t"].data[:, 2, 3] = np.nan
    path = str(tmp_path / "pb.grib2")
    write_grib2(path, ds, packing="png")
    rt = read_grib2(path)
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)
    refs = scan_grib2(path, filter_by_keys={"shortName": "t"})
    rt2 = open_reference_dataset(refs)
    np.testing.assert_array_equal(
        np.asarray(rt2.data_vars["t"].data), ds.data_vars["t"].data
    )


def test_complex_packing_smooth_field_compresses(tmp_path):
    """Spatial differencing exists because smooth fields have small
    differences: a ramp field should pack into far fewer bytes under
    5.3 than 5.0."""
    nj, ni, nt = 20, 30, 2
    time = np.datetime64("2024-03-01T00", "ns") + np.arange(nt) * np.timedelta64(6, "h")
    ramp = (np.arange(nj)[:, None] * 8.0 + np.arange(ni)[None, :] / 2.0)[None]
    ds = NDDataset(
        {"t": Variable(("time", "latitude", "longitude"), np.repeat(ramp, nt, 0) + 250.0)},
        {
            "time": Variable(("time",), time),
            "latitude": Variable(("latitude",), np.linspace(60, 30, nj)),
            "longitude": Variable(("longitude",), np.linspace(0, 40, ni)),
        },
        {},
        {"time": nt, "latitude": nj, "longitude": ni},
    )
    p_simple = str(tmp_path / "s.grib2")
    p_diff = str(tmp_path / "d.grib2")
    write_grib2(p_simple, ds, packing="simple")
    write_grib2(p_diff, ds, packing="complex-diff2")
    assert_equal(_strip_grib_attrs(read_grib2(p_diff)), ds, check_attrs=False)
    assert os.path.getsize(p_diff) < os.path.getsize(p_simple)


def test_complex_packing_filter_pushdown_and_kerchunk(tmp_path):
    """filter_by_keys still skips non-matching complex-packed messages
    without unpacking, and scan_grib2 refs decode via the grib2-msg
    codec."""
    ds = make_grib_ds(nt=2)
    path = str(tmp_path / "cf.grib2")
    write_grib2(path, ds, packing="complex-diff2")
    only_t = read_grib2(path, filter_by_keys={"shortName": "t"})
    assert set(only_t.data_vars) == {"t"}
    np.testing.assert_array_equal(only_t.data_vars["t"].data, ds.data_vars["t"].data)
    refs = scan_grib2(path, filter_by_keys={"shortName": "u"})
    rt = open_reference_dataset(refs)
    np.testing.assert_array_equal(rt.data_vars["u"].data, ds.data_vars["u"].data)


def _hrrr_like_proj():
    return {"latin1": 38.5, "latin2": 38.5, "lov": 262.5, "lad": 38.5}


def make_lambert_ds(nt: int = 3, nj: int = 7, ni: int = 9) -> NDDataset:
    rng = np.random.default_rng(21)
    time = np.datetime64("2024-03-01T00", "ns") + np.arange(nt) * np.timedelta64(1, "h")
    # 3 km HRRR-like spacing, grid offset from projection origin
    x = -120_000.0 + np.arange(ni) * 3000.0
    y = -90_000.0 + np.arange(nj) * 3000.0
    t = np.round(rng.uniform(250, 310, (nt, nj, ni)) * 128) / 128
    return NDDataset(
        {"t": Variable(("time", "y", "x"), t)},
        {
            "time": Variable(("time",), time),
            "y": Variable(("y",), y, {"units": "m"}),
            "x": Variable(("x",), x, {"units": "m"}),
        },
        {},
        {"time": nt, "y": nj, "x": ni},
    )


def test_lambert_projection_math_self_consistent():
    from pangeo_forge_recipes_spark.grib2io import (
        _lambert_forward,
        _lambert_inverse,
    )

    pmsg = {"earth_radius": 6371229.0, **_hrrr_like_proj()}
    # the projection origin (lad, lov) maps to (0, 0) by construction
    x0, y0 = _lambert_forward(pmsg, 38.5, 262.5)
    assert abs(x0) < 1e-6 and abs(y0) < 1e-6
    # forward/inverse are inverses over a wide swath
    lat = np.linspace(25, 50, 7)[:, None] + np.zeros((1, 9))
    lon = np.linspace(235, 285, 9)[None, :] + np.zeros((7, 1))
    x, y = _lambert_forward(pmsg, lat, lon)
    lat2, lon2 = _lambert_inverse(pmsg, x, y)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    # secant cone (latin1 != latin2) too
    pmsg2 = {"earth_radius": 6371229.0, "latin1": 30.0, "latin2": 60.0,
             "lov": 255.0, "lad": 45.0}
    x, y = _lambert_forward(pmsg2, lat, lon)
    lat2, lon2 = _lambert_inverse(pmsg2, x, y)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)


@pytest.mark.parametrize("packing", ["simple", "complex-diff2"])
def test_lambert_write_read_roundtrip(tmp_path, packing):
    ds = make_lambert_ds()
    path = str(tmp_path / "lcc.grib2")
    write_grib2(path, ds, packing=packing, projection=_hrrr_like_proj())
    rt = read_grib2(path)
    assert tuple(rt.data_vars["t"].dims) == ("time", "y", "x")
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)
    # x/y survive the microdegree quantization of La1/Lo1 to ~meter level
    np.testing.assert_allclose(rt.coords["x"].data, ds.coords["x"].data, atol=1.0)
    np.testing.assert_allclose(rt.coords["y"].data, ds.coords["y"].data, atol=1.0)
    # 2-D lat/lon are the inverse projection of the grid
    from pangeo_forge_recipes_spark.grib2io import _lambert_forward

    pmsg = {"earth_radius": 6371229.0, **_hrrr_like_proj()}
    lat, lon = rt.coords["latitude"].data, rt.coords["longitude"].data
    assert lat.shape == (7, 9) and lon.shape == (7, 9)
    px, py = _lambert_forward(pmsg, lat, lon)
    np.testing.assert_allclose(px, np.broadcast_to(rt.coords["x"].data, (7, 9)), atol=1e-3)
    np.testing.assert_allclose(py, np.broadcast_to(rt.coords["y"].data[:, None], (7, 9)), atol=1e-3)
    msgs = scan_grib2_messages(path)
    assert all(m["grid_template"] == 30 for m in msgs)


def test_lambert_kerchunk_scan(tmp_path):
    ds = make_lambert_ds(nt=2)
    path = str(tmp_path / "lcc2.grib2")
    write_grib2(path, ds, projection=_hrrr_like_proj())
    rt = open_reference_dataset(scan_grib2(path))
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)
    assert rt.coords["latitude"].data.shape == (7, 9)
    direct = read_grib2(path)
    np.testing.assert_allclose(
        rt.coords["latitude"].data, direct.coords["latitude"].data, atol=1e-12
    )


@pytest.mark.parametrize("packing", ["simple", "complex-diff2"])
def test_bitmap_nan_roundtrip(tmp_path, packing):
    """Fields with missing points (NaN) write a section-6 bitmap and
    decode back with NaN exactly at the missing positions."""
    ds = make_grib_ds(nt=2)
    t = ds.data_vars["t"].data.copy()
    rng = np.random.default_rng(17)
    mask = rng.random(t.shape) < 0.3
    t[mask] = np.nan
    ds.data_vars["t"] = Variable(ds.data_vars["t"].dims, t)
    path = str(tmp_path / "bm.grib2")
    write_grib2(path, ds, packing=packing)
    rt = read_grib2(path)
    np.testing.assert_array_equal(
        np.isnan(rt.data_vars["t"].data), np.isnan(t)
    )
    np.testing.assert_array_equal(
        rt.data_vars["t"].data[~np.isnan(t)], t[~np.isnan(t)]
    )
    # u (no NaNs) still round-trips without a bitmap
    np.testing.assert_array_equal(rt.data_vars["u"].data, ds.data_vars["u"].data)
    msgs = scan_grib2_messages(path)
    assert any("bitmap" in m for m in msgs)
    # kerchunk refs decode the bitmapped message too
    rk = open_reference_dataset(scan_grib2(path))
    np.testing.assert_array_equal(
        np.isnan(rk.data_vars["t"].data), np.isnan(t)
    )


def test_statistical_template_48_roundtrip(tmp_path):
    """Product template 4.8 (accumulated/averaged fields — the encoding
    of precipitation accumulations): valid time is the interval END,
    stepType rides the variable attrs, instantaneous vars coexist."""
    ds = make_grib_ds(nt=3)
    path = str(tmp_path / "acc.grib2")
    write_grib2(path, ds, statistics={"t": ("accum", 6.0)})
    msgs = scan_grib2_messages(path)
    t_msgs = [m for m in msgs if m["shortName"] == "t"]
    u_msgs = [m for m in msgs if m["shortName"] == "u"]
    assert all(m["stepType"] == "accum" for m in t_msgs)
    assert all("stepType" not in m for m in u_msgs)
    # reference time moved back by the interval; valid time unchanged
    assert all(
        m["valid_time"] - m["ref_time"] == np.timedelta64(6, "h") for m in t_msgs
    )
    rt = read_grib2(path)
    # both vars land on the same time axis and round-trip exactly
    np.testing.assert_array_equal(
        rt.coords["time"].data, ds.coords["time"].data
    )
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)
    np.testing.assert_array_equal(rt.data_vars["u"].data, ds.data_vars["u"].data)
    assert rt.data_vars["t"].attrs["stepType"] == "accum"
    assert "stepType" not in rt.data_vars["u"].attrs
    # filter pushdown + kerchunk still work on 4.8 messages
    only_t = read_grib2(path, filter_by_keys={"shortName": "t"})
    assert set(only_t.data_vars) == {"t"}
    rk = open_reference_dataset(scan_grib2(path))
    np.testing.assert_array_equal(rk.data_vars["t"].data, ds.data_vars["t"].data)


def test_multi_level_stacking(tmp_path):
    """Messages for one shortName on several isobaric levels stack into a
    single 4-D variable with an isobaricInhPa dim (descending pressure,
    cfgrib convention) in read, schema, and kerchunk scan."""
    base = make_grib_ds(nt=2)
    t = base.data_vars["t"]
    ds = NDDataset(
        {"t500": t, "t850": Variable(t.dims, t.data + 8.0), "u": base.data_vars["u"]},
        dict(base.coords), {}, dict(base.sizes),
    )
    path = str(tmp_path / "lev.grib2")
    write_grib2(
        path, ds,
        param_map={"t500": (0, 0, 0), "t850": (0, 0, 0)},
        levels={"t500": ("isobaricInhPa", 500), "t850": ("isobaricInhPa", 850)},
    )
    rt = read_grib2(path)
    assert set(rt.data_vars) == {"t", "u"}
    tv = rt.data_vars["t"]
    assert tuple(tv.dims) == ("time", "isobaricInhPa", "latitude", "longitude")
    np.testing.assert_array_equal(
        rt.coords["isobaricInhPa"].data, [850.0, 500.0]
    )
    np.testing.assert_array_equal(tv.data[:, 1], t.data)        # 500 hPa
    np.testing.assert_array_equal(tv.data[:, 0], t.data + 8.0)  # 850 hPa
    assert "level" not in tv.attrs
    # u stays 3-D
    assert tuple(rt.data_vars["u"].dims) == ("time", "latitude", "longitude")
    # schema agrees
    sch = grib2_schema(path)
    assert sch["data_vars"]["t"]["dims"] == ["time", "isobaricInhPa", "latitude", "longitude"]
    assert sch["dims"]["isobaricInhPa"] == 2
    # kerchunk scan round-trips the stack
    rk = open_reference_dataset(scan_grib2(path))
    np.testing.assert_array_equal(rk.data_vars["t"].data, tv.data)
    np.testing.assert_array_equal(rk.coords["isobaricInhPa"].data, [850.0, 500.0])
    # level filter selects a single level → back to 3-D
    one = read_grib2(path, filter_by_keys={"level": 500.0})
    assert tuple(one.data_vars["t"].dims) == ("time", "latitude", "longitude")


# ---------------------------------------------------------------------------
# grid templates 3.10 / 3.20 / 3.40
# ---------------------------------------------------------------------------


def test_gaussian_latitudes_known_values():
    from pangeo_forge_recipes_spark.grib2io import gaussian_latitudes

    # N=2 global grid: published F2 Gaussian latitudes (arcsin of the
    # roots of P4: +-0.8611363, +-0.3399810)
    lats = gaussian_latitudes(2)
    np.testing.assert_allclose(
        lats, [59.44440, 19.87572, -19.87572, -59.44440], atol=2e-5
    )
    # descending north->south, symmetric about the equator
    lats8 = gaussian_latitudes(8)
    assert (np.diff(lats8) < 0).all()
    np.testing.assert_allclose(lats8, -lats8[::-1], atol=1e-12)


def make_gaussian_ds(nt: int = 2, gn: int = 4, ni: int = 12) -> NDDataset:
    from pangeo_forge_recipes_spark.grib2io import gaussian_latitudes

    rng = np.random.default_rng(5)
    time = np.datetime64("2024-04-01T00", "ns") + np.arange(nt) * np.timedelta64(6, "h")
    lats = gaussian_latitudes(gn)
    lons = np.arange(ni) * (360.0 / ni)
    t = np.round(rng.uniform(200, 320, (nt, 2 * gn, ni)) * 64) / 64
    return NDDataset(
        {"t": Variable(("time", "latitude", "longitude"), t)},
        {
            "time": Variable(("time",), time),
            "latitude": Variable(("latitude",), lats),
            "longitude": Variable(("longitude",), lons),
        },
        {},
        {"time": nt, "latitude": 2 * gn, "longitude": ni},
    )


@pytest.mark.parametrize("packing", ["simple", "complex"])
def test_gaussian_write_read_roundtrip(tmp_path, packing):
    ds = make_gaussian_ds()
    path = str(tmp_path / "gau.grib2")
    write_grib2(path, ds, packing=packing, grid="gaussian")
    msgs = scan_grib2_messages(path)
    assert all(m["grid_template"] == 40 for m in msgs)
    assert all(m["gauss_n"] == 4 for m in msgs)
    rt = read_grib2(path)
    assert tuple(rt.data_vars["t"].dims) == ("time", "latitude", "longitude")
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)
    # latitudes are recomputed from N, not read from La1/La2 microdegrees:
    # they match the exact quadrature values
    np.testing.assert_allclose(
        rt.coords["latitude"].data, ds.coords["latitude"].data, atol=1e-12
    )
    # kerchunk scan agrees
    rk = open_reference_dataset(scan_grib2(path))
    np.testing.assert_array_equal(rk.data_vars["t"].data, ds.data_vars["t"].data)
    np.testing.assert_allclose(
        rk.coords["latitude"].data, ds.coords["latitude"].data, atol=1e-12
    )


def test_pstereo_projection_math_self_consistent():
    from pangeo_forge_recipes_spark.grib2io import (
        _pstereo_forward,
        _pstereo_inverse,
    )

    for south in (False, True):
        pmsg = {
            "earth_radius": 6371229.0,
            "lad": -60.0 if south else 60.0,
            "lov": 255.0 if not south else 100.0,
            "south_pole_proj": south,
        }
        # the pole maps to the origin
        x0, y0 = _pstereo_forward(pmsg, -90.0 if south else 90.0, 0.0)
        assert abs(x0) < 1e-6 and abs(y0) < 1e-6
        sign = -1 if south else 1
        lat = sign * (np.linspace(30, 89, 8)[:, None] + np.zeros((1, 9)))
        lon = np.linspace(0, 350, 9)[None, :] + np.zeros((8, 1))
        x, y = _pstereo_forward(pmsg, lat, lon)
        lat2, lon2 = _pstereo_inverse(pmsg, x, y)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(lon2 % 360, lon % 360, atol=1e-9)
    # known value: north stereo true at 60N, LoV=0: the (60N, 0E) point
    # sits at distance R/2 from the pole along -y
    pmsg = {"earth_radius": 6371229.0, "lad": 60.0, "lov": 0.0,
            "south_pole_proj": False}
    x, y = _pstereo_forward(pmsg, 60.0, 0.0)
    np.testing.assert_allclose(x, 0.0, atol=1e-6)
    np.testing.assert_allclose(y, -6371229.0 / 2, rtol=1e-12)


@pytest.mark.parametrize("south", [False, True])
def test_pstereo_write_read_roundtrip(tmp_path, south):
    rng = np.random.default_rng(9)
    nt, nj, ni = 2, 6, 8
    time = np.datetime64("2024-01-10T00", "ns") + np.arange(nt) * np.timedelta64(1, "h")
    x = -300_000.0 + np.arange(ni) * 25_000.0
    y = -200_000.0 + np.arange(nj) * 25_000.0
    t = np.round(rng.uniform(230, 280, (nt, nj, ni)) * 128) / 128
    ds = NDDataset(
        {"t": Variable(("time", "y", "x"), t)},
        {
            "time": Variable(("time",), time),
            "y": Variable(("y",), y, {"units": "m"}),
            "x": Variable(("x",), x, {"units": "m"}),
        },
        {},
        {"time": nt, "y": nj, "x": ni},
    )
    proj = {"kind": "polar_stereo", "lad": -60.0 if south else 60.0,
            "lov": 210.0, "south": south}
    path = str(tmp_path / "ps.grib2")
    write_grib2(path, ds, projection=proj)
    msgs = scan_grib2_messages(path)
    assert all(m["grid_template"] == 20 for m in msgs)
    assert all(m["south_pole_proj"] == south for m in msgs)
    rt = read_grib2(path)
    assert tuple(rt.data_vars["t"].dims) == ("time", "y", "x")
    np.testing.assert_array_equal(rt.data_vars["t"].data, t)
    np.testing.assert_allclose(rt.coords["x"].data, x, atol=1.0)
    np.testing.assert_allclose(rt.coords["y"].data, y, atol=1.0)
    # 2-D lat/lon invert back onto the x/y grid
    from pangeo_forge_recipes_spark.grib2io import _pstereo_forward

    pmsg = {"earth_radius": 6371229.0, "lad": proj["lad"], "lov": proj["lov"],
            "south_pole_proj": south}
    px, py = _pstereo_forward(
        pmsg, rt.coords["latitude"].data, rt.coords["longitude"].data
    )
    np.testing.assert_allclose(px, np.broadcast_to(rt.coords["x"].data, (nj, ni)), atol=1e-3)
    np.testing.assert_allclose(py, np.broadcast_to(rt.coords["y"].data[:, None], (nj, ni)), atol=1e-3)


def test_mercator_write_read_roundtrip(tmp_path):
    from pangeo_forge_recipes_spark.grib2io import _mercator_lat, _mercator_y

    rng = np.random.default_rng(13)
    nt, nj, ni = 2, 7, 9
    pmsg = {"earth_radius": 6371229.0, "lad": 20.0}
    # build Mercator-spaced latitudes: uniform projected y from 5S
    y1 = float(_mercator_y(pmsg, -5.0))
    lats = _mercator_lat(pmsg, y1 + np.arange(nj) * 150_000.0)
    lons = 10.0 + np.arange(ni) * 2.0
    time = np.datetime64("2024-06-01T00", "ns") + np.arange(nt) * np.timedelta64(1, "h")
    t = np.round(rng.uniform(290, 305, (nt, nj, ni)) * 128) / 128
    ds = NDDataset(
        {"t": Variable(("time", "latitude", "longitude"), t)},
        {
            "time": Variable(("time",), time),
            "latitude": Variable(("latitude",), lats),
            "longitude": Variable(("longitude",), lons),
        },
        {},
        {"time": nt, "latitude": nj, "longitude": ni},
    )
    path = str(tmp_path / "merc.grib2")
    write_grib2(path, ds, projection={"kind": "mercator", "lad": 20.0})
    msgs = scan_grib2_messages(path)
    assert all(m["grid_template"] == 10 for m in msgs)
    rt = read_grib2(path)
    assert tuple(rt.data_vars["t"].dims) == ("time", "latitude", "longitude")
    np.testing.assert_array_equal(rt.data_vars["t"].data, t)
    # latitudes survive the La1-microdegree + Dj-mm quantization
    np.testing.assert_allclose(rt.coords["latitude"].data, lats, atol=1e-4)
    np.testing.assert_allclose(rt.coords["longitude"].data, lons, atol=1e-5)
    # non-Mercator latitudes are rejected with a clear message
    bad = NDDataset(
        ds.data_vars,
        {
            "time": ds.coords["time"],
            "latitude": Variable(("latitude",), np.linspace(-5, 10, nj)),
            "longitude": ds.coords["longitude"],
        },
        {},
        ds.dims,
    )
    with pytest.raises(ValueError, match="Mercator-spaced"):
        write_grib2(str(tmp_path / "bad.grib2"), bad,
                    projection={"kind": "mercator", "lad": 20.0})


# ---------------------------------------------------------------------------
# data representation template 5.40 (JPEG2000)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("scale", [1.0, 300.0])
def test_jpeg2000_packing_roundtrip(tmp_path, scale):
    """Template 5.40/7.40: scaled ints ride a lossless J2K code stream
    (the ECMWF/NCEP grid_jpeg encoding)."""
    ds = make_grib_ds(nt=2)
    for v in ("t", "u"):
        ds.data_vars[v].data[:] = (
            np.round(ds.data_vars[v].data * 128) / 128 * scale
        )
    path = str(tmp_path / "j2k.grib2")
    write_grib2(path, ds, packing="jpeg2000")
    rt = read_grib2(path)
    for v in ("t", "u"):
        np.testing.assert_array_equal(rt.data_vars[v].data, ds.data_vars[v].data)
    msgs = scan_grib2_messages(path)
    assert all(m["drs_template"] == 40 for m in msgs)
    assert all(m["j2k_lossless"] for m in msgs)
    assert all(m["j2k_target_ratio"] == 255 for m in msgs)  # missing
    # payload is a genuine raw J2K codestream (SOC + SIZ markers)
    with open(path, "rb") as f:
        raw = f.read()
    assert b"\xff\x4f\xff\x51" in raw


def test_jpeg2000_packing_with_bitmap_and_kerchunk(tmp_path):
    """J2K packing composes with section-6 bitmaps (NaN points) and the
    grib2-msg kerchunk codec."""
    ds = make_grib_ds(nt=2)
    ds.data_vars["t"].data[:, 2, 3] = np.nan
    path = str(tmp_path / "jb.grib2")
    write_grib2(path, ds, packing="jpeg2000")
    rt = read_grib2(path)
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)
    refs = scan_grib2(path, filter_by_keys={"shortName": "t"})
    rt2 = open_reference_dataset(refs)
    np.testing.assert_array_equal(
        np.asarray(rt2.data_vars["t"].data), ds.data_vars["t"].data
    )


def test_jpeg2000_smooth_field_compresses(tmp_path):
    """The wavelet coder should beat simple packing handily on a smooth
    NWP-style field."""
    nj, ni, nt = 40, 60, 1
    time = np.datetime64("2024-03-01T00", "ns") + np.arange(nt) * np.timedelta64(6, "h")
    yy, xx = np.mgrid[0:nj, 0:ni]
    smooth = (280 + 15 * np.sin(xx / 9.0) * np.cos(yy / 7.0))[None]
    smooth = np.round(smooth * 128) / 128
    ds = NDDataset(
        {"t": Variable(("time", "latitude", "longitude"), smooth)},
        {
            "time": Variable(("time",), time),
            "latitude": Variable(("latitude",), np.linspace(60, 20, nj)),
            "longitude": Variable(("longitude",), np.linspace(0, 59, ni)),
        },
        {},
        {"time": nt, "latitude": nj, "longitude": ni},
    )
    p_simple = str(tmp_path / "s.grib2")
    p_j2k = str(tmp_path / "j.grib2")
    write_grib2(p_simple, ds, packing="simple")
    write_grib2(p_j2k, ds, packing="jpeg2000")
    assert os.path.getsize(p_j2k) < os.path.getsize(p_simple)
    rt = read_grib2(p_j2k)
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)


# ---------------------------------------------------------------------------
# product template 4.1 (ensemble members -> "number" dimension)
# ---------------------------------------------------------------------------


def make_ensemble_ds(nt: int = 2, nm: int = 4, nj: int = 5, ni: int = 6) -> NDDataset:
    rng = np.random.default_rng(17)
    time = np.datetime64("2024-07-01T00", "ns") + np.arange(nt) * np.timedelta64(6, "h")
    t = np.round(rng.uniform(250, 310, (nt, nm, nj, ni)) * 128) / 128
    return NDDataset(
        {"t": Variable(("time", "number", "latitude", "longitude"), t)},
        {
            "time": Variable(("time",), time),
            "number": Variable(("number",), np.arange(1, nm + 1, dtype="int64")),
            "latitude": Variable(("latitude",), np.linspace(50, 30, nj)),
            "longitude": Variable(("longitude",), np.linspace(0, 10, ni)),
        },
        {},
        {"time": nt, "number": nm, "latitude": nj, "longitude": ni},
    )


@pytest.mark.parametrize("packing", ["simple", "complex"])
def test_ensemble_write_read_roundtrip(tmp_path, packing):
    ds = make_ensemble_ds()
    path = str(tmp_path / "ens.grib2")
    write_grib2(path, ds, packing=packing)
    msgs = scan_grib2_messages(path)
    assert len(msgs) == 2 * 4
    assert sorted({m["number"] for m in msgs}) == [1, 2, 3, 4]
    assert all(m["n_ens"] == 4 for m in msgs)
    rt = read_grib2(path)
    tv = rt.data_vars["t"]
    assert tuple(tv.dims) == ("time", "number", "latitude", "longitude")
    np.testing.assert_array_equal(tv.data, ds.data_vars["t"].data)
    np.testing.assert_array_equal(rt.coords["number"].data, [1, 2, 3, 4])
    assert rt.coords["number"].data.dtype == np.int64
    # member filter pushdown selects one member -> plain 3-D variable
    one = read_grib2(path, filter_by_keys={"number": 3})
    assert tuple(one.data_vars["t"].dims) == ("time", "latitude", "longitude")
    np.testing.assert_array_equal(
        one.data_vars["t"].data, ds.data_vars["t"].data[:, 2]
    )


def test_ensemble_schema_and_kerchunk(tmp_path):
    ds = make_ensemble_ds(nt=2, nm=3)
    path = str(tmp_path / "ens2.grib2")
    write_grib2(path, ds)
    sch = grib2_schema(path)
    assert sch["data_vars"]["t"]["dims"] == ["time", "number", "latitude", "longitude"]
    assert sch["dims"]["number"] == 3
    rk = open_reference_dataset(scan_grib2(path))
    np.testing.assert_array_equal(
        np.asarray(rk.data_vars["t"].data), ds.data_vars["t"].data
    )
    np.testing.assert_array_equal(np.asarray(rk.coords["number"].data), [1, 2, 3])


def test_ensemble_level_cross_product_stacks_5d(tmp_path):
    """member x level x time cross: dims (time, number, level, y, x) —
    the full GEFS pressure-level shape."""
    ds500 = make_ensemble_ds(nt=2, nm=2)
    ds850 = NDDataset(
        {"t": Variable(ds500.data_vars["t"].dims, ds500.data_vars["t"].data + 5.0)},
        ds500.coords, {}, ds500.dims,
    )
    p1 = str(tmp_path / "m500.grib2")
    p2 = str(tmp_path / "m850.grib2")
    write_grib2(p1, ds500, levels={"t": ("isobaricInhPa", 500)})
    write_grib2(p2, ds850, levels={"t": ("isobaricInhPa", 850)})
    both = str(tmp_path / "both.grib2")
    with open(both, "wb") as f:
        f.write(open(p1, "rb").read() + open(p2, "rb").read())
    rt = read_grib2(both)
    tv = rt.data_vars["t"]
    assert tuple(tv.dims) == (
        "time", "number", "isobaricInhPa", "latitude", "longitude"
    )
    # pressure levels descend (850 before 500)
    np.testing.assert_array_equal(rt.coords["isobaricInhPa"].data, [850.0, 500.0])
    np.testing.assert_array_equal(rt.coords["number"].data, [1, 2])
    np.testing.assert_array_equal(tv.data[:, :, 1], ds500.data_vars["t"].data)
    np.testing.assert_array_equal(tv.data[:, :, 0], ds850.data_vars["t"].data)
    # header-only schema agrees
    sch = grib2_schema(both)
    assert sch["data_vars"]["t"]["dims"] == [
        "time", "number", "isobaricInhPa", "latitude", "longitude"
    ]
    assert sch["coords"]["number"]["dtype"] == "int64"
    # kerchunk scan round-trips the 5-D cube
    rk = open_reference_dataset(scan_grib2(both))
    np.testing.assert_array_equal(np.asarray(rk.data_vars["t"].data), tv.data)
    np.testing.assert_array_equal(np.asarray(rk.coords["number"].data), [1, 2])
    # filtering to one level still gives the 4-D member stack
    one = read_grib2(both, filter_by_keys={"level": 500.0})
    assert tuple(one.data_vars["t"].dims) == ("time", "number", "latitude", "longitude")


def test_ensemble_statistical_template_411(tmp_path):
    """Template 4.11: ensemble member + statistical interval (ensemble
    precipitation accumulations, the GEFS precip shape)."""
    ds = make_ensemble_ds(nt=2, nm=3)
    path = str(tmp_path / "ens_acc.grib2")
    write_grib2(
        path, ds,
        param_map={"t": (0, 1, 8)},  # total precipitation
        statistics={"t": ("accum", 6.0)},
    )
    msgs = scan_grib2_messages(path)
    assert all(m["number"] in (1, 2, 3) for m in msgs)
    assert all(m["stepType"] == "accum" for m in msgs)
    rt = read_grib2(path)
    tv = rt.data_vars["tp"] if "tp" in rt.data_vars else rt.data_vars[list(rt.data_vars)[0]]
    assert tuple(tv.dims) == ("time", "number", "latitude", "longitude")
    np.testing.assert_array_equal(tv.data, ds.data_vars["t"].data)
    assert tv.attrs["stepType"] == "accum"
    np.testing.assert_array_equal(rt.coords["time"].data, ds.coords["time"].data)


def test_derived_ensemble_template_42(tmp_path):
    """Template 4.2: ensemble mean/spread as distinct variables next to
    the per-member field."""
    ds = make_ensemble_ds(nt=2, nm=3)
    members = ds.data_vars["t"].data
    mean = members.mean(axis=1)
    mean = np.round(mean * 128) / 128
    dds = NDDataset(
        {"t_stat": Variable(("time", "latitude", "longitude"), mean)},
        {k: v for k, v in ds.coords.items() if k != "number"},
        {},
        {k: v for k, v in ds.dims.items() if k != "number"},
    )
    p1 = str(tmp_path / "mem.grib2")
    p2 = str(tmp_path / "mean.grib2")
    write_grib2(p1, ds)
    write_grib2(p2, dds, param_map={"t_stat": (0, 0, 0)},
                derived={"t_stat": ("mean", 3)})
    both = str(tmp_path / "all.grib2")
    with open(both, "wb") as f:
        f.write(open(p1, "rb").read() + open(p2, "rb").read())
    msgs = scan_grib2_messages(both)
    assert sum(1 for m in msgs if m.get("derived_type") == "mean") == 2
    rt = read_grib2(both)
    assert set(rt.data_vars) == {"t", "t_mean"}
    assert tuple(rt.data_vars["t"].dims) == ("time", "number", "latitude", "longitude")
    assert tuple(rt.data_vars["t_mean"].dims) == ("time", "latitude", "longitude")
    np.testing.assert_array_equal(rt.data_vars["t_mean"].data, mean)
    np.testing.assert_array_equal(rt.data_vars["t"].data, members)


def test_probability_template_45(tmp_path):
    """Template 4.5: probability-of-exceedance fields become distinct
    threshold-suffixed variables (GEFS PQPF shape)."""
    ds = make_grib_ds(nt=2)
    prob = np.round(np.clip(ds.data_vars["t"].data / 400.0, 0, 1) * 128) / 128
    pds = NDDataset(
        {"p": Variable(("time", "latitude", "longitude"), prob)},
        ds.coords, {}, ds.dims,
    )
    path = str(tmp_path / "prob.grib2")
    write_grib2(
        path, pds,
        param_map={"p": (0, 1, 8)},
        probability={"p": (1, 25.0, None, 30)},  # P(x > 25mm), 30 members
    )
    msgs = scan_grib2_messages(path)
    assert all(m["probability_type"] == 1 for m in msgs)
    assert all(m["prob_lower"] == 25.0 for m in msgs)
    rt = read_grib2(path)
    (name,) = rt.data_vars
    assert name.endswith("_prob_gt25")
    np.testing.assert_array_equal(rt.data_vars[name].data, prob)
    # filter on the probability family via shortName still works
    sch = grib2_schema(path)
    assert list(sch["data_vars"]) == [name]


def test_jpeg2000_lossy_packing_roundtrip(tmp_path):
    """packing='jpeg2000-lossy': the 9/7 irreversible stream (compression
    type octet 1) reconstructs within one integer level — ±0.5 · 2^E ·
    10^-D in physical units."""
    ds = make_grib_ds(nt=2)
    path = str(tmp_path / "j2kl.grib2")
    write_grib2(path, ds, packing="jpeg2000-lossy")
    rt = read_grib2(path)
    msgs = scan_grib2_messages(path)
    assert all(m["drs_template"] == 40 for m in msgs)
    assert not any(m["j2k_lossless"] for m in msgs)
    # octet 23 must carry a REAL target ratio when octet 22 signals
    # lossy (255 = missing is only valid for lossless)
    assert all(1 <= m["j2k_target_ratio"] <= 254 for m in msgs)
    for v in ("t", "u"):
        a, b = rt.data_vars[v].data, ds.data_vars[v].data
        # per-message quantization bound: 1 integer level in the packed
        # domain -> R + x*2^E*10^-D physical spacing; allow 1.5 levels
        spread = np.abs(a - b)
        step = np.abs(np.diff(np.unique(np.round(b, 6)))).min() if b.size else 1.0
        assert np.isfinite(a).all()
        assert spread.max() <= max(3 * step, 1e-2 * max(np.abs(b).max(), 1.0))


def make_rotated_ds(nt: int = 2, nj: int = 7, ni: int = 9) -> NDDataset:
    rng = np.random.default_rng(31)
    time = np.datetime64("2024-03-01T00", "ns") + np.arange(nt) * np.timedelta64(1, "h")
    # COSMO-EU-like rotated grid, 0.5-degree spacing
    rlon = -5.0 + np.arange(ni) * 0.5
    rlat = -4.0 + np.arange(nj) * 0.5
    t = np.round(rng.uniform(250, 310, (nt, nj, ni)) * 128) / 128
    return NDDataset(
        {"t": Variable(("time", "rlat", "rlon"), t)},
        {
            "time": Variable(("time",), time),
            "rlat": Variable(("rlat",), rlat, {"units": "degrees"}),
            "rlon": Variable(("rlon",), rlon, {"units": "degrees"}),
        },
        {},
        {"time": nt, "rlat": nj, "rlon": ni},
    )


def test_rotated_latlon_unrotation_math():
    """Pin the 3.1 unrotation against the public COSMO-EU configuration
    (southern pole at (-40, 10), i.e. rotated north pole at (40, -170))
    and against an independent scalar rotation-matrix implementation."""
    from pangeo_forge_recipes_spark.grib2io import _rotated_grid

    msg = {"sp_lat": -40.0, "sp_lon": 10.0, "rot_angle": 0.0,
           "la1": 90.0, "la2": 90.0, "lo1": 0.0, "lo2": 0.0, "nj": 1, "ni": 1}
    _, _, lat, lon = _rotated_grid(msg)
    # the rotated north pole sits at the documented geographic position
    np.testing.assert_allclose(lat[0, 0], 40.0, atol=1e-9)
    np.testing.assert_allclose(lon[0, 0], -170.0, atol=1e-9)
    # the rotated origin maps onto the southern-pole meridian, 90 degrees
    # north of the southern pole: central Europe for the COSMO-EU pole
    msgc = dict(msg, la1=0.0, la2=0.0, lo1=0.0, lo2=0.0)
    _, _, latc, lonc = _rotated_grid(msgc)
    np.testing.assert_allclose(latc[0, 0], 50.0, atol=1e-9)
    np.testing.assert_allclose(lonc[0, 0], 10.0, atol=1e-9)
    # full grid against an independent scalar rotation-matrix
    # implementation (Ry(-theta) tilt, longitudes measured from sp_lon)
    msg2 = dict(msg, la1=-3.0, la2=3.0, lo1=-4.0, lo2=4.0, nj=5, ni=5)
    rlats, rlons, lat, lon = _rotated_grid(msg2)

    def scalar_unrotate(phr_d, lmr_d, sp_lat, sp_lon):
        import math

        phr, lmr = math.radians(phr_d), math.radians(lmr_d)
        v = (
            math.cos(phr) * math.cos(lmr),
            math.cos(phr) * math.sin(lmr),
            math.sin(phr),
        )
        th = math.radians(sp_lat + 90.0)  # tilt about the y axis
        x = v[0] * math.cos(th) - v[2] * math.sin(th)
        z = v[0] * math.sin(th) + v[2] * math.cos(th)
        y = v[1]
        lat_g = math.degrees(math.asin(z))
        lon_g = math.degrees(math.atan2(y, x)) + sp_lon
        return lat_g, (lon_g + 180.0) % 360.0 - 180.0

    for j in range(5):
        for i in range(5):
            wl, wn = scalar_unrotate(rlats[j], rlons[i], -40.0, 10.0)
            np.testing.assert_allclose(lat[j, i], wl, atol=1e-9)
            np.testing.assert_allclose(lon[j, i], wn, atol=1e-9)


@pytest.mark.parametrize("packing", ["simple", "complex"])
def test_rotated_latlon_write_read_roundtrip(tmp_path, packing):
    ds = make_rotated_ds()
    path = str(tmp_path / "rot.grib2")
    write_grib2(
        path, ds, packing=packing,
        projection={"kind": "rotated_latlon", "sp_lat": -40.0, "sp_lon": 10.0},
    )
    rt = read_grib2(path)
    assert tuple(rt.data_vars["t"].dims) == ("time", "rlat", "rlon")
    np.testing.assert_array_equal(rt.data_vars["t"].data, ds.data_vars["t"].data)
    np.testing.assert_allclose(rt.coords["rlat"].data, ds.coords["rlat"].data, atol=1e-5)
    np.testing.assert_allclose(rt.coords["rlon"].data, ds.coords["rlon"].data, atol=1e-5)
    lat = rt.coords["latitude"].data
    lon = rt.coords["longitude"].data
    assert lat.shape == (7, 9) and lon.shape == (7, 9)
    # grid center (rlat=-2.5, rlon=-3) sits near the pole meridian region;
    # every true latitude must be within the band the tilt allows
    assert np.all(lat < 60.0) and np.all(lat > 30.0)


def test_kerchunk_two_concat_dims_from_grib(spark, tmp_path):
    """The reference HRRR family's 2-D shape over real GRIB2 sources:
    files tile (time x latitude), the nested ordered reduce combines
    per-time slices along latitude then slices along time (transforms.
    combine_references_df; reference examples/feedstock/
    hrrr_kerchunk_concat_step.py). Full element equality."""
    from pangeo_forge_recipes_spark import ConcatDim, FilePattern

    ds = make_grib_ds(nt=4)
    for ti in range(2):
        for li in range(2):
            sub = ds.isel(time=slice(2 * ti, 2 * ti + 2), latitude=slice(3 * li, 3 * li + 3))
            write_grib2(str(tmp_path / f"t{ti}_l{li}.grib2"), sub)
    pattern = FilePattern(
        lambda time, latitude: str(tmp_path / f"t{time}_l{latitude}.grib2"),
        ConcatDim("time", keys=[0, 1], nitems_per_file=2),
        ConcatDim("latitude", keys=[0, 1], nitems_per_file=3),
        file_type="grib",
    )
    ref_path = write_combined_reference(
        spark, pattern, str(tmp_path), "ref2d",
        concat_dims=["time", "latitude"],
    )
    combined = open_reference_dataset(ref_path)
    assert_equal(
        _strip_grib_attrs(combined), _strip_grib_attrs(ds), check_attrs=False
    )
