"""NetCDF3 classic container: pure-numpy write/read/schema/scan, plus the
Zarr and kerchunk pipelines running end-to-end from netcdf3 sources
(reference parity: ``openers.py:40-47`` netcdf3 engine row and the
netcdf3 cases in ``tests/test_end_to_end.py``)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pangeo_forge_recipes_spark import (
    pattern_from_file_sequence,
    store_to_zarr,
    write_combined_reference,
)
from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
from pangeo_forge_recipes_spark.ndset import NDDataset, Variable, assert_equal
from pangeo_forge_recipes_spark.netcdf3 import (
    netcdf3_schema,
    read_netcdf3,
    scan_netcdf3,
    write_netcdf3,
)
from pangeo_forge_recipes_spark.openers import open_with_ndset, read_schema
from pangeo_forge_recipes_spark.patterns import FileType

from .data_generation import make_ds


def _int32_expected(ds: NDDataset) -> NDDataset:
    """NetCDF3 classic has no 64-bit ints: int64 round-trips as int32."""
    out = ds.isel()
    for name, var in out.data_vars.items():
        if var.dtype == np.int64:
            out.data_vars[name] = Variable(
                var.dims, var.data.astype("int32"), dict(var.attrs), dict(var.encoding)
            )
    return out


def test_write_read_roundtrip(tmp_path):
    ds = make_ds(nt=5)
    p = str(tmp_path / "t.nc")
    write_netcdf3(p, ds)
    rt = read_netcdf3(p)
    assert_equal(rt, _int32_expected(ds))
    # CF time encoding survives
    assert rt["time"].dtype.kind == "M"
    assert "since" in rt["time"].encoding["units"]


def test_header_only_schema_matches_full_open(tmp_path):
    ds = make_ds(nt=3)
    p = str(tmp_path / "t.nc")
    write_netcdf3(p, ds)
    schema = netcdf3_schema(p)
    assert schema["dims"] == {"time": 3, "lat": 18, "lon": 36}
    assert set(schema["data_vars"]) == {"foo", "bar"}
    assert schema["data_vars"]["foo"]["dtype"] == "float64"
    assert schema["coords"]["time"]["dtype"] == "datetime64[ns]"
    # schema pass must not read array payloads: truncate data region, parse ok
    header_len = min(v["shape"][0] for v in [schema["coords"]["time"]]) or 1
    with open(p, "rb") as f:
        head = f.read(2048)
    clipped = str(tmp_path / "clipped.nc")
    with open(clipped, "wb") as f:
        f.write(head)
    assert netcdf3_schema(clipped)["dims"] == schema["dims"]
    del header_len


def test_int64_overflow_rejected(tmp_path):
    ds = NDDataset(
        {"big": Variable(("x",), np.array([2**40, 1], dtype="int64"))},
        {},
        {},
        {"x": 2},
    )
    with pytest.raises(ValueError, match="64-bit"):
        write_netcdf3(str(tmp_path / "t.nc"), ds)


def test_time_beyond_int32_falls_back_to_double(tmp_path):
    # seconds-since-1970 offsets past 2038 exceed NC_INT: the writer must
    # fall back to NC_DOUBLE per the module contract, not raise
    times = np.array(
        ["2040-01-01T00:00:00", "2040-01-02T00:00:00"], dtype="datetime64[ns]"
    )
    ds = NDDataset(
        {"v": Variable(("time",), np.array([1.0, 2.0]))},
        {"time": Variable(("time",), times)},
        {},
        {"time": 2},
    )
    p = str(tmp_path / "t.nc")
    write_netcdf3(p, ds)
    rt = read_netcdf3(p)
    np.testing.assert_array_equal(rt["time"].data, times)
    assert netcdf3_schema(p)["coords"]["time"]["dtype"] == "datetime64[ns]"


def test_openers_route_netcdf3(tmp_path):
    ds = make_ds(nt=2)
    p = str(tmp_path / "t.nc")
    write_netcdf3(p, ds)
    opened = open_with_ndset(f"file://{p}", FileType.netcdf3)
    assert_equal(opened, _int32_expected(ds))
    assert read_schema(p, FileType.netcdf3)["dims"]["time"] == 2


def test_scan_references_equal_direct_read(tmp_path):
    ds = make_ds(nt=4)
    p = str(tmp_path / "t.nc")
    write_netcdf3(p, ds)
    refs = scan_netcdf3(p)
    via_refs = open_reference_dataset(refs)
    assert_equal(via_refs, read_netcdf3(p))


def _write_split(tmp_path, ds, nt_per_file):
    paths = []
    nt = ds.sizes["time"]
    for i, start in enumerate(range(0, nt, nt_per_file)):
        p = str(tmp_path / f"f{i}.nc")
        write_netcdf3(p, ds.isel(time=slice(start, start + nt_per_file)))
        paths.append(p)
    return paths


def test_store_to_zarr_from_netcdf3(spark, tmp_path):
    ds = make_ds(nt=6)
    paths = _write_split(tmp_path, ds, 2)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="netcdf3"
    )
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "out.zarr", target_chunks={"time": 3}
    )
    assert_equal(result.open(), _int32_expected(ds))


def test_kerchunk_pipeline_from_netcdf3(spark, tmp_path):
    ds = make_ds(nt=6)
    paths = _write_split(tmp_path, ds, 2)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="netcdf3"
    )
    ref_path = write_combined_reference(
        spark, pattern, str(tmp_path), "ref", max_refs_per_merge=2
    )
    assert os.path.exists(ref_path)
    assert_equal(open_reference_dataset(ref_path), _int32_expected(ds))


def test_read_netcdf3_vsize_sentinel(tmp_path):
    """vsize == 0xFFFFFFFF (the >=4 GiB sentinel) must be recomputed from
    shape x itemsize instead of poisoning the record stride."""
    import struct

    def name(s):
        b = s.encode()
        pad = (4 - len(b) % 4) % 4
        return struct.pack(">I", len(b)) + b + b"\x00" * pad

    numrecs = 3
    # dims: rec (record, stored 0), c=2
    hdr = b"CDF\x01" + struct.pack(">I", numrecs)
    hdr += struct.pack(">II", 10, 2)           # NC_DIMENSION, ndims
    hdr += name("rec") + struct.pack(">I", 0)
    hdr += name("c") + struct.pack(">I", 2)
    hdr += struct.pack(">II", 0, 0)            # no global attrs
    SENT = 0xFFFFFFFF
    x = np.arange(numrecs * 2, dtype=">i4").reshape(numrecs, 2)
    y = (np.arange(numrecs) + 100).astype(">i4")

    def var_entry(nm, dimids, vsize, begin):
        out = name(nm) + struct.pack(">I", len(dimids))
        for d in dimids:
            out += struct.pack(">I", d)
        out += struct.pack(">II", 0, 0)        # no var attrs
        out += struct.pack(">II", 4, vsize)    # NC_INT, vsize sentinel
        out += struct.pack(">I", begin)
        return out

    # compute header size with placeholder begins, then fill
    def build(beg_x, beg_y):
        v = struct.pack(">II", 11, 2)          # NC_VARIABLE, nvars
        v += var_entry("x", [0, 1], SENT, beg_x)
        v += var_entry("y", [0], SENT, beg_y)
        return hdr + v

    base = len(build(0, 0))
    recsize = 8 + 4                            # x row (8B) + y row (4B)
    body = b""
    for r in range(numrecs):
        body += x[r].tobytes() + y[r : r + 1].tobytes()
    p = str(tmp_path / "sentinel.nc")
    with open(p, "wb") as f:
        f.write(build(base, base + 8) + body)

    rt = read_netcdf3(p)
    np.testing.assert_array_equal(rt.data_vars["x"].data, x.astype("i4"))
    np.testing.assert_array_equal(rt.data_vars["y"].data, y.astype("i4"))


def test_cdf5_roundtrip_wide_types(tmp_path):
    """CDF-5 (pnetcdf lineage): 64-bit headers + the five additional
    external types store natively — int64 values beyond NC_INT range,
    unsigned ints at full width — and read back exactly, including
    through the header-only schema and the byte-range scanner."""
    from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
    from pangeo_forge_recipes_spark.netcdf3 import scan_netcdf3

    ds = NDDataset(
        {
            "big": Variable(("x",), np.array([2**40, -(2**40), 7], dtype="int64")),
            "u64": Variable(("x",), np.array([2**63, 1, 0], dtype="uint64")),
            "u32": Variable(("x",), np.array([2**31 + 5, 0, 9], dtype="uint32")),
            "u16": Variable(("x",), np.array([65535, 0, 3], dtype="uint16")),
            "u8": Variable(("x",), np.array([255, 0, 1], dtype="uint8")),
        },
        {"x": Variable(("x",), np.arange(3, dtype="int32"))},
        {"title": "cdf5"},
        {"x": 3},
    )
    p = str(tmp_path / "t5.nc")
    write_netcdf3(p, ds, version=5)
    with open(p, "rb") as f:
        assert f.read(4) == b"CDF\x05"
    rt = read_netcdf3(p)
    assert_equal(rt, ds)
    assert rt.data_vars["big"].dtype == np.int64
    assert rt.data_vars["u64"].dtype == np.uint64
    schema = netcdf3_schema(p)
    assert schema["data_vars"]["big"]["dtype"] == "int64"
    assert schema["data_vars"]["u8"]["dtype"] == "uint8"
    via = open_reference_dataset(scan_netcdf3(p))
    np.testing.assert_array_equal(
        via.data_vars["u64"].data, ds.data_vars["u64"].data
    )
    np.testing.assert_array_equal(
        via.data_vars["big"].data, ds.data_vars["big"].data
    )


def test_cdf5_time_and_classic_error_pointer(tmp_path):
    """CDF-5 keeps post-2038 CF second offsets as NC_INT64 (classic
    falls back to NC_DOUBLE); the classic int64-overflow error now
    points at version=5."""
    times = np.array(
        ["2040-01-01T00:00:00", "2040-01-02T00:00:00"], dtype="datetime64[ns]"
    )
    ds = NDDataset(
        {"v": Variable(("time",), np.array([2**40, 2], dtype="int64"))},
        {"time": Variable(("time",), times)},
        {},
        {"time": 2},
    )
    p = str(tmp_path / "t5t.nc")
    write_netcdf3(p, ds, version=5)
    rt = read_netcdf3(p)
    assert_equal(rt, ds)
    assert rt["time"].dtype.kind == "M"
    with pytest.raises(ValueError, match="version=5"):
        write_netcdf3(str(tmp_path / "classic.nc"), ds)
