"""Tests for dataframe_to_zarr: the long-form DataFrame -> Zarr store
writer (write-side twin of the zarr DataSource relation)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.dsio import open_zarr_group
from pangeo_forge_recipes_spark.sources import dataframe_to_zarr, register_zarr_source


def _grid_df(spark, nt=6, nx=8):
    rows = []
    for t in range(nt):
        for x in range(nx):
            rows.append((100 + 2 * t, 10 * x, float((t * 31 + x * 7) % 101), t * nx + x))
    return spark.createDataFrame(rows, "time long, x long, val double, seq long")


def test_roundtrip_long_form(spark, tmp_path):
    df = _grid_df(spark)
    path = dataframe_to_zarr(
        df, str(tmp_path), "w.zarr", dims=["time", "x"],
        target_chunks={"time": 2, "x": 5},
    )
    ds = open_zarr_group(path)
    assert ds.sizes == {"time": 6, "x": 8}
    np.testing.assert_array_equal(ds.coords["time"].data, 100 + 2 * np.arange(6))
    np.testing.assert_array_equal(ds.coords["x"].data, 10 * np.arange(8))
    t, x = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
    np.testing.assert_allclose(
        ds.data_vars["val"].data, ((t * 31 + x * 7) % 101).astype("float64")
    )
    np.testing.assert_array_equal(ds.data_vars["seq"].data, t * 8 + x)


def test_roundtrip_through_datasource(spark, tmp_path):
    """write -> spark.read.format('zarr') -> write again == identity."""
    df = _grid_df(spark, nt=4, nx=6)
    p1 = dataframe_to_zarr(
        df, str(tmp_path), "a.zarr", dims=["time", "x"], target_chunks={"time": 2}
    )
    register_zarr_source(spark)
    back = spark.read.format("zarr").load(p1)
    p2 = dataframe_to_zarr(
        back, str(tmp_path), "b.zarr", dims=["time", "x"], target_chunks={"x": 3}
    )
    a, b = open_zarr_group(p1), open_zarr_group(p2)
    for v in ("val", "seq"):
        np.testing.assert_array_equal(a.data_vars[v].data, b.data_vars[v].data)
    for d in ("time", "x"):
        np.testing.assert_array_equal(a.coords[d].data, b.coords[d].data)


def test_incomplete_grid_raises_without_fill(spark, tmp_path):
    df = _grid_df(spark, nt=3, nx=4).filter("seq <> 5")
    with pytest.raises(Exception, match="grid|rows"):
        dataframe_to_zarr(df, str(tmp_path), "inc.zarr", dims=["time", "x"])


def test_incomplete_grid_takes_fill_value(spark, tmp_path):
    df = _grid_df(spark, nt=3, nx=4).filter("seq <> 5").select("time", "x", "val")
    path = dataframe_to_zarr(
        df, str(tmp_path), "fill.zarr", dims=["time", "x"], fill_value=-1.0,
        target_chunks={"time": 2, "x": 2},
    )
    ds = open_zarr_group(path)
    t, x = np.meshgrid(np.arange(3), np.arange(4), indexing="ij")
    want = ((t * 31 + x * 7) % 101).astype("float64")
    want[1, 1] = -1.0  # seq 5 = (t=1, x=1)
    np.testing.assert_allclose(ds.data_vars["val"].data, want)


def test_duplicate_grid_point_raises(spark, tmp_path):
    df = _grid_df(spark, nt=2, nx=2)
    dup = df.unionAll(df.limit(1))
    with pytest.raises(Exception, match="exactly once|rows"):
        dataframe_to_zarr(dup, str(tmp_path), "dup.zarr", dims=["time", "x"])


def test_timestamp_dim(spark, tmp_path):
    df = spark.sql(
        "SELECT timestamp_ntz'2020-01-01 00:00:00' + make_interval(0,0,0,d,0,0,0) AS time, "
        "CAST(v AS BIGINT) AS x, CAST(d * 10 + v AS DOUBLE) AS val "
        "FROM range(0, 4) t1(d) CROSS JOIN range(0, 3) t2(v)"
    )
    path = dataframe_to_zarr(df, str(tmp_path), "ts.zarr", dims=["time", "x"])
    ds = open_zarr_group(path)
    assert ds.sizes == {"time": 4, "x": 3}
    assert str(np.asarray(ds.coords["time"].data).dtype).startswith("datetime64")
    d, v = np.meshgrid(np.arange(4), np.arange(3), indexing="ij")
    np.testing.assert_allclose(ds.data_vars["val"].data, d * 10.0 + v)


def test_append_dim_grows_store(spark, tmp_path):
    """Incremental refresh: day-0..3 grid first, then append days 4..5 —
    including an UNALIGNED boundary (chunk {day:3}: day 4 lands in the
    partially-filled chunk [3:6), which must read-modify-write)."""
    full = _grid_df(spark, nt=6, nx=4)
    first = full.filter("time < 108")   # days 0..3 (time = 100 + 2t)
    rest = full.filter("time >= 108")   # days 4..5
    path = dataframe_to_zarr(
        first, str(tmp_path), "a.zarr", dims=["time", "x"],
        target_chunks={"time": 3, "x": 4},
    )
    out = dataframe_to_zarr(
        rest, str(tmp_path), "a.zarr", dims=["time", "x"], append_dim="time",
    )
    assert out == path
    ds = open_zarr_group(path)
    assert ds.sizes == {"time": 6, "x": 4}
    np.testing.assert_array_equal(ds.coords["time"].data, 100 + 2 * np.arange(6))
    t, x = np.meshgrid(np.arange(6), np.arange(4), indexing="ij")
    np.testing.assert_allclose(
        ds.data_vars["val"].data, ((t * 31 + x * 7) % 101).astype("float64")
    )
    np.testing.assert_array_equal(ds.data_vars["seq"].data, t * 4 + x)


def _ts_grid_df(spark, lo_day, hi_day, nx=3):
    return spark.sql(
        f"SELECT timestamp_ntz'2020-01-01 00:00:00' + make_interval(0,0,0,d,0,0,0) AS time, "
        f"CAST(v AS BIGINT) AS x, CAST(d * 10 + v AS DOUBLE) AS val "
        f"FROM range({lo_day}, {hi_day}) t1(d) CROSS JOIN range(0, {nx}) t2(v)"
    )


def test_append_dim_timestamp(spark, tmp_path):
    """append_dim over a datetime64 axis: the stored coord is raw
    CF-encoded int64, so the ordering check must CF-decode it and the
    coord region write must CF-encode the new slab (ADVICE r7)."""
    path = dataframe_to_zarr(
        _ts_grid_df(spark, 0, 4), str(tmp_path), "tsap.zarr",
        dims=["time", "x"], target_chunks={"time": 3, "x": 3},
    )
    out = dataframe_to_zarr(
        _ts_grid_df(spark, 4, 6), str(tmp_path), "tsap.zarr",
        dims=["time", "x"], append_dim="time",
    )
    assert out == path
    ds = open_zarr_group(path)
    assert ds.sizes == {"time": 6, "x": 3}
    want_time = np.datetime64("2020-01-01") + np.arange(6).astype("timedelta64[D]")
    np.testing.assert_array_equal(
        np.asarray(ds.coords["time"].data).astype("datetime64[D]"), want_time
    )
    d, v = np.meshgrid(np.arange(6), np.arange(3), indexing="ij")
    np.testing.assert_allclose(ds.data_vars["val"].data, d * 10.0 + v)
    # out-of-order timestamp append still rejects (decoded comparison)
    with pytest.raises(ValueError, match="sort after"):
        dataframe_to_zarr(
            _ts_grid_df(spark, 2, 3), str(tmp_path), "tsap.zarr",
            dims=["time", "x"], append_dim="time",
        )


def test_append_with_timestamp_non_append_dim(spark, tmp_path):
    """A timestamp NON-append dim must pass the stored-axis equality
    check (decoded compare, ADVICE r7) when appending along another dim."""
    full = _ts_grid_df(spark, 0, 3, nx=6)
    dataframe_to_zarr(
        full.filter("x < 3"), str(tmp_path), "tsx.zarr",
        dims=["time", "x"], target_chunks={"time": 3, "x": 2},
    )
    dataframe_to_zarr(
        full.filter("x >= 3"), str(tmp_path), "tsx.zarr",
        dims=["time", "x"], append_dim="x",
    )
    ds = open_zarr_group(str(tmp_path / "tsx.zarr"))
    assert ds.sizes == {"time": 3, "x": 6}
    d, v = np.meshgrid(np.arange(3), np.arange(6), indexing="ij")
    np.testing.assert_allclose(ds.data_vars["val"].data, d * 10.0 + v)


def test_append_rejects_out_of_order_axis(spark, tmp_path):
    full = _grid_df(spark, nt=4, nx=3)
    dataframe_to_zarr(
        full.filter("time >= 104"), str(tmp_path), "o.zarr", dims=["time", "x"]
    )
    with pytest.raises(ValueError, match="sort after"):
        dataframe_to_zarr(
            full.filter("time < 104"), str(tmp_path), "o.zarr",
            dims=["time", "x"], append_dim="time",
        )


def test_append_rejects_mismatched_other_axis(spark, tmp_path):
    full = _grid_df(spark, nt=4, nx=4)
    dataframe_to_zarr(
        full.filter("time < 104"), str(tmp_path), "m.zarr", dims=["time", "x"]
    )
    with pytest.raises(ValueError, match="stored axis"):
        dataframe_to_zarr(
            full.filter("time >= 104 AND x < 30"), str(tmp_path), "m.zarr",
            dims=["time", "x"], append_dim="time",
        )


def test_fill_value_covers_fully_empty_chunks(spark, tmp_path):
    """Chunks with NO rows are never written; the metadata fill must be
    the requested fill_value, not the default 0 (review finding r7)."""
    # 4x4 grid, 2x2 chunks; drop the ENTIRE top-left chunk (t<2, x<2)
    df = _grid_df(spark, nt=4, nx=4).filter(
        "NOT (time < 104 AND x < 20)"
    ).select("time", "x", "val")
    path = dataframe_to_zarr(
        df, str(tmp_path), "empty_chunk.zarr", dims=["time", "x"],
        target_chunks={"time": 2, "x": 2}, fill_value=-1.0,
    )
    ds = open_zarr_group(path)
    t, x = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    want = ((t * 31 + x * 7) % 101).astype("float64")
    want[:2, :2] = -1.0
    np.testing.assert_allclose(ds.data_vars["val"].data, want)
    # the DataSource read agrees
    from pangeo_forge_recipes_spark.sources import read_zarr

    got = {
        (r["time"], r["x"]): r["val"]
        for r in read_zarr(spark, path).collect()
    }
    assert got[(100, 0)] == -1.0 and got[(102, 10)] == -1.0
    assert got[(106, 30)] == want[3, 3]
