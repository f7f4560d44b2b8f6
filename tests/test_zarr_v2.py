"""Zarr v2 read support: the wild is full of v2 stores (.zgroup/.zarray,
dotted chunk keys, zlib compressor, _ARRAY_DIMENSIONS attrs); the engine
opens them through the v2→v3 meta translation and can re-store them as
v3 through the distributed pipeline."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest

from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
from pangeo_forge_recipes_spark.dsio import open_zarr_group
from pangeo_forge_recipes_spark.zarrio import open_group


def _write_v2_store(
    root: str,
    arrays: dict,
    compress: bool = True,
    separator: str = ".",
) -> None:
    """Hand-write a zarr v2 store: arrays = {name: (ndarray, dims, chunks)}."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    with open(os.path.join(root, ".zattrs"), "w") as f:
        json.dump({"title": "v2 fixture"}, f)
    for name, (arr, dims, chunks) in arrays.items():
        adir = os.path.join(root, name)
        os.makedirs(adir, exist_ok=True)
        zarray = {
            "zarr_format": 2,
            "shape": list(arr.shape),
            "chunks": list(chunks),
            "dtype": arr.dtype.str,
            "compressor": {"id": "zlib", "level": 4} if compress else None,
            "fill_value": None,
            "order": "C",
            "filters": None,
        }
        if separator != ".":
            zarray["dimension_separator"] = separator
        with open(os.path.join(adir, ".zarray"), "w") as f:
            json.dump(zarray, f)
        with open(os.path.join(adir, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": list(dims), "units": "K"}, f)
        grid = [range(0, s, c) for s, c in zip(arr.shape, chunks)]
        import itertools

        for origin in itertools.product(*grid):
            idx = [o // c for o, c in zip(origin, chunks)]
            block = np.zeros(chunks, dtype=arr.dtype)
            sl = tuple(
                slice(o, min(o + c, s))
                for o, c, s in zip(origin, chunks, arr.shape)
            )
            block[tuple(slice(0, sp.stop - sp.start) for sp in sl)] = arr[sl]
            raw = block.tobytes()
            if compress:
                raw = zlib.compress(raw, 4)
            key = separator.join(str(i) for i in idx)
            path = os.path.join(adir, key.replace("/", os.sep))
            os.makedirs(os.path.dirname(path), exist_ok=True) if "/" in key else None
            with open(path, "wb") as f:
                f.write(raw)


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize("separator", [".", "/"])
def test_open_v2_store(tmp_path, compress, separator):
    rng = np.random.RandomState(5)
    foo = rng.standard_normal((5, 7))  # edge chunks on both dims
    time = np.arange(5, dtype=">i8")  # big-endian, like netCDF-derived stores
    root = str(tmp_path / "v2.zarr")
    _write_v2_store(
        root,
        {
            "foo": (foo, ("time", "x"), (2, 4)),
            "time": (time, ("time",), (5,)),
        },
        compress=compress,
        separator=separator,
    )
    ds = open_zarr_group(root)
    np.testing.assert_array_equal(ds.data_vars["foo"].data, foo)
    np.testing.assert_array_equal(ds.coords["time"].data, np.arange(5))
    assert tuple(ds.data_vars["foo"].dims) == ("time", "x")
    assert ds.data_vars["foo"].attrs["units"] == "K"
    assert ds.attrs["title"] == "v2 fixture"


def test_v2_store_through_distributed_pipeline(spark, tmp_path):
    """A v2 store re-chunks into a v3 store through store_to_zarr —
    the 'switch an existing archive to this engine' path."""
    rng = np.random.RandomState(6)
    foo = rng.standard_normal((6, 4))
    root = str(tmp_path / "old.zarr")
    _write_v2_store(
        root,
        {
            "foo": (foo, ("time", "x"), (1, 4)),
            "time": (np.arange(6, dtype="i8"), ("time",), (6,)),
        },
    )
    pattern = pattern_from_file_sequence([root], "time", file_type="zarr")
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "new.zarr", target_chunks={"time": 3}
    )
    out = result.open()
    np.testing.assert_array_equal(out.data_vars["foo"].data, foo)
    # the restored store is v3
    assert os.path.exists(os.path.join(tmp_path, "new.zarr", "zarr.json"))


def test_v2_gates(tmp_path):
    root = str(tmp_path / "g.zarr")
    _write_v2_store(root, {"a": (np.zeros((2, 2)), ("y", "x"), (2, 2))})
    # unsupported compressor must raise clearly, not decode garbage
    # (blosc/lz4/zstd are supported now — see test_codecs.py)
    za = json.load(open(os.path.join(root, "a", ".zarray")))
    za["compressor"] = {"id": "bz2", "level": 9}
    json.dump(za, open(os.path.join(root, "a", ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="bz2"):
        open_group(root)["a"].read()
    # not-a-store path
    with pytest.raises(ValueError, match="neither"):
        open_group(str(tmp_path / "empty"))


def test_kerchunk_v1_reference_file_interop(tmp_path):
    """A real-world kerchunk version-1 reference file (zarr-v2 metadata,
    dotted chunk keys, byte ranges into a raw binary) opens directly."""
    from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset

    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    bin_path = str(tmp_path / "data.bin")
    with open(bin_path, "wb") as f:
        f.write(b"HDR!")  # offset the payload so ranges matter
        f.write(arr[:2].tobytes())
        f.write(arr[2:].tobytes())
    half = 2 * 6 * 8
    refs = {
        "version": 1,
        "refs": {
            ".zgroup": json.dumps({"zarr_format": 2}),
            ".zattrs": json.dumps({"source": "kerchunk"}),
            "foo/.zarray": json.dumps({
                "zarr_format": 2, "shape": [4, 6], "chunks": [2, 6],
                "dtype": "<f8", "compressor": None, "fill_value": None,
                "order": "C", "filters": None,
            }),
            "foo/.zattrs": json.dumps({"_ARRAY_DIMENSIONS": ["t", "x"]}),
            "foo/0.0": [f"file://{bin_path}", 4, half],
            "foo/1.0": [f"file://{bin_path}", 4 + half, half],
            "t/.zarray": json.dumps({
                "zarr_format": 2, "shape": [4], "chunks": [4],
                "dtype": "<i8", "compressor": None, "fill_value": None,
                "order": "C", "filters": None,
            }),
            "t/.zattrs": json.dumps({"_ARRAY_DIMENSIONS": ["t"]}),
            "t/0": "base64:" + __import__("base64").b64encode(
                np.arange(4, dtype="<i8").tobytes()).decode(),
        },
    }
    ds = open_reference_dataset(refs)
    np.testing.assert_array_equal(ds.data_vars["foo"].data, arr)
    np.testing.assert_array_equal(ds.coords["t"].data, np.arange(4))
    assert tuple(ds.data_vars["foo"].dims) == ("t", "x")
    assert ds.attrs["source"] == "kerchunk"
    # templates need expansion, not silent garbage
    with pytest.raises(NotImplementedError, match="templates"):
        open_reference_dataset({"version": 1, "templates": {"u": "x"}, "refs": {}})


# ---------------------------------------------------------------------------
# zarr v2 WRITE (zarr_format=2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compressor", [None, "gzip", "zstd", "blosc"])
def test_v2_write_read_roundtrip(tmp_path, compressor):
    import json

    from pangeo_forge_recipes_spark.zarrio import create_group, open_group

    root = str(tmp_path / "w2.zarr")
    g = create_group(root, attrs={"title": "t"}, zarr_format=2)
    data = (np.arange(60, dtype="float64") * 1.5).reshape(6, 10)
    arr = g.create_array(
        "foo", shape=(6, 10), chunks=[2, 10], dtype="float64",
        fill_value=float("nan"), dimension_names=["y", "x"],
        compressor=compressor,
    )
    arr[:, :] = data
    # classic v2 layout on disk
    assert (tmp_path / "w2.zarr" / ".zgroup").exists()
    za = json.load(open(tmp_path / "w2.zarr" / "foo" / ".zarray"))
    assert za["zarr_format"] == 2 and za["dtype"] == "<f8"
    if compressor is None:
        assert za["compressor"] is None
    else:
        assert za["compressor"]["id"] in ("gzip", "zstd", "blosc")
    assert (tmp_path / "w2.zarr" / "foo" / "0.0").exists()
    # reads back through the v2 reader
    g2 = open_group(root)
    assert g2.v2
    np.testing.assert_array_equal(g2["foo"].read(), data)


def test_store_to_zarr_v2_end_to_end(spark, tmp_path):
    import json

    from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
    from pangeo_forge_recipes_spark.dsio import open_zarr_group, write_npz
    from pangeo_forge_recipes_spark.ndset import assert_equal
    from tests.data_generation import make_ds

    ds = make_ds(nt=6)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(paths, "time", nitems_per_file=2, file_type="npz")
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "v2out.zarr",
        target_chunks={"time": 3}, zarr_format=2,
        consolidate_coords=False,  # appended below
    )
    # classic layout + .zmetadata consolidation
    root = tmp_path / "v2out.zarr"
    assert (root / ".zgroup").exists() and not (root / "zarr.json").exists()
    zm = json.load(open(root / ".zmetadata"))
    assert zm["zarr_consolidated_format"] == 1
    assert "foo/.zarray" in zm["metadata"]
    assert_equal(result.open(), ds, check_attrs=False)
    assert_equal(open_zarr_group(str(root)), ds, check_attrs=False)
    # appends work against the v2 store too
    more = make_ds(nt=10).isel(time=slice(6, 10))
    p = str(tmp_path / "f3.npz")
    write_npz(p, more)
    pat2 = pattern_from_file_sequence([p], "time", nitems_per_file=4, file_type="npz")
    store_to_zarr(
        spark, pat2, str(tmp_path), "v2out.zarr",
        target_chunks={"time": 3}, append_dim="time", zarr_format=2,
        consolidate_coords=False,
    )
    grown = open_zarr_group(str(root))
    assert grown.dims["time"] == 10


def test_v2_write_rejects_shards(tmp_path):
    from pangeo_forge_recipes_spark.zarrio import create_group

    g = create_group(str(tmp_path / "s2.zarr"), zarr_format=2)
    with pytest.raises(NotImplementedError, match="v3"):
        g.create_array("x", shape=(4,), chunks=[2], shards=[4], dtype="int64")


def test_consolidated_metadata_read_paths(tmp_path):
    """Both formats serve group/array metadata from the consolidated
    document when present — no per-array GETs, no listing."""
    import json

    import numpy as np

    from pangeo_forge_recipes_spark.zarrio import (
        consolidate_metadata,
        create_group,
        open_group,
    )

    for fmt in (2, 3):
        root = str(tmp_path / f"c{fmt}.zarr")
        g = create_group(root, attrs={"title": "x"}, zarr_format=fmt)
        arr = g.create_array("foo", shape=(4, 3), chunks=[2, 3],
                             dtype="float64", fill_value=0.0,
                             dimension_names=["a", "b"])
        data = np.arange(12, dtype="float64").reshape(4, 3)
        arr[:, :] = data
        consolidate_metadata(root)
        g2 = open_group(root)
        # break the per-array metadata on disk: a consolidated read must
        # not touch it
        import os
        child = os.path.join(
            root, "foo", ".zarray" if fmt == 2 else "zarr.json"
        )
        os.rename(child, child + ".hidden")
        assert g2.array_names() == ["foo"]
        np.testing.assert_array_equal(g2["foo"].read(), data)
        os.rename(child + ".hidden", child)


def test_append_invalidates_consolidated_metadata(spark, tmp_path):
    import json

    from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
    from pangeo_forge_recipes_spark.dsio import open_zarr_group, write_npz
    from tests.data_generation import make_ds

    ds = make_ds(nt=8)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"a{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    first = pattern_from_file_sequence(paths[:2], "time", nitems_per_file=2, file_type="npz")
    rest = pattern_from_file_sequence(paths[2:], "time", nitems_per_file=2, file_type="npz")
    store_to_zarr(spark, first, str(tmp_path), "ac.zarr",
                  target_chunks={"time": 2}, zarr_format=2,
                  consolidate_coords=False)
    # .zmetadata written by the first run must not poison the append
    assert (tmp_path / "ac.zarr" / ".zmetadata").exists()
    store_to_zarr(spark, rest, str(tmp_path), "ac.zarr",
                  target_chunks={"time": 2}, append_dim="time",
                  zarr_format=2, consolidate_coords=False)
    got = open_zarr_group(str(tmp_path / "ac.zarr"))
    assert got.dims["time"] == 8
    # the post-pass rebuilt it with the grown shape
    zm = json.load(open(tmp_path / "ac.zarr" / ".zmetadata"))
    assert zm["metadata"]["foo/.zarray"]["shape"][0] == 8


def test_v2_resize_updates_consolidated_metadata(tmp_path):
    """Resizing a consolidated v2 array through the zarrio API directly
    (outside schema_to_zarr's append path) must keep .zmetadata in sync;
    consolidated readers would otherwise reopen with the stale shape and
    hide the appended region."""
    from pangeo_forge_recipes_spark.zarrio import consolidate_metadata

    rng = np.random.RandomState(11)
    foo = rng.standard_normal((4, 3))
    root = str(tmp_path / "rz.zarr")
    _write_v2_store(root, {"foo": (foo, ("t", "x"), (2, 3))})
    consolidate_metadata(root)

    g = open_group(root)
    arr = g["foo"]
    arr.resize((6, 3))
    arr[4:6, 0:3] = np.ones((2, 3))

    zm = json.load(open(os.path.join(root, ".zmetadata")))
    assert zm["metadata"]["foo/.zarray"]["shape"] == [6, 3]
    # a consolidated reopen sees the grown shape and the new data
    g2 = open_group(root)
    assert g2._consolidated is not None
    got = g2["foo"]
    assert tuple(got.shape) == (6, 3)
    np.testing.assert_array_equal(got.read()[4:6], np.ones((2, 3)))
