"""NDS1 raw-frame serialization (r13): ``NDDataset.to_bytes`` emits a
pickled header + verbatim C-contiguous buffers so ``from_bytes``
reconstructs arrays as ZERO-COPY views over the incoming buffer — the
combine side of the payload rechunk shuffle deserializes Arrow
record-batch slices without re-allocating the corpus. These tests pin
the format's round-trip fidelity, the pickle fallback for lazy /
object-dtype payloads, backward compat with legacy pickle frames, and
the zero-copy property itself."""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from pangeo_forge_recipes_spark.ndset import (
    NDDataset,
    Variable,
    _NDS_MAGIC,
    assert_equal,
)


def _sample() -> NDDataset:
    return NDDataset(
        {
            "foo": Variable(("t", "x"), np.arange(12, dtype="f8").reshape(3, 4)),
            "bar": Variable(("t",), np.array([1, 2, 3], dtype="i4"), {"k": 1}),
        },
        {
            "t": Variable(
                ("t",),
                np.array(["2020-01-01", "2020-01-02", "2020-01-03"], dtype="M8[ns]"),
                {"axis": "T"},
                {"units": "days since 2020-01-01"},
            )
        },
        {"title": "frame"},
        {"t": 3, "x": 4},
    )


def test_raw_frame_roundtrip_with_datetime_and_attrs():
    ds = _sample()
    b = ds.to_bytes()
    assert b[:4] == _NDS_MAGIC
    back = NDDataset.from_bytes(b)
    assert_equal(back, ds)
    assert back["t"].data.dtype == ds["t"].data.dtype
    assert back["t"].encoding == ds["t"].encoding
    assert back["bar"].attrs == {"k": 1}
    assert back.attrs == {"title": "frame"}


def test_from_bytes_accepts_memoryview_and_arrow_buffer():
    pa = pytest.importorskip("pyarrow")
    ds = _sample()
    b = ds.to_bytes()
    assert_equal(NDDataset.from_bytes(memoryview(b)), ds)
    assert_equal(NDDataset.from_bytes(pa.py_buffer(b)), ds)


def test_raw_frame_is_zero_copy():
    ds = _sample()
    b = ds.to_bytes()
    back = NDDataset.from_bytes(b)
    # views over the frame, not fresh allocations
    assert not back["foo"].data.flags.owndata
    assert not back["bar"].data.flags.owndata


def test_legacy_pickle_frame_still_loads():
    ds = _sample()
    assert_equal(NDDataset.from_bytes(pickle.dumps(ds, protocol=5)), ds)


def test_object_dtype_falls_back_to_pickle():
    ds = NDDataset(
        {"s": Variable(("t",), np.array(["a", "bb", None], dtype=object))},
        {},
        {},
        {"t": 3},
    )
    b = ds.to_bytes()
    assert b[:4] != _NDS_MAGIC
    back = NDDataset.from_bytes(b)
    assert list(back["s"].data) == ["a", "bb", None]


def test_lazy_variable_falls_back_to_pickle():
    from pangeo_forge_recipes_spark.ndset import LazyArray

    base = np.arange(6, dtype="f8").reshape(2, 3)
    lazy = LazyArray(base)  # ndarray satisfies the reader protocol
    ds = NDDataset({"v": Variable(("t", "x"), lazy)}, {}, {}, {"t": 2, "x": 3})
    b = ds.to_bytes()
    assert b[:4] != _NDS_MAGIC
    back = NDDataset.from_bytes(b)
    np.testing.assert_array_equal(np.asarray(back["v"].data), base)


def test_non_contiguous_input_roundtrips():
    ds = NDDataset(
        {
            "v": Variable(
                ("t", "x"), np.arange(24, dtype="f8").reshape(4, 6)[:, ::2]
            )
        },
        {},
        {},
        {},
    )
    assert_equal(NDDataset.from_bytes(ds.to_bytes()), ds)


def test_empty_dataset_roundtrips():
    ds = NDDataset({}, {}, {"only": "attrs"}, {})
    back = NDDataset.from_bytes(ds.to_bytes())
    assert back.attrs == {"only": "attrs"}
    assert not back.data_vars and not back.coords
