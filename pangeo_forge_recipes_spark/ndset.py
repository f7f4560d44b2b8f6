"""Minimal labeled N-dimensional dataset — the engine's payload type.

xarray is not a dependency of this engine; fragments that flow through the
Spark pipeline are instances of :class:`NDDataset`, a deliberately small
subset of ``xarray.Dataset`` covering exactly what the reference pipeline
exercises (reference usage: ``pangeo_forge_recipes/openers.py:207-254``,
``rechunking.py:122`` ``.isel``, ``rechunking.py:240`` ``combine_nested``,
``aggregation.py:20-37`` ``to_dict(data=False, encoding=True)``).

Payloads cross Spark shuffle boundaries as raw-buffer frames (r13, guide
§4.2): ``to_bytes`` emits a small pickled header plus each variable's
C-contiguous buffer appended verbatim, so ``from_bytes`` reconstructs
every array as a ZERO-COPY ``np.frombuffer`` view over the incoming
buffer — an Arrow record-batch slice on the combine side of the rechunk
shuffle deserializes without allocating or copying a single payload
byte. (The pre-r13 format was a plain pickle, which re-allocated every
fragment on load; datasets containing lazy or object-dtype variables
still fall back to pickle, and ``from_bytes`` auto-detects both formats
by magic.) Memory per fragment is bounded by the target chunk size,
exactly as in the reference.
"""

from __future__ import annotations

import pickle
import re
import struct
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "LazyArray",
    "Variable",
    "NDDataset",
    "concat",
    "combine_nested",
    "assert_equal",
]

# raw-frame magic for NDDataset.to_bytes / from_bytes (see module docstring)
_NDS_MAGIC = b"NDS1"


class LazyArray:
    """Chunk-lazy view over a region of a chunk-addressable reader — any
    object whose ``__getitem__`` accepts a tuple of slices and returns an
    ``np.ndarray`` (``zarrio.ZarrArray``, including kerchunk reference
    stores whose gets are byte-range reads).

    Slicing composes window offsets WITHOUT touching storage; consuming
    the array (``np.asarray`` / ``np.concatenate`` / any ``__array__``
    caller) materializes with ONE chunk-granular region read. This is
    what makes the reference-shuffle rechunk scale on chunk-lazy
    sources: a write task range-reads exactly its group's piece of each
    source instead of decoding whole files. An optional ``post``
    transform (CF datetime decode) applies at materialization; ``dtype``
    is the POST-transform dtype so schema logic never materializes.

    Views are read-only: ``copy()`` returns ``self`` (no consumer on the
    lazy path mutates payload buffers in place — writers materialize
    first via ``np.asarray``).
    """

    def __init__(self, reader, region=None, dtype=None, post=None):
        self._reader = reader
        self._region = (
            tuple(region)
            if region is not None
            else tuple(slice(0, int(s)) for s in reader.shape)
        )
        self.dtype = np.dtype(dtype if dtype is not None else reader.dtype)
        self._post = post

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(sl.stop - sl.start for sl in self._region)

    @property
    def ndim(self) -> int:
        return len(self._region)

    @property
    def size(self) -> int:
        return int(np.prod(self.shape, dtype=np.int64))

    @property
    def nbytes(self) -> int:
        return self.size * self.dtype.itemsize

    def __len__(self) -> int:
        if not self._region:
            raise TypeError("len() of unsized object")
        return self.shape[0]

    def __getitem__(self, key) -> "LazyArray":
        if not isinstance(key, tuple):
            key = (key,)
        if len(key) == len(self._region) and all(
            isinstance(k, slice) for k in key
        ):
            new = []
            for sl, cur in zip(key, self._region):
                start, stop, step = sl.indices(cur.stop - cur.start)
                if step != 1:
                    break
                new.append(slice(cur.start + start, cur.start + max(stop, start)))
            else:
                return LazyArray(self._reader, new, self.dtype, self._post)
        # anything beyond pure unit-step slicing (fancy indexing, int
        # axes, steps) materializes — not used on the pipeline hot path
        return self.materialize()[key]

    def materialize(self) -> np.ndarray:
        data = self._reader[self._region]
        if self._post is not None:
            data = self._post(data)
        return np.asarray(data)

    def __array__(self, dtype=None, copy=None):
        data = self.materialize()
        if dtype is not None:
            data = data.astype(dtype, copy=False)
        return data

    def copy(self) -> "LazyArray":
        return self

    def astype(self, dtype, copy: bool = True) -> np.ndarray:
        return self.materialize().astype(dtype, copy=copy)

    def __repr__(self) -> str:
        return (
            f"<LazyArray shape={self.shape} dtype={self.dtype} "
            f"region={self._region}>"
        )


@dataclass
class Variable:
    """A named array with dimension labels, attributes and encoding hints
    (mirrors ``xarray.Variable`` surface used by the reference)."""

    dims: Tuple[str, ...]
    data: np.ndarray
    attrs: dict = field(default_factory=dict)
    encoding: dict = field(default_factory=dict)

    def __post_init__(self):
        self.dims = tuple(self.dims)
        if not isinstance(self.data, (np.ndarray, LazyArray)):
            self.data = np.asarray(self.data)
        if len(self.dims) != self.data.ndim:
            raise ValueError(
                f"dims {self.dims} do not match data ndim {self.data.ndim}"
            )

    @property
    def sizes(self) -> Dict[str, int]:
        return dict(zip(self.dims, self.data.shape))

    @property
    def dtype(self) -> np.dtype:
        return self.data.dtype

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    def isel(self, indexers: Dict[str, slice]) -> "Variable":
        key = tuple(indexers.get(d, slice(None)) for d in self.dims)
        return Variable(self.dims, self.data[key], dict(self.attrs), dict(self.encoding))

    def copy(self) -> "Variable":
        return Variable(self.dims, self.data.copy(), dict(self.attrs), dict(self.encoding))

    def schema_dict(self) -> dict:
        """Schema entry in the shape produced by
        ``xr.Dataset.to_dict(data=False, encoding=True)`` (see reference
        ``aggregation.py:20-37``)."""
        return {
            "dims": list(self.dims),
            "attrs": dict(self.attrs),
            "dtype": str(self.data.dtype),
            "shape": list(self.data.shape),
            "encoding": {k: v for k, v in self.encoding.items() if k != "source"},
        }


class NDDataset:
    """Dict-of-variables dataset: ``data_vars`` + ``coords`` + ``attrs``.

    Coordinates whose name equals their sole dimension are *dimension
    coordinates*; others are non-dimension coordinates (reference fixture
    F1a). A dimension may exist with no coordinate at all (fixture F1b).
    """

    def __init__(
        self,
        data_vars: Optional[Dict[str, Variable]] = None,
        coords: Optional[Dict[str, Variable]] = None,
        attrs: Optional[dict] = None,
        dims: Optional[Dict[str, int]] = None,
    ):
        self.data_vars: Dict[str, Variable] = dict(data_vars or {})
        self.coords: Dict[str, Variable] = dict(coords or {})
        self.attrs: dict = dict(attrs or {})
        self._explicit_dims = dict(dims or {})
        self._check_consistent()

    # -- shape bookkeeping ----------------------------------------------------
    def _check_consistent(self) -> None:
        sizes: Dict[str, int] = dict(self._explicit_dims)
        for name, var in self.variables.items():
            for d, s in var.sizes.items():
                if d in sizes and sizes[d] != s:
                    raise ValueError(
                        f"conflicting sizes for dim {d!r}: {sizes[d]} vs {s} (var {name!r})"
                    )
                sizes.setdefault(d, s)
        self._sizes = sizes

    @property
    def variables(self) -> Dict[str, Variable]:
        return {**self.coords, **self.data_vars}

    @property
    def sizes(self) -> Dict[str, int]:
        return dict(self._sizes)

    dims = sizes

    def __getitem__(self, name: str) -> Variable:
        return self.variables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.data_vars or name in self.coords

    # -- selection ------------------------------------------------------------
    def isel(self, indexers: Optional[Dict[str, slice]] = None, **kw: slice) -> "NDDataset":
        """Positional slicing over named dims (subset of ``xr.Dataset.isel``
        used at reference ``rechunking.py:122``)."""
        indexers = {**(indexers or {}), **kw}
        dv = {k: v.isel(indexers) for k, v in self.data_vars.items()}
        co = {k: v.isel(indexers) for k, v in self.coords.items()}
        new_dims = {}
        for d, n in self._explicit_dims.items():
            sl = indexers.get(d)
            new_dims[d] = len(range(*sl.indices(n))) if sl is not None else n
        return NDDataset(dv, co, dict(self.attrs), new_dims)

    def sel(
        self,
        indexers: Optional[Dict[str, object]] = None,
        method: Optional[str] = None,
        **kw,
    ) -> "NDDataset":
        """Label-based selection over dimension coordinates (the
        ``xr.Dataset.sel`` subset users reach for after ``isel``): values
        or slices of coordinate LABELS, resolved to positions against the
        1-D dimension coordinate. ``method=None`` requires exact matches;
        ``method="nearest"`` snaps scalars to the closest label. Label
        slices are inclusive on both ends, following xarray."""
        indexers = {**(indexers or {}), **kw}
        positional: Dict[str, slice] = {}
        for dim, sel in indexers.items():
            coord = self.coords.get(dim)
            if coord is None or list(coord.dims) != [dim]:
                raise KeyError(
                    f"sel needs a 1-D dimension coordinate for {dim!r}"
                )
            labels = np.asarray(coord.data)
            def _locate(value) -> int:
                v = np.asarray(value, dtype=labels.dtype)
                if method == "nearest":
                    if labels[0] <= labels[-1]:
                        i = int(np.searchsorted(labels, v))
                    else:  # descending coordinate (lat N->S)
                        i = len(labels) - int(
                            np.searchsorted(labels[::-1], v, side="right")
                        )
                    cands = [j for j in (i - 1, i) if 0 <= j < len(labels)]
                    return min(
                        cands, key=lambda j: abs(
                            (labels[j] - v).astype("timedelta64[ns]").astype(np.int64)
                            if labels.dtype.kind == "M"
                            else labels[j] - v
                        )
                    )
                hits = np.nonzero(labels == v)[0]
                if not len(hits):
                    raise KeyError(f"{value!r} not found in coordinate {dim!r}")
                return int(hits[0])

            if isinstance(sel, slice):
                if sel.step is not None:
                    raise NotImplementedError("stepped label slices unsupported")
                lo = 0 if sel.start is None else None
                hi = len(labels) if sel.stop is None else None
                asc = len(labels) < 2 or labels[0] <= labels[-1]
                arr = labels if asc else labels[::-1]
                if lo is None:
                    p = int(np.searchsorted(arr, np.asarray(sel.start, dtype=labels.dtype), side="left"))
                    lo = p if asc else len(labels) - int(np.searchsorted(arr, np.asarray(sel.start, dtype=labels.dtype), side="right"))
                if hi is None:
                    if asc:
                        hi = int(np.searchsorted(arr, np.asarray(sel.stop, dtype=labels.dtype), side="right"))
                    else:
                        hi = len(labels) - int(np.searchsorted(arr, np.asarray(sel.stop, dtype=labels.dtype), side="left"))
                positional[dim] = slice(lo, hi)
            else:
                i = _locate(sel)
                positional[dim] = slice(i, i + 1)
        return self.isel(positional)

    # -- schema / serialization ----------------------------------------------
    def to_dict(self) -> dict:
        """Data-free description matching
        ``xr.Dataset.to_dict(data=False, encoding=True)``."""
        return {
            "attrs": dict(self.attrs),
            "coords": {k: v.schema_dict() for k, v in self.coords.items()},
            "data_vars": {k: v.schema_dict() for k, v in self.data_vars.items()},
            "dims": self.sizes,
        }

    def frame_parts(self) -> List:
        """The NDS1 frame as a list of bytes-like parts (magic, length
        prefix, pickled header, then each variable's raw buffer) — the
        zero-join building blocks of :meth:`to_bytes`. Callers that
        assemble many frames into ONE output buffer (the Arrow split
        stage) write these parts directly into their buffer, so each
        payload byte is copied exactly once end-to-end. Falls back to a
        single-part pickle for lazy/object-dtype payloads."""
        metas: list = []
        bufs: list = []
        offset = 0
        for role, group in (("c", self.coords), ("d", self.data_vars)):
            for name, var in group.items():
                data = var.data
                if not isinstance(data, np.ndarray) or data.dtype.hasobject:
                    return [pickle.dumps(self, protocol=5)]
                a = np.ascontiguousarray(data)
                metas.append(
                    (
                        role,
                        name,
                        var.dims,
                        a.dtype.str,
                        a.shape,
                        var.attrs,
                        var.encoding,
                        offset,
                        a.nbytes,
                    )
                )
                # datetime64/timedelta64 refuse buffer export directly; a
                # flat uint8 view is a no-copy reinterpretation. Exported
                # as a memoryview so consumers' ``bytearray += part`` uses
                # the buffer protocol (a raw ndarray part would be
                # hijacked by numpy's broadcasting __radd__).
                bufs.append(memoryview(a.reshape(-1).view(np.uint8)))
                offset += a.nbytes
        header = pickle.dumps(
            {"attrs": self.attrs, "dims": self._explicit_dims, "vars": metas},
            protocol=5,
        )
        return [_NDS_MAGIC, struct.pack("<Q", len(header)), header] + bufs

    def to_bytes(self) -> bytes:
        """Raw-buffer frame: ``NDS1 | <u64 header len> | pickled header |
        buffers...``. One copy total (the final join); the header carries
        (role, name, dims, dtype, shape, attrs, encoding, offset, nbytes)
        per variable. Lazy/object-dtype payloads fall back to pickle —
        ``from_bytes`` dispatches on the magic either way."""
        return b"".join(self.frame_parts())

    @staticmethod
    def from_bytes(b) -> "NDDataset":
        """Accepts bytes, memoryview, or any buffer-protocol object (e.g.
        a ``pyarrow.Buffer`` sliced out of an Arrow record batch). Raw
        frames reconstruct each array as a read-only zero-copy view over
        ``b``; legacy pickle frames load as before."""
        mv = memoryview(b)
        if mv.nbytes < 12 or bytes(mv[:4]) != _NDS_MAGIC:
            return pickle.loads(b)
        (hlen,) = struct.unpack("<Q", mv[4:12])
        meta = pickle.loads(mv[12 : 12 + hlen])
        base = 12 + hlen
        coords: Dict[str, Variable] = {}
        data_vars: Dict[str, Variable] = {}
        for role, name, dims, dt, shape, attrs, enc, off, nb in meta["vars"]:
            arr = np.frombuffer(
                mv[base + off : base + off + nb], dtype=np.dtype(dt)
            ).reshape(shape)
            target = coords if role == "c" else data_vars
            target[name] = Variable(tuple(dims), arr, attrs, enc)
        return NDDataset(data_vars, coords, meta["attrs"], meta["dims"])

    # -- convenience mutators (preprocessor surface, SURVEY §2.2) -------------
    def drop_vars(self, names: Iterable[str]) -> "NDDataset":
        names = set([names] if isinstance(names, str) else names)
        return NDDataset(
            {k: v for k, v in self.data_vars.items() if k not in names},
            {k: v for k, v in self.coords.items() if k not in names},
            dict(self.attrs),
            self._explicit_dims,
        )

    def rename(self, mapping: Dict[str, str]) -> "NDDataset":
        def rn(name: str) -> str:
            return mapping.get(name, name)

        def rn_var(v: Variable) -> Variable:
            return Variable(tuple(rn(d) for d in v.dims), v.data, dict(v.attrs), dict(v.encoding))

        return NDDataset(
            {rn(k): rn_var(v) for k, v in self.data_vars.items()},
            {rn(k): rn_var(v) for k, v in self.coords.items()},
            dict(self.attrs),
            {rn(k): n for k, n in self._explicit_dims.items()},
        )

    def set_coords(self, names: Iterable[str]) -> "NDDataset":
        """Promote data variables to coordinates (reference usage
        ``examples/feedstock/narr_opendap.py:44-48``)."""
        names = set([names] if isinstance(names, str) else names)
        dv = dict(self.data_vars)
        co = dict(self.coords)
        for n in names:
            co[n] = dv.pop(n)
        return NDDataset(dv, co, dict(self.attrs), self._explicit_dims)

    def where(self, var: str, predicate) -> "NDDataset":
        """Mask values of ``var`` where predicate(data) is False → NaN
        (reference usage ``examples/feedstock/terraclimate.py:64-93``)."""
        out = NDDataset(
            {k: (v.copy() if k == var else v) for k, v in self.data_vars.items()},
            self.coords,
            dict(self.attrs),
            self._explicit_dims,
        )
        v = out.data_vars[var]
        data = v.data.astype("float64") if v.data.dtype.kind in "iu" else v.data
        v.data = np.where(predicate(data), data, np.nan)
        return out

    def expand_dims(self, dim: str, axis: int = 0) -> "NDDataset":
        """Insert a new length-1 dimension into every data variable
        (subset of ``xr.Dataset.expand_dims`` — the preprocessor step
        for sources whose files lack the concat dimension, e.g. one
        forecast step per file; see reference
        ``examples/feedstock/hrrr_kerchunk_concat_step.py:33``).
        Coordinates are untouched; attach a label afterwards with
        :meth:`assign_coords` if the pattern does not already index the
        dimension."""
        if dim in self.sizes:
            raise ValueError(f"expand_dims: dimension {dim!r} already exists")

        def grow(v: Variable) -> Variable:
            # normalize a negative axis per variable the way numpy does
            # (-1 APPENDS): list.insert(-1, ...) would insert BEFORE the
            # last dim while np.expand_dims appends, mislabeling axes
            ax = axis if axis >= 0 else axis + len(v.dims) + 1
            dims = list(v.dims)
            dims.insert(ax, dim)
            return Variable(
                tuple(dims),
                np.expand_dims(v.data, ax),
                dict(v.attrs),
                dict(v.encoding),
            )

        return NDDataset(
            {k: grow(v) for k, v in self.data_vars.items()},
            self.coords,
            dict(self.attrs),
            {**self._explicit_dims, dim: 1},
        )

    def assign_coords(self, coords: Optional[Dict[str, "Variable"]] = None, **kw) -> "NDDataset":
        """Attach or replace coordinates. Values may be ``Variable``s or
        1-D arrays (labeled with the like-named dimension)."""
        new = dict(self.coords)
        for name, val in {**(coords or {}), **kw}.items():
            if not isinstance(val, Variable):
                arr = np.asarray(val)
                if arr.ndim == 0:
                    arr = arr.reshape(1)
                val = Variable((name,), arr)
            new[name] = val
        return NDDataset(
            self.data_vars, new, dict(self.attrs), self._explicit_dims
        )

    def coarsen(
        self, factors: Optional[Dict[str, int]] = None, how: str = "mean", **kw: int
    ) -> "NDDataset":
        """Block-aggregate along named dimensions (subset of
        ``xr.Dataset.coarsen(...).mean()`` with ``boundary='exact'`` —
        the common pangeo downsampling preprocessor, e.g. hourly→daily
        or 0.25°→1° regridding by block mean). ``how`` is ``mean``,
        ``sum``, ``min`` or ``max``; every coarsened dimension's size
        must be divisible by its factor (exact blocks; trim/pad
        boundaries upstream with ``isel``). Coordinates always coarsen
        by block MEAN (the block's center label — xarray's default
        ``coord_func='mean'``), regardless of ``how``."""
        factors = {**(factors or {}), **kw}
        if how not in ("mean", "sum", "min", "max"):
            raise ValueError(f"how={how!r}; use mean, sum, min or max")
        for d, f in factors.items():
            size = self.sizes.get(d)
            if size is None:
                raise KeyError(f"coarsen: no dimension {d!r}")
            if f <= 0 or size % f:
                raise ValueError(
                    f"coarsen: size {size} of {d!r} not divisible by {f}"
                )

        def reduce_var(v: Variable, agg: str) -> Variable:
            data = v.data
            for d, f in factors.items():
                if d not in v.dims or f == 1:
                    continue
                ax = v.dims.index(d)
                shape = (
                    data.shape[:ax]
                    + (data.shape[ax] // f, f)
                    + data.shape[ax + 1 :]
                )
                blocks = data.reshape(shape)
                if agg == "mean" and data.dtype.kind in "iu":
                    blocks = blocks.astype("float64")
                data = getattr(blocks, agg)(axis=ax + 1)
            return Variable(v.dims, data, dict(v.attrs), dict(v.encoding))

        return NDDataset(
            {k: reduce_var(v, how) for k, v in self.data_vars.items()},
            {k: reduce_var(v, "mean") for k, v in self.coords.items()},
            dict(self.attrs),
            {
                d: (n // factors.get(d, 1))
                for d, n in self._explicit_dims.items()
            },
        )

    def __repr__(self) -> str:
        return (
            f"<NDDataset dims={self.sizes} data_vars={list(self.data_vars)} "
            f"coords={list(self.coords)}>"
        )


# -- combination ----------------------------------------------------------------


def _concat_vars(vars_: List[Variable], dim: str) -> Variable:
    first = vars_[0]
    if dim not in first.dims:
        return first
    axis = first.dims.index(dim)
    data = np.concatenate([v.data for v in vars_], axis=axis)
    return Variable(first.dims, data, dict(first.attrs), dict(first.encoding))


def concat(datasets: Sequence[NDDataset], dim: str) -> NDDataset:
    """Concatenate along one named dimension (subset of ``xr.concat``)."""
    first = datasets[0]
    if sorted(first.data_vars) != sorted(datasets[-1].data_vars):
        raise ValueError("concat requires identical data_vars")
    dv = {
        k: _concat_vars([ds.data_vars[k] for ds in datasets], dim) for k in first.data_vars
    }
    co = {k: _concat_vars([ds.coords[k] for ds in datasets], dim) for k in first.coords}
    dims = dict(first._explicit_dims)
    if dim in dims:
        dims[dim] = sum(ds.sizes.get(dim, 0) for ds in datasets)
    return NDDataset(dv, co, dict(first.attrs), dims)


def combine_nested(nested, concat_dims: List[str]) -> NDDataset:
    """Concat-only n-dimensional nested combine (the subset of
    ``xr.combine_nested`` exercised at reference ``rechunking.py:240`` —
    merge never happens there, see ``rechunking.py:160-162``)."""
    if len(concat_dims) == 0:
        if isinstance(nested, NDDataset):
            return nested
        raise ValueError("exhausted concat dims with nesting remaining")
    if isinstance(nested, NDDataset):
        raise ValueError("nesting shallower than concat_dims")
    inner = [combine_nested(item, concat_dims[1:]) for item in nested]
    return concat(inner, concat_dims[0])


def merge(datasets: Sequence[NDDataset]) -> NDDataset:
    """Union distinct data variables over aligned coords (MERGE combine
    semantics, reference ``patterns.py:51-63``)."""
    dv: Dict[str, Variable] = {}
    co: Dict[str, Variable] = {}
    attrs: dict = {}
    for i, ds in enumerate(datasets):
        for k, v in ds.data_vars.items():
            if k in dv:
                raise ValueError(f"Can't merge datasets with the same variable {k}")
            dv[k] = v
        for k, v in ds.coords.items():
            co.setdefault(k, v)
        if i == 0:
            attrs = dict(ds.attrs)
        else:
            attrs = {k: v for k, v in attrs.items() if k in ds.attrs and _attr_eq(v, ds.attrs[k])}
    return NDDataset(dv, co, attrs)


def _attr_eq(a, b) -> bool:
    try:
        if (
            isinstance(a, (float, np.floating))
            and isinstance(b, (float, np.floating))
            and np.isnan(a)
            and np.isnan(b)
        ):
            return True
        return bool(a == b)
    except Exception:
        return False


def assert_equal(a: NDDataset, b: NDDataset, check_attrs: bool = True) -> None:
    """Golden-comparison oracle, mirroring ``xr.testing.assert_equal`` as used
    by the reference e2e suite (``tests/test_end_to_end.py:36-60``)."""
    assert sorted(a.data_vars) == sorted(b.data_vars), (
        f"data_vars differ: {sorted(a.data_vars)} vs {sorted(b.data_vars)}"
    )
    assert sorted(a.coords) == sorted(b.coords), (
        f"coords differ: {sorted(a.coords)} vs {sorted(b.coords)}"
    )
    assert a.sizes == b.sizes, f"dims differ: {a.sizes} vs {b.sizes}"
    for name in {**a.variables, **b.variables}:
        va, vb = a[name], b[name]
        assert va.dims == vb.dims, f"{name}: dims {va.dims} != {vb.dims}"
        if va.data.dtype.kind == "f" or vb.data.dtype.kind == "f":
            assert np.allclose(
                va.data.astype("f8"), vb.data.astype("f8"), equal_nan=True, rtol=0, atol=0
            ), f"{name}: values differ"
        else:
            assert np.array_equal(va.data, vb.data), f"{name}: values differ"
    if check_attrs:
        assert a.attrs == b.attrs, f"attrs differ: {a.attrs} vs {b.attrs}"


# -- CF-style time encode/decode -------------------------------------------------

_UNITS_RE = re.compile(
    r"^(?P<unit>nanoseconds|microseconds|milliseconds|seconds|minutes|hours|days)"
    r"\s+since\s+(?P<epoch>.+)$"
)
_NP_UNIT = {
    "nanoseconds": "ns",
    "microseconds": "us",
    "milliseconds": "ms",
    "seconds": "s",
    "minutes": "m",
    "hours": "h",
    "days": "D",
}


def encode_cf_datetime(data: np.ndarray, units: str) -> np.ndarray:
    """datetime64 → int64 offsets in ``units`` ("<unit> since <epoch>").

    Mirrors the CF encoding contract the reference relies on via xarray
    (``tests/data_generation.py:38-43``; cftime special case at
    ``aggregation.py:193-197`` — non-standard calendars are out of scope
    without cftime and raise).
    """
    m = _UNITS_RE.match(units.strip())
    if not m:
        raise ValueError(f"Unparseable time units: {units!r}")
    np_unit = _NP_UNIT[m.group("unit")]
    epoch = np.datetime64(_normalize_epoch(m.group("epoch")))
    delta = data.astype("datetime64[ns]") - epoch.astype("datetime64[ns]")
    step = np.timedelta64(1, np_unit).astype("timedelta64[ns]")
    # exact int64 floor division: timedelta/timedelta yields float64, which
    # quantizes ns-since-epoch offsets (~1.7e18 > 2^53) to ~256 ns steps
    return delta.astype("timedelta64[ns]").astype("int64") // step.astype("int64")


def decode_cf_datetime(data: np.ndarray, units: str, calendar: str = "proleptic_gregorian") -> np.ndarray:
    """Inverse of :func:`encode_cf_datetime` → datetime64[ns]."""
    if calendar not in ("proleptic_gregorian", "gregorian", "standard"):
        raise NotImplementedError(
            f"calendar {calendar!r} requires cftime, which is not available"
        )
    m = _UNITS_RE.match(units.strip())
    if not m:
        raise ValueError(f"Unparseable time units: {units!r}")
    np_unit = _NP_UNIT[m.group("unit")]
    epoch = np.datetime64(_normalize_epoch(m.group("epoch"))).astype("datetime64[ns]")
    step = np.timedelta64(1, np_unit).astype("timedelta64[ns]")
    return epoch + data.astype("int64") * step


def _normalize_epoch(epoch: str) -> str:
    epoch = epoch.strip()
    # np.datetime64 wants ISO "YYYY-MM-DDTHH:MM:SS"; CF allows a space
    if " " in epoch:
        date, time = epoch.split(" ", 1)
        return f"{date}T{time}"
    return epoch
