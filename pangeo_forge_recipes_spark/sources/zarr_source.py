"""Zarr DataSource: read Zarr v3 stores as Spark DataFrames.

The SURVEY §7.2-M6 extension: a DataSource V2-style relation exposing a
store as a *long-form* DataFrame (one row per grid point: dimension
coordinates + data variables), built on Spark 4's Python Data Source API.

Scale design:

* **one input partition per chunk slab** along the chunk grid of the
  store — a 100 TB store with 1M chunks schedules 1M independent tasks,
  each reading only its own chunk objects (no global state);
* **partition pruning via filter pushdown**: range/equality filters on
  dimension-coordinate columns prune whole slabs at planning time using
  only the (tiny, driver-cached) coordinate arrays — ``pushFilters``
  reports those filters as fully handled so Spark drops the re-filter
  where safe (coarse chunk-boundary residue is re-applied by returning
  the filters as unhandled);
* **Arrow-batch emission**: each task yields one Arrow RecordBatch per
  slab — no per-row Python overhead.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

_NP_TO_SPARK = {
    "float64": DoubleType(),
    "float32": FloatType(),
    "int64": LongType(),
    "int32": IntegerType(),
    "datetime64[ns]": TimestampNTZType(),
}


def _source_store(path: str):
    """Store for ``path``: an on-disk Zarr directory, or — when the path
    names a kerchunk artifact (``*.json`` reference file / ``*.parquet``
    reference directory) — a read-only ReferenceStore over it, so the
    relation serves VIRTUAL stores too (``spark.sql`` over a combined
    reference without copying any data). Each task rebuilds the store
    from the path; reference payloads are O(#chunks) metadata."""
    import json as _json

    from ..kerchunkio import ReferenceStore, read_reference_parquet

    def _guarded(refs: dict) -> ReferenceStore:
        # same validation as kerchunkio.open_reference_dataset — a
        # templated v1 file would otherwise fail obscurely at task time
        # (FileNotFoundError on a '{{u}}' url) instead of up front
        if isinstance(refs, dict) and (refs.get("templates") or refs.get("gen")):
            raise NotImplementedError(
                "kerchunk 'templates'/'gen' URL substitution is not "
                "supported; expand the references to plain "
                "[url, offset, length] entries"
            )
        return ReferenceStore(refs)

    if path.endswith(".json"):
        with open(path) as f:
            return _guarded(_json.load(f))
    if path.rstrip("/").endswith(".parquet"):
        return _guarded(read_reference_parquet(path))
    return path


def _store_layout(path: str):
    """Driver-side planning info: dims, per-var dtype, chunk grid, and the
    dimension-coordinate arrays (small by construction)."""
    from ..dsio import zarr_group_schema
    from ..zarrio import open_group

    path = _source_store(path)
    schema = zarr_group_schema(path)
    data_vars = schema["data_vars"]
    if not data_vars:
        raise ValueError(f"no data variables in zarr store {path}")
    # the relation covers vars sharing the widest dim tuple
    full_dims = max((tuple(v["dims"]) for v in data_vars.values()), key=len)
    vars_used = {
        name: v for name, v in data_vars.items() if tuple(v["dims"]) == full_dims
    }
    group = open_group(path)
    first = group[next(iter(vars_used))]
    chunks = first.chunks
    shape = first.shape
    coords = {}
    for dim in full_dims:
        if dim in schema["coords"]:
            arr = group[dim].read()
            attrs = group[dim].attrs
            if "units" in attrs and "calendar" in attrs:
                from ..ndset import decode_cf_datetime

                arr = decode_cf_datetime(arr, attrs["units"], attrs["calendar"])
            coords[dim] = arr
    return full_dims, vars_used, shape, chunks, coords, schema


class ZarrDataSource(DataSource):
    """``spark.read.format("zarr").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "zarr"

    def schema(self) -> StructType:
        path = self.options.get("path")
        full_dims, vars_used, shape, chunks, coords, schema = _store_layout(path)
        fields = []
        for dim in full_dims:
            if dim in coords:
                dtype = str(coords[dim].dtype)
            else:
                dtype = "int64"  # positional index for coordinateless dims
            fields.append(StructField(dim, _NP_TO_SPARK[dtype], False))
        for name, v in sorted(vars_used.items()):
            fields.append(StructField(name, _NP_TO_SPARK[v["dtype"]], False))
        return StructType(fields)

    def reader(self, schema: StructType) -> "ZarrReader":
        return ZarrReader(self.options.get("path"), schema)


class ZarrReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.spark_schema = schema
        (
            self.dims,
            self.vars_used,
            self.shape,
            self.chunks,
            self.coords,
            _,
        ) = _store_layout(path)
        self._filters: List[Filter] = []

    # -- filter pushdown ------------------------------------------------------
    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        """Keep dim-coordinate range/equality filters for partition pruning;
        hand everything back as unhandled (chunk pruning is coarse — Spark
        must still re-apply the residual filter row-wise).

        Called once per QUERY planning, and the same reader instance is
        reused by every query derived from one ``spark.read`` DataFrame —
        the filter set must RESET here, not accumulate, or an unfiltered
        query planned after a filtered one would silently keep the stale
        pruning (observed: count() after a filtered count() returned the
        filtered partition set)."""
        self._filters = []
        for f in filters:
            col = getattr(f, "attribute", None)
            if (
                col
                and len(col) == 1
                and col[0] in self.coords
                and isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                     LessThanOrEqual, In),
                )
            ):
                self._filters.append(f)
            yield f  # unhandled → Spark re-applies exactly

    def _slab_survives(self, starts, stops) -> bool:
        for f in self._filters:
            dim = f.attribute[0]
            axis = self.dims.index(dim)
            coord = self.coords[dim]
            lo = coord[starts[axis] : stops[axis]].min()
            hi = coord[starts[axis] : stops[axis]].max()
            v = f.value
            if str(coord.dtype).startswith("datetime64"):
                # ns-precision datetime64 cannot compare to datetime.datetime
                v = (
                    tuple(np.datetime64(x) for x in v)
                    if isinstance(f, In)
                    else np.datetime64(v)
                )
            if isinstance(f, In):
                if not any(lo <= x <= hi for x in v):
                    return False
                continue
            if isinstance(f, EqualTo) and not (lo <= v <= hi):
                return False
            if isinstance(f, GreaterThan) and not (hi > v):
                return False
            if isinstance(f, GreaterThanOrEqual) and not (hi >= v):
                return False
            if isinstance(f, LessThan) and not (lo < v):
                return False
            if isinstance(f, LessThanOrEqual) and not (lo <= v):
                return False
        return True

    # -- planning -------------------------------------------------------------
    def partitions(self) -> List[InputPartition]:
        import itertools

        ranges = []
        for size, chunk in zip(self.shape, self.chunks):
            bounds = list(range(0, size, chunk)) + [size]
            ranges.append(list(zip(bounds[:-1], bounds[1:])))
        parts = []
        for combo in itertools.product(*ranges):
            starts = [c[0] for c in combo]
            stops = [c[1] for c in combo]
            if self._slab_survives(starts, stops):
                parts.append(InputPartition((starts, stops)))
        return parts

    # -- execution ------------------------------------------------------------
    def read(self, partition: InputPartition):
        import pyarrow as pa

        from ..zarrio import open_group
        from ..ndset import decode_cf_datetime

        starts, stops = partition.value
        group = open_group(_source_store(self.path))
        region = tuple(slice(a, b) for a, b in zip(starts, stops))
        slab_shape = tuple(b - a for a, b in zip(starts, stops))
        n = int(np.prod(slab_shape))

        columns = {}
        for axis, dim in enumerate(self.dims):
            if dim in self.coords:
                vals = self.coords[dim][starts[axis] : stops[axis]]
            else:
                vals = np.arange(starts[axis], stops[axis], dtype="int64")
            reshape = [1] * len(self.dims)
            reshape[axis] = slab_shape[axis]
            columns[dim] = np.broadcast_to(
                vals.reshape(reshape), slab_shape
            ).reshape(n)
        for name in self.vars_used:
            arr = group[name]
            data = arr[region]
            attrs = arr.attrs
            if "units" in attrs and "calendar" in attrs:
                data = decode_cf_datetime(data, attrs["units"], attrs["calendar"])
            columns[name] = data.reshape(n)

        def to_arrow(c: np.ndarray) -> "pa.Array":
            if c.dtype.kind == "M":
                # Spark's Arrow bridge rejects nanosecond timestamps
                c = c.astype("datetime64[us]")
            return pa.array(np.ascontiguousarray(c))

        ordered = [columns[f.name] for f in self.spark_schema.fields]
        yield pa.RecordBatch.from_arrays(
            [to_arrow(c) for c in ordered],
            names=[f.name for f in self.spark_schema.fields],
        )


def register_zarr_source(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ZarrDataSource)


def read_zarr(spark, path: str) -> "DataFrame":  # noqa: F821
    """Fresh relation over a zarr store: ``register_zarr_source`` +
    ``spark.read.format("zarr").load(path)``.

    PREFER THIS over reusing one loaded DataFrame for several queries.
    Spark 4.1's Python DataSource caches the planned scan on the loaded
    relation and filter-pushdown planning OVERWRITES that cache, so on a
    REUSED DataFrame an unfiltered query that runs after a filtered one
    silently reuses the filtered partition set (rows missing). Upstream
    behavior, reproduced with a minimal pure-pyspark datasource
    (tests/test_zarr_source.py::test_upstream_scan_cache_hazard); a
    fresh ``load()`` per query sidesteps it entirely."""
    register_zarr_source(spark)
    return spark.read.format("zarr").load(path)
