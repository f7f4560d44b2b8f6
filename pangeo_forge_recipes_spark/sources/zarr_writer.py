"""DataFrame → Zarr store: the write-side twin of the ``zarr`` DataSource
relation (``zarr_source.py``). A *long-form* DataFrame (one row per grid
point: dimension-coordinate columns + data-variable columns) materializes
as a Zarr v3 group — the tabular→tensor bridge a pipeline needs when grid
data was produced BY a Spark query (joins, filters, aggregations) rather
than ingested from files.

Scale design:

* **one shuffle**: rows group by their target chunk key and each chunk
  writes from exactly one task — chunk-grain parallelism, the same unit
  the read side partitions on; a 1M-chunk store schedules 1M independent
  write tasks;
* **driver holds only the axes**: per-dim coordinate values are collected
  once (dimension axes are tiny relative to the grid — 10⁵ axis values
  describe a 10¹⁵-point grid); the data itself never visits the driver;
* **positions via broadcast joins**: each dim's (value → ordinal) map is
  a broadcast-joined dimension table, never a driver-side Python loop
  over rows.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEF_TIME_UNITS = "nanoseconds since 1970-01-01"

_SPARK_TO_NP = {
    "double": "float64",
    "float": "float32",
    "bigint": "int64",
    "int": "int32",
    "timestamp_ntz": "datetime64[ns]",
}


def dataframe_to_zarr(
    df: DataFrame,
    target_root: str,
    store_name: str,
    dims: List[str],
    data_vars: Optional[List[str]] = None,
    target_chunks: Optional[Dict[str, int]] = None,
    fill_value: Optional[float] = None,
    attrs: Optional[Dict[str, str]] = None,
    append_dim: Optional[str] = None,
) -> str:
    """Write a long-form DataFrame as a Zarr v3 group; returns the store
    path (readable by ``dsio.open_zarr_group`` and the ``zarr``
    DataSource — ``spark.read.format("zarr")`` round-trips it).

    ``dims`` are the coordinate columns in axis order; every other listed
    (or, by default, remaining) column becomes a data variable over the
    full dim tuple. The grid is the cross product of each dim's distinct
    values (sorted ascending). With ``fill_value=None`` every grid point
    must be present exactly once (asserted per chunk); otherwise missing
    points take the fill.

    ``append_dim`` grows an EXISTING store along one axis (the
    incremental-refresh path — yesterday's grid plus today's rows):
    the DataFrame holds only the NEW slab, whose ``append_dim`` values
    must all sort after the stored axis (axes stay ascending so the
    DataSource's pruning stays valid); every other dim's values must
    equal the stored axis exactly. Chunk layout comes from the existing
    arrays; an unaligned append offset read-modify-writes the one
    boundary chunk (single writer per chunk, so no write conflicts).
    """
    import os

    from ..aggregation import dataset_to_schema
    from ..dsio import schema_to_zarr
    from ..ndset import NDDataset, Variable
    from ..zarrio import open_group

    if data_vars is None:
        data_vars = [c for c in df.columns if c not in dims]
    if not data_vars:
        raise ValueError("no data-variable columns")
    dtypes = dict(df.dtypes)
    for c in dims + data_vars:
        if c not in dtypes:
            raise ValueError(f"column {c!r} not in DataFrame")
        if dtypes[c] not in _SPARK_TO_NP:
            raise ValueError(
                f"column {c!r} has unsupported type {dtypes[c]} "
                f"(supported: {sorted(_SPARK_TO_NP)})"
            )

    # dimension axes: distinct values, sorted — tiny by construction,
    # the one thing the driver holds
    axes: Dict[str, np.ndarray] = {}
    for d in dims:
        vals = [r[0] for r in df.select(d).distinct().orderBy(d).collect()]
        axes[d] = np.array(vals, dtype=_SPARK_TO_NP[dtypes[d]])
    shape = {d: len(axes[d]) for d in dims}
    path = os.path.join(target_root, store_name)

    # per-dim window of the grid this call writes: [lo, hi) — full extent
    # for a fresh store, the appended slab for append_dim
    offsets = {d: 0 for d in dims}

    from ..ndset import decode_cf_datetime, encode_cf_datetime

    def _read_axis_decoded(arr) -> np.ndarray:
        # stored coords are raw CF offsets (int64 + units/calendar attrs);
        # decode before comparing against the datetime64 axes this call
        # built, exactly as the dsio read path does — otherwise a
        # timestamp append_dim hits int64-vs-datetime64 ufunc errors and
        # a timestamp NON-append dim spuriously fails the equality check
        data = arr.read()
        attrs = dict(arr.attrs)
        if "units" in attrs and "calendar" in attrs and data.dtype.kind in "if":
            from ..cfcalendar import is_standard_calendar

            if not is_standard_calendar(attrs["calendar"]):
                raise NotImplementedError(
                    f"append onto a {attrs['calendar']!r}-calendar axis is "
                    "not supported (dataframe_to_zarr writes standard-"
                    "calendar time; this store came from another writer)"
                )
            data = decode_cf_datetime(data, attrs["units"], attrs["calendar"])
        return data

    if append_dim is not None:
        if append_dim not in dims:
            raise ValueError(f"append_dim {append_dim!r} not in dims {dims}")
        g = open_group(path)  # must exist
        old_axis = _read_axis_decoded(g[append_dim])
        for d in dims:
            if d == append_dim:
                continue
            if not np.array_equal(_read_axis_decoded(g[d]), axes[d]):
                raise ValueError(
                    f"append: dim {d!r} values differ from the stored axis"
                )
        new_vals = axes[append_dim]
        if len(old_axis) and len(new_vals) and not new_vals.min() > old_axis.max():
            raise ValueError(
                f"append: new {append_dim!r} values must all sort after the "
                f"stored axis (stored max {old_axis.max()!r}, new min "
                f"{new_vals.min()!r}) — axes stay ascending for pruning"
            )
        offsets[append_dim] = int(len(old_axis))
        # chunk layout comes from the existing arrays
        first = g[data_vars[0]]
        chunks = dict(zip(first.dimension_names, first.chunks))
        n_new = shape[append_dim]
        shape = dict(zip(first.dimension_names, first.shape))
        shape[append_dim] = offsets[append_dim] + n_new
        # resize (metadata only) via the shared append path, then extend
        # the append coord
        ds = NDDataset(
            {
                v: Variable(
                    tuple(dims),
                    np.broadcast_to(
                        np.zeros(1, dtype=_SPARK_TO_NP[dtypes[v]]),
                        tuple(
                            n_new if d == append_dim else shape[d] for d in dims
                        ),
                    ),
                )
                for v in data_vars
            },
            {
                d: Variable((d,), axes[d] if d != append_dim else new_vals)
                for d in dims
            },
            dict(attrs or {}),
            {d: (n_new if d == append_dim else shape[d]) for d in dims},
        )
        store = schema_to_zarr(
            dataset_to_schema(ds), path, target_chunks=chunks,
            append_dim=append_dim,
        )
        g = open_group(store)
        coord_arr = g[append_dim]
        coord_vals = new_vals
        if coord_vals.dtype.kind == "M":
            # CF-encode with the STORED units (not the default) so an
            # archive written with e.g. hour offsets appends consistently
            coord_vals = encode_cf_datetime(
                coord_vals, dict(coord_arr.attrs).get("units", _DEF_TIME_UNITS)
            )
        coord_arr[
            (slice(offsets[append_dim], offsets[append_dim] + n_new),)
        ] = coord_vals
    else:
        chunks = {d: (target_chunks or {}).get(d, shape[d]) for d in dims}
        # init the store (metadata + coord arrays) driver-side
        # schema-only dataset: broadcast_to keeps the full grid VIRTUAL
        # (the driver must never allocate the data it will distribute)
        ds = NDDataset(
            {
                v: Variable(
                    tuple(dims),
                    np.broadcast_to(
                        np.zeros(1, dtype=_SPARK_TO_NP[dtypes[v]]),
                        tuple(shape[d] for d in dims),
                    ),
                    {},
                    # pin the metadata fill: chunks with NO rows at all are
                    # never written, and readers substitute this for absent
                    # chunks — without it a fully-empty chunk silently read
                    # back as 0 instead of fill_value
                    {} if fill_value is None else {"fill_value": fill_value},
                )
                for v in data_vars
            },
            {d: Variable((d,), axes[d]) for d in dims},
            dict(attrs or {}),
            dict(shape),
        )
        store = schema_to_zarr(dataset_to_schema(ds), path, target_chunks=chunks)
        g = open_group(store)
        for d in dims:
            g[d][(slice(0, shape[d]),)] = axes[d]

    # GLOBAL position per dim via broadcast dimension tables (row_number
    # over the sorted distinct values — the same order as the axes above —
    # plus the append offset)
    out = df
    for d in dims:
        pos_df = (
            df.select(d)
            .distinct()
            .withColumn(
                f"__pos_{d}",
                F.row_number().over(Window.orderBy(d)) - 1 + offsets[d],
            )
        )
        out = out.join(F.broadcast(pos_df), on=d, how="inner")
    # integer division: a double quotient rounds wrong near chunk
    # boundaries once pos approaches 2^53/chunk (huge single axes)
    chunk_cols = [
        F.expr(f"__pos_{d} div {chunks[d]}").alias(f"__ck_{d}") for d in dims
    ]
    out = out.select(*dims, *data_vars, *[F.col(f"__pos_{d}") for d in dims], *chunk_cols)

    dim_list = list(dims)
    var_list = list(data_vars)
    chunk_sizes = [chunks[d] for d in dim_list]
    full_shape = [shape[d] for d in dim_list]
    # the window this call owns: [lo, hi) per dim (full extent unless
    # appending, where the append dim's window is the new slab)
    win_lo = [offsets[d] for d in dim_list]
    win_hi = [shape[d] for d in dim_list]
    np_dtypes = {v: _SPARK_TO_NP[dtypes[v]] for v in var_list}
    fv = fill_value

    def write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        ck = [int(pdf[f"__ck_{d}"].iloc[0]) for d in dim_list]
        # region = chunk box ∩ window box (a boundary chunk shared with
        # pre-append data writes only its new part; zarrio region writes
        # read-modify-write the partial chunk)
        starts = [
            max(c * s, lo) for c, s, lo in zip(ck, chunk_sizes, win_lo)
        ]
        stops = [
            min((c + 1) * s, hi)
            for c, s, hi in zip(ck, chunk_sizes, win_hi)
        ]
        cshape = tuple(b - a for a, b in zip(starts, stops))
        n_expected = int(np.prod(cshape))
        local = [
            pdf[f"__pos_{d}"].to_numpy() - st for d, st in zip(dim_list, starts)
        ]
        flat = np.ravel_multi_index(local, cshape)
        if fv is None:
            if len(pdf) != n_expected or len(np.unique(flat)) != len(pdf):
                raise ValueError(
                    f"chunk {ck}: got {len(pdf)} rows for {n_expected} grid "
                    "points (fill_value=None requires each point exactly "
                    "once; pass fill_value to allow gaps)"
                )
        grp = open_group(path)
        region = tuple(slice(a, b) for a, b in zip(starts, stops))
        nbytes = 0
        for v in var_list:
            dt = np_dtypes[v]
            if fv is None:
                arr = np.empty(n_expected, dtype=dt)
            else:
                arr = np.full(n_expected, fv, dtype=dt)
            col = pdf[v].to_numpy()
            arr[flat] = col.astype(dt, copy=False)
            arr = arr.reshape(cshape)
            grp[v][region] = arr
            nbytes += arr.nbytes
        return pd.DataFrame({"n_rows": [len(pdf)], "n_bytes": [nbytes]})

    agg = (
        out.groupBy(*[f"__ck_{d}" for d in dim_list])
        .applyInPandas(write_chunk, "n_rows long, n_bytes long")
        .agg(F.sum("n_rows").alias("r"), F.sum("n_bytes").alias("b"))
        .collect()[0]
    )
    total = int(np.prod([h - l for l, h in zip(win_lo, win_hi)]))
    if fv is None and int(agg["r"] or 0) != total:
        raise ValueError(
            f"wrote {agg['r']} rows for a {total}-point window; grid incomplete"
        )
    return path


__all__ = ["dataframe_to_zarr"]
