"""As-of (most-recent-match) join — an operator Spark SQL lacks natively.

Spark-first design: no per-key collect and no range cross-join. Left and
right rows are union-tagged and sorted once per key; a single
``last(..., ignorenulls)`` window carries the most recent right-side
values forward onto each left row. One shuffle on the key column, window
evaluated streaming within each partition — at 100 TB this is a single
exchange + sort, the same cost profile as any keyed window.

The DuckDB oracle uses its native ``ASOF JOIN``, so the operator's
semantics are pinned against an independent implementation.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    right_cols: Optional[List[str]] = None,
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_on <= left_on`` (backward as-of) within the same ``by`` key.

    ``strict=True`` uses ``right_on < left_on`` instead. Right columns come
    back null when no prior right row exists. Right-side ties on
    ``right_on`` resolve to the last row in ``right_cols`` order of
    occurrence — pass pre-deduplicated input when tie identity matters.
    A right column whose name collides with a left column is emitted as
    ``asof_<name>`` (the pandas/DuckDB suffix convention).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (by, right_on)]
    # a right column sharing a left column's name would duplicate in the
    # output (ambiguous downstream) — disambiguate like pandas/DuckDB do
    out_names = {
        c: f"asof_{c}" if c in left.columns else c for c in right_cols
    }
    collisions = [n for n in out_names.values() if n in left.columns]
    if collisions or len(set(out_names.values())) != len(out_names):
        raise ValueError(
            f"asof_join output name collision on {sorted(collisions)}; "
            "rename the right-side columns or pass explicit right_cols"
        )
    l_tag = left.withColumn("__t", F.col(left_on)).withColumn(
        "__is_left", F.lit(1)
    )
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn("__r_on", F.lit(None).cast(dict(right.dtypes)[right_on]))

    r_tag = right.select(
        F.col(by),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_on).alias("__r_on"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal timestamps unless strict —
    # then a right row at exactly left_on must NOT be visible
    order = [F.col("__t").asc(), F.col("__is_left").asc()]
    if strict:
        order = [F.col("__t").asc(), F.col("__is_left").desc()]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    filled = unioned.select(
        *left.columns,
        F.col("__is_left"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(out_names[c])
            for c in right_cols
        ],
        F.last("__r_on", ignorenulls=True).over(w).alias(f"asof_{right_on}"),
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")
