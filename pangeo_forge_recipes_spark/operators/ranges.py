"""Range (point-in-interval) join — binned so Spark never falls back to a
nested-loop join.

A plain ``l.ts BETWEEN r.lo AND r.hi`` join without an equality predicate
plans as BroadcastNestedLoopJoin — O(n·m) and a non-starter at scale.
Binning restores an equi-join: intervals are exploded onto the fixed-width
bins they cover, points map to their single bin, the join runs on
``(keys…, bin)`` and a residual filter enforces exact containment. Each
point lands in exactly one bin, so no dedup pass is needed. Shuffle volume
is points + intervals×(avg bins per interval) — choose ``bin_size`` near
the typical interval width to keep the expansion factor ~2.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_seconds(df: DataFrame, name: str):
    """Numeric value of a column for binning: epoch seconds for timestamps,
    the raw value for numerics."""
    dtype = dict(df.dtypes)[name]
    c = F.col(name)
    if dtype.startswith("timestamp"):
        return F.unix_timestamp(c)
    return c


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_lo: str,
    right_hi: str,
    by: Optional[List[str]] = None,
    bin_size_seconds: int = 86_400,
) -> DataFrame:
    """Inner-join each left row (point ``left_on``) to right rows whose
    half-open interval ``[right_lo, right_hi)`` contains it, optionally also
    matching equality columns ``by``. Timestamp or numeric columns;
    ``bin_size_seconds`` is plain units for numerics."""
    by = by or []
    l_bin = F.floor(_as_seconds(left, left_on) / bin_size_seconds).cast("long")
    lo_bin = F.floor(_as_seconds(right, right_lo) / bin_size_seconds).cast("long")
    # hi is exclusive; covering through hi's bin may add one false-positive
    # bin, which the residual containment filter removes
    hi_bin = F.floor(_as_seconds(right, right_hi) / bin_size_seconds).cast("long")

    l_tagged = left.withColumn("__bin", l_bin)
    r_tagged = right.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    joined = l_tagged.join(r_tagged, by + ["__bin"], "inner")
    contain = (F.col(left_on) >= F.col(right_lo)) & (
        F.col(left_on) < F.col(right_hi)
    )
    return joined.filter(contain).drop("__bin")
