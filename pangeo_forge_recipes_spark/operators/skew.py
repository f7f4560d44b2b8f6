"""Skew-resilient join: explicit key salting.

AQE's skew-join splitting (on by default in :func:`session.get_spark`)
handles skewed sort-merge joins at runtime; explicit salting is the
portable fallback for the cases AQE can't re-plan — broadcast-disabled
joins against a pre-partitioned/bucketed side, or a single hot key so
large that one AQE sub-split still spills.

Design: the skewed (left) side gets a deterministic per-row salt in
``[0, salt)``; the small (right) side is replicated ``salt`` times via an
exploded literal range; the join key becomes ``(key, salt)``, so one hot
key's rows spread over ``salt`` shuffle partitions instead of one. Result
rows are identical to the unsalted join — the DuckDB oracle runs the
plain join.
"""

from __future__ import annotations

from typing import List, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, List[str]],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (skewed, large) with ``right`` (small enough to
    replicate ``salt``×) producing exactly the rows of
    ``left.join(right, on, how)``.

    Only ``inner`` and ``left`` joins are supported: replicating the right
    side would duplicate unmatched right rows under right/full outer
    semantics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: the "
            "replicated right side would duplicate unmatched right rows "
            "under right/full outer semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic per-row salt: stable under task retries (unlike
    # rand()), and spreads a hot key because it ignores the key value
    salted_left = left.withColumn(
        _SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt))
    )
    replicated_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_left.join(replicated_right, keys + [_SALT], how).drop(_SALT)
