"""Partitioning helpers shared by the CPU-bound extension operators."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize_branch_input(df: DataFrame) -> DataFrame:
    """Materialize a small DataFrame that feeds MULTIPLE plan branches of
    one query (AQE does not reuse shuffle stages across branches — proven
    in tools/check_reuse.py, r12 — so without this the upstream subtree,
    including CPU-bound Python scans, recomputes once per branch).

    Strategy comes from ``$SPARK_GRAFT_BRANCH_MATERIALIZE``:

    * ``checkpoint`` (default): eager ``localCheckpoint``. Fastest and
      leak-free locally (no CacheManager entry; blocks free with the
      plan), but the blocks are executor-local and NON-REPLICATED — on a
      real cluster an executor loss (spot kill, dynamic-allocation
      scale-in) fails the query instead of recomputing from lineage, and
      the eager job runs at DataFrame-construction time (building or
      ``explain()``-ing the plan executes the upstream scans once).
    * ``persist``: lazy ``.persist()`` — keeps lineage (executor loss
      recomputes), materializes on first use. The right choice for
      long-lived clusters with dynamic allocation; the branches still
      share one computation of the scan.

    Either way the input is expected to be SMALL (signature tables of
    O(n) × tens of bytes), never the corpus payload."""
    mode = os.environ.get("SPARK_GRAFT_BRANCH_MATERIALIZE", "checkpoint")
    if mode == "persist":
        return df.persist()
    return df.localCheckpoint(eager=True)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the cluster's default parallelism, but only
    when the incoming plan has fewer partitions (e.g. a single-row-group
    parquet file → one unsplittable scan task). Already-parallel inputs —
    a cached repartitioned view, a post-shuffle stage — pass through
    untouched, avoiding a pointless extra exchange."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        current = 1
    if current >= target:
        return df
    return df.repartition(target)
