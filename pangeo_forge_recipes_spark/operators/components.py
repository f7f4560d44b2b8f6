"""Connected components over candidate-pair graphs — the cluster-resolution
stage of fuzzy deduplication (MinHash/SimHash pairs → duplicate clusters →
one canonical document per cluster).

Algorithm: alternating *large-star* / *small-star* (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), expressed
entirely in DataFrame ops. Each round is two groupBy-min shuffles and
converges in O(log n) rounds — unlike naive label propagation, whose
round count is the graph diameter (a 100 TB duplicate chain would need
thousands of rounds; this needs ~log₂ of it).

Scale design notes (100 TB):

* state per round is just the edge set, re-keyed by one endpoint — no
  adjacency lists are ever materialized, so a hub node with 10⁸ neighbors
  is a big *group*, not a big *row* (map-side partial min keeps even that
  cheap);
* every round ends with ``localCheckpoint`` — iterative plans otherwise
  accumulate lineage until Catalyst analysis itself becomes the
  bottleneck and a lost executor replays the whole history;
* convergence is detected from a commutative edge-set checksum
  (count + sum of per-edge hashes) computed by the same job that
  materializes the round — no extra pass over the data.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["connected_components", "dedup_clusters", "canonical_docs"]


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as distinct (u > v) pairs, self-loops dropped."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> Tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # bit_xor: commutative and overflow-free under ANSI mode (edges
        # are distinct, so xor-cancellation of duplicates cannot occur)
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, where m(u) = min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient u > v; connect every smaller neighbor (and u itself) to
    m(u) = min neighbor."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        edges.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        moved.union(self_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Component labels for every vertex that appears in ``edges``:
    ``(id, component)`` with ``component`` = the minimum vertex id of the
    component (so roots label themselves). Isolated vertices never appear
    in an edge list — callers union them back (see :func:`dedup_clusters`).

    Raises after ``max_iterations`` alternating rounds without
    convergence; large-star/small-star needs O(log n) rounds, so 20
    covers graphs far beyond any physical corpus (2^20 ≈ 10⁶ *rounds
    of halving*, not vertices).
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    prev: Optional[Tuple[int, int]] = None
    for _ in range(max_iterations):
        # r12 (guide §2.4): _large_star's output is already canonical —
        # it emits (v, m) with v > u ≥ m, distinct'd and self-loop-free —
        # so the former extra _canonical_edges() pass added a pure
        # duplicate distinct (one exchange + aggregation) per round.
        # The checkpoint is LAZY: the _checksum job below materializes it
        # (one job per round instead of two — eager checkpoint + separate
        # checksum scan), and later rounds read the cached blocks.
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    # converged: every edge is (member, root) with root = component min
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    return members.union(roots).distinct()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: Tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Resolve near-duplicate *pairs* into duplicate *clusters*: every doc
    gets a ``cluster_id`` (= min doc id of its cluster; singletons label
    themselves). This is the step between LSH candidate verification and
    canonical-document selection in a training-data dedup pipeline."""
    comp = connected_components(pairs, *pair_cols)
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )


def canonical_docs(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    order_col: Optional[str] = None,
    descending: bool = True,
) -> DataFrame:
    """One kept document per cluster: highest ``order_col`` (e.g. a quality
    score; ties and default fall back to lowest doc id). Returns ``docs``
    rows augmented with ``cluster_id`` and ``is_canonical``."""
    joined = docs.join(clusters, id_col)
    ordering = [F.col(id_col).asc()]
    if order_col is not None:
        ordering.insert(
            0, F.col(order_col).desc() if descending else F.col(order_col).asc()
        )
    w = Window.partitionBy("cluster_id").orderBy(*ordering)
    return joined.withColumn(
        "is_canonical", F.row_number().over(w) == F.lit(1)
    )
