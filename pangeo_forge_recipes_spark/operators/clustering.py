"""Distributed k-means over embedding columns + SemDeDup-style semantic
deduplication (cluster the corpus, then search near-duplicate pairs only
*within* clusters).

This is the designated scale path past the broadcast bound of
``dedup.embedding_near_dup``: a billion-vector corpus cannot be broadcast,
but k-means centroids (k × dim floats) always can. Clustering turns the
quadratic all-pairs search into k independent within-cluster searches —
the shape of SemDeDup (Abbas et al., 2023, arXiv:2303.09540), which
prunes web-scale training sets by dropping near-identical embeddings
inside each cluster.

Scale design notes (100 TB):

* Lloyd iterations keep ONLY k×dim state on the driver: assignment is a
  broadcast-GEMM ``mapInPandas`` (Arrow batches, no shuffle), the update
  step reduces per-cluster partial (sum, count) pairs — every executor
  emits at most k rows of dim floats per partition, one narrow shuffle of
  k×partitions rows per iteration;
* init is the deterministic md5-ordered distributed sample (plans as
  TakeOrderedAndProject — the driver never holds more than k rows);
* within-cluster pair search shuffles each vector ONCE (hash on
  cluster id); a cluster-size cap routes degenerate clusters through
  their centroid-nearest representatives instead of an O(n²) block.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _normalize, _sample_centroids

__all__ = [
    "kmeans_fit",
    "kmeans_assign",
    "semantic_dedup",
    "embedding_decontaminate",
]


def _assign_udf(df: DataFrame, centroids_bc, id_col: str, vec_col: str) -> DataFrame:
    """(id, cluster, vector) via broadcast-centroid cosine GEMM."""

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = centroids_bc.value  # (k, dim), L2-normalized
        for pdf in batches:
            if not len(pdf):
                continue
            q = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": (q @ c.T).argmax(axis=1).astype(np.int32),
                    vec_col: pdf[vec_col],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    vec_type = df.schema[vec_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, cluster int, {vec_col} {vec_type}"
    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def _farthest_point_init(
    df: DataFrame, k: int, id_col: str, vec_col: str, oversample: int = 8
) -> np.ndarray:
    """Deterministic k-means++-style init: draw ``oversample*k`` candidate
    rows with the distributed md5 sample (TakeOrderedAndProject — driver
    holds O(k) rows), then greedily keep the k candidates that maximize the
    minimum pairwise cosine distance. Plain md5-sampling alone can seed two
    centroids inside one dense region and Lloyd cannot escape; the greedy
    spread fixes that while staying fully deterministic."""
    cand = _sample_centroids(df, max(k * oversample, k), id_col, vec_col)
    if len(cand) <= k:
        return cand
    chosen = [0]  # md5-smallest candidate (post id-sort) anchors the greedy
    min_sim = cand @ cand[0]
    for _ in range(k - 1):
        nxt = int(np.argmin(min_sim))
        chosen.append(nxt)
        min_sim = np.maximum(min_sim, cand @ cand[nxt])
    return cand[sorted(chosen)]


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
) -> np.ndarray:
    """Spherical k-means (cosine distance, unit-norm centroids) via Lloyd
    iterations. Returns the (k, dim) centroid matrix — deliberately a
    driver-side numpy array: it is the broadcastable model artifact, never
    corpus-sized. Deterministic: farthest-point init over an md5-sampled
    candidate pool, fixed iteration count, empty clusters keep their
    previous centroid."""
    spark = df.sparkSession
    centroids = _farthest_point_init(df, k, id_col, vec_col)
    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast(centroids)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            acc_sum = np.zeros_like(c)
            acc_n = np.zeros(len(c), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                q = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
                nearest = (q @ c.T).argmax(axis=1)
                np.add.at(acc_sum, nearest, q)
                np.add.at(acc_n, nearest, 1)
            hit = np.nonzero(acc_n)[0]
            if hit.size:
                yield pd.DataFrame(
                    {
                        "cluster": hit.astype(np.int32),
                        "vsum": list(acc_sum[hit]),
                        "n": acc_n[hit],
                    }
                )

        # r12 (guide §2.3/§1.2): collect the per-partition partials
        # directly — ≤ k rows per partition, O(k·P) total — and merge on
        # the driver with one numpy pass. The former
        # groupBy(cluster).agg(zip_with-fold) added a full exchange +
        # per-element HOF evaluation per Lloyd iteration to reduce rows
        # the driver can trivially absorb (this collect is the same O(k)
        # driver-state contract as before, ×P partitions).
        rows = (
            df.select(vec_col)
            .mapInPandas(partials, "cluster int, vsum array<double>, n long")
            .collect()
        )
        sums = np.zeros_like(centroids)
        ns = np.zeros(len(centroids), dtype=np.int64)
        for row in rows:
            sums[row["cluster"]] += np.asarray(row["vsum"])
            ns[row["cluster"]] += row["n"]
        new = centroids.copy()  # empty clusters keep their centroid
        hit = np.nonzero(ns)[0]
        new[hit] = sums[hit] / ns[hit, None]
        centroids = _normalize(new)
        bc.destroy()
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest (cosine) centroid:
    ``(id, cluster, vector)``. One map stage, no shuffle."""
    bc = df.sparkSession.sparkContext.broadcast(_normalize(np.asarray(centroids)))
    return _assign_udf(df, bc, id_col, vec_col)


def semantic_dedup(
    df: DataFrame,
    centroids: Optional[np.ndarray] = None,
    k: int = 16,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_cap: int = 20_000,
) -> DataFrame:
    """Near-duplicate pairs ``(id_a, id_b, cosine)`` with ``cosine >=
    threshold``, searched only within k-means clusters (SemDeDup).

    Recall is bounded by clustering quality — a true pair split across two
    clusters is missed (SemDeDup accepts exactly this trade; raise k for
    tighter clusters or lower k for higher recall). Within each cluster
    the pair search is an exact blockwise GEMM over the cluster's Arrow
    batch. Clusters larger than ``cluster_cap`` raise: at that size the
    caller should re-fit with larger k rather than let one reducer
    quadratically dominate the stage.
    """
    if centroids is None:
        centroids = kmeans_fit(df, k, id_col, vec_col)
    assigned = kmeans_assign(df, centroids, id_col, vec_col)

    def pairs_of(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > cluster_cap:
            raise ValueError(
                f"cluster {key[0]} holds {n} vectors (> cluster_cap="
                f"{cluster_cap}); re-fit with larger k"
            )
        if n < 2:
            empty = pdf[id_col].iloc[:0]
            return pd.DataFrame(
                {"id_a": empty, "id_b": empty, "cosine": np.array([], dtype="f8")}
            )
        order = np.argsort(pdf[id_col].to_numpy())
        ids = pdf[id_col].to_numpy()[order]
        mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64)[order])
        sims = mat @ mat.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "id_a": ids[ia],
                "id_b": ids[ib],
                "cosine": np.round(sims[ia, ib], 4),
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    return assigned.groupBy("cluster").applyInPandas(
        pairs_of, f"id_a {id_type}, id_b {id_type}, cosine double"
    )


def embedding_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_bytes: Optional[int] = None,
) -> DataFrame:
    """Semantic decontamination: drop corpus rows whose embedding is
    within cosine ``threshold`` of ANY benchmark item — the
    embedding-space complement of the 13-gram
    :func:`..filters.decontaminate` (paraphrased benchmark leakage that
    n-gram matching misses).

    Plan: the BENCHMARK (eval sets are small — thousands of rows, never
    the corpus) broadcasts as one normalized matrix; the corpus scans
    once, each Arrow batch computes a blocked GEMM and keeps rows whose
    max similarity stays below threshold. No shuffle, no join. The
    broadcast is size-gated on the benchmark; past the bound the
    bucketed route is SemDeDup over the union
    (:func:`semantic_dedup_pairs`) with pairs filtered to
    corpus-vs-benchmark."""
    from .similarity import _guard_broadcast_bound

    _guard_broadcast_bound(
        benchmark,
        vec_col,
        op="embedding_decontaminate",
        alternative="clustering.semantic_dedup_pairs over the union, "
        "keeping only corpus-vs-benchmark pairs",
        max_broadcast_bytes=max_broadcast_bytes,
    )
    rows = benchmark.select(vec_col).collect()
    if not rows:  # empty eval set: nothing can contaminate
        return corpus
    mat = _normalize(np.array([r[0] for r in rows], dtype=np.float64))
    bc = corpus.sparkSession.sparkContext.broadcast(mat)

    def keep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bench = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            mx = (v @ bench.T).max(axis=1)
            yield pdf[mx < threshold]

    return corpus.mapInPandas(keep, corpus.schema)
