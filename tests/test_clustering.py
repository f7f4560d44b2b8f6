"""K-means embedding clustering + SemDeDup semantic dedup: determinism,
convergence toward planted structure, and recall vs the broadcast
exact near-dup operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)
from pangeo_forge_recipes_spark.operators.dedup import embedding_near_dup


def _planted_df(spark, n_per=40, k=4, dim=16, dup_every=10, seed=3):
    """k well-separated gaussian blobs; every dup_every-th vector is a
    jittered near-copy of its predecessor."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * 6
    rows, truth = [], []
    vid = 0
    for c in range(k):
        for i in range(n_per):
            if i % dup_every == dup_every - 1 and rows:
                base = np.array(rows[-1][1])
                v = base + rng.standard_normal(dim) * 0.005
                truth.append((rows[-1][0], vid))
            else:
                v = centers[c] + rng.standard_normal(dim) * 0.5
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "true_cluster"])
    return df.withColumn("embedding", F.col("embedding").cast("array<float>")), truth


def test_kmeans_deterministic_and_normalized(spark):
    df, _ = _planted_df(spark)
    c1 = kmeans_fit(df, k=4, n_iter=3)
    c2 = kmeans_fit(df, k=4, n_iter=3)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-9)


def test_kmeans_partition_invariant_partial_merge(spark):
    """r12: Lloyd partials are collected raw (≤ k rows per partition)
    and merged on the driver — the centroid fit must not depend on how
    the corpus is partitioned (different partial layouts, same sums up
    to float addition order)."""
    df, _ = _planted_df(spark)
    c1 = kmeans_fit(df.repartition(1), k=4, n_iter=4)
    c7 = kmeans_fit(df.repartition(7), k=4, n_iter=4)
    np.testing.assert_allclose(c1, c7, rtol=1e-9, atol=1e-12)


def test_kmeans_recovers_planted_blobs(spark):
    df, _ = _planted_df(spark)
    centroids = kmeans_fit(df, k=4, n_iter=5)
    assigned = kmeans_assign(df, centroids).join(
        df.select("vec_id", "true_cluster"), "vec_id"
    )
    # each learned cluster should be dominated by one true blob
    purity = (
        assigned.groupBy("cluster", "true_cluster")
        .count()
        .groupBy("cluster")
        .agg(F.max("count").alias("top"), F.sum("count").alias("n"))
        .agg(F.sum("top").alias("t"), F.sum("n").alias("n"))
        .collect()[0]
    )
    assert purity["t"] / purity["n"] >= 0.95


def test_semantic_dedup_finds_planted_pairs(spark):
    df, truth = _planted_df(spark)
    pairs = semantic_dedup(df, k=4, threshold=0.999).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(min(a, b), max(a, b)) for a, b in truth}
    # jittered copies sit in the same blob → all planted pairs recovered
    assert want <= got
    # any extra pair must be a genuine >= threshold cosine (blob-mates can
    # land that close by chance); verify against exact numpy ground truth
    rows = df.select("vec_id", "embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = np.array([r["vec_id"] for r in rows])
    sims = mat @ mat.T
    ia, ib = np.nonzero(np.triu(sims >= 0.999, k=1))
    exact = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(ia, ib)}
    assert got <= exact


def test_semantic_dedup_matches_broadcast_exact_within_clusters(spark):
    df, _ = _planted_df(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup(df, threshold=0.999).collect()
    }
    sem = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup(df, k=4, threshold=0.999).collect()
    }
    # SemDeDup recall bounded by clustering; on separable blobs it is total
    assert sem == exact


def test_cluster_cap_raises(spark):
    df, _ = _planted_df(spark)
    with pytest.raises(Exception, match="cluster_cap"):
        semantic_dedup(df, k=1, threshold=0.5, cluster_cap=10).collect()


def test_embedding_decontaminate(spark):
    """Corpus rows near a benchmark embedding drop; the rest survive
    untouched with the full input schema; the broadcast is size-gated."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators.clustering import (
        embedding_decontaminate,
    )

    rng = np.random.RandomState(5)
    bench_vecs = [rng.randn(16).astype("float32") for _ in range(3)]
    corpus_rows = []
    # ids 0-2: near-copies of benchmark items (tiny perturbation)
    for i, b in enumerate(bench_vecs):
        corpus_rows.append((i, (b + rng.randn(16).astype("float32") * 0.01).tolist(), "leak"))
    # ids 10-19: unrelated
    for i in range(10, 20):
        corpus_rows.append((i, rng.randn(16).astype("float32").tolist(), "clean"))
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<float>, tag string"
    )
    bench = spark.createDataFrame(
        [(100 + i, v.tolist()) for i, v in enumerate(bench_vecs)],
        "vec_id long, embedding array<float>",
    )
    kept = embedding_decontaminate(corpus, bench, threshold=0.9).collect()
    ids = {r["vec_id"] for r in kept}
    assert ids == set(range(10, 20))
    assert all(r["tag"] == "clean" for r in kept)  # schema passthrough
    # size gate engages on an over-bound benchmark
    import pytest as _pt

    with _pt.raises(ValueError, match="semantic_dedup_pairs"):
        embedding_decontaminate(corpus, bench, max_broadcast_bytes=8)


def test_embedding_decontaminate_empty_benchmark_is_noop(spark):
    import numpy as np

    from pangeo_forge_recipes_spark.operators.clustering import (
        embedding_decontaminate,
    )

    rng = np.random.RandomState(1)
    corpus = spark.createDataFrame(
        [(i, rng.randn(8).astype("float32").tolist()) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    empty = corpus.where("vec_id < 0")
    assert embedding_decontaminate(corpus, empty).count() == 5
