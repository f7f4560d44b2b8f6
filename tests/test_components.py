"""Connected components / dedup cluster resolution (large-star/small-star),
checked against an independent union-find oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.operators.components import (
    canonical_docs,
    connected_components,
    dedup_clusters,
)


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min id, matching connected_components' contract
    label = {}
    for i in n_ids:
        r = find(i)
        label.setdefault(r, min(j for j in n_ids if find(j) == r))
    return {i: label[find(i)] for i in n_ids}


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df).collect()
    return {r["id"]: r["component"] for r in out}


def test_large_star_output_already_canonical(spark):
    """r12 invariant behind dropping the per-round _canonical_edges
    pass: _large_star emits (u, v) with u > v strictly (v is a
    neighborhood minimum, so v ≤ old-u < old-v = new-u), no self-loops,
    no duplicates — re-canonicalizing it was a pure duplicate distinct."""
    import random as _random

    from pangeo_forge_recipes_spark.operators.components import (
        _canonical_edges,
        _large_star,
    )

    rng = _random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(150)]
    e = _canonical_edges(
        spark.createDataFrame(edges, ["src", "dst"]), "src", "dst"
    )
    rows = [(r["u"], r["v"]) for r in _large_star(e).collect()]
    assert all(u > v for u, v in rows)
    assert len(rows) == len(set(rows))


def test_chain_collapses_logarithmically(spark):
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(n)}


def test_two_components_and_orientation(spark):
    edges = [(5, 3), (3, 9), (20, 21), (21, 20), (9, 9)]
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    ids = list(range(200))
    edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    touched = sorted({v for e in edges for v in e})
    want = _union_find(touched, edges)
    assert got == want


def test_string_ids(spark):
    edges = [("doc_b", "doc_a"), ("doc_c", "doc_b"), ("doc_x", "doc_y")]
    got = _run(spark, edges)
    assert got == {
        "doc_a": "doc_a",
        "doc_b": "doc_a",
        "doc_c": "doc_a",
        "doc_x": "doc_x",
        "doc_y": "doc_x",
    }


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 4), (4, 6), (2, 3)], ["id_a", "id_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 5, 6: 1, 7: 7}


def test_canonical_docs_quality_ordering(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)], ["doc_id", "quality"]
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], ["doc_id", "cluster_id"]
    )
    got = canonical_docs(docs, clusters, order_col="quality")
    kept = sorted(r["doc_id"] for r in got.where("is_canonical").collect())
    assert kept == [2, 4]  # highest quality wins, doc_id breaks the 2-vs-3 tie
    assert got.count() == 4  # non-canonical rows retained (flagged)


def test_degenerate_clique_converges(spark):
    # one huge duplicate cluster: the LSH hot-bucket shape
    n = 60
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if (i + j) % 3 == 0]
    edges += [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, edges)
    assert set(got.values()) == {0} and len(got) == n
