"""Broadcast Bloom-filter incremental dedup (operators/bloom)."""

from __future__ import annotations

import numpy as np
import pytest

from pangeo_forge_recipes_spark.operators.bloom import (
    bloom_contains,
    bloom_params,
    build_bloom,
    dedup_against_reference,
)


def test_bloom_params_textbook_values():
    # n=1e6, p=0.01 -> m ~ 9.585e6 bits, k ~ 7 (standard formula values)
    m, k = bloom_params(1_000_000, 0.01)
    assert abs(m - 9_585_059) < 128  # rounded up to whole 64-bit words
    assert k == 7
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_build_and_contains(spark):
    ref = spark.createDataFrame(
        [(f"doc number {i}",) for i in range(500)], "text string"
    ).repartition(8)
    bits, m, k = build_bloom(ref, expected_items=500, fpp=0.001)
    # no false negatives, ever
    for i in range(500):
        assert bloom_contains(bits, m, k, f"doc number {i}")
    # false positives bounded (generous 10x margin on fpp=1e-3)
    fp = sum(
        bloom_contains(bits, m, k, f"absent text {i}") for i in range(2000)
    )
    assert fp <= 20


def test_scalar_path_matches_jvm_for_surrogates(spark):
    """Strings holding surrogate codepoints cross Python→JVM through
    Arrow as U+FFFD; the scalar `bloom_contains` path must hash the same
    bytes as the JVM-built filter — no false negatives even for junk
    unicode."""
    texts = [
        "ab\ud800cd",            # lone high surrogate
        "x\udfff",               # lone low surrogate
        "pair\ud83d\ude00end",  # surrogate pair written as two codepoints
        "astral 😀 direct",      # true astral codepoint (no surrogates)
        "clean ascii",
    ]
    ref = spark.createDataFrame([(t,) for t in texts], "text string")
    bits, m, k = build_bloom(ref, expected_items=10, fpp=0.001)
    for t in texts:
        assert bloom_contains(bits, m, k, t), repr(t)


def test_dedup_against_reference_end_to_end(spark):
    ref = spark.createDataFrame(
        [(i, f"shared text {i}") for i in range(300)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1000 + i, f"shared text {i}") for i in range(0, 300, 2)]  # 150 dups
        + [(2000 + i, f"fresh text {i}") for i in range(200)],
        "doc_id long, text string",
    )
    out = dedup_against_reference(corpus, ref, expected_items=300, fpp=1e-4)
    kept = sorted(r["doc_id"] for r in out.collect())
    # every duplicate dropped (no false negatives in a bloom filter)
    assert all(d >= 2000 for d in kept)
    # at fpp=1e-4 over 200 fresh docs, expect ~0 false drops
    assert len(kept) >= 199
    # schema passes through untouched
    assert out.schema == corpus.schema


def test_dedup_against_reference_no_shuffle_plan(spark):
    """Scale shape: the corpus side must be filtered map-side — no
    Exchange in the corpus plan (the whole point vs. an anti-join)."""
    ref = spark.createDataFrame([(f"r{i}",) for i in range(50)], "text string")
    corpus = spark.createDataFrame(
        [(i, f"c{i}") for i in range(100)], "doc_id long, text string"
    )
    out = dedup_against_reference(corpus, ref, expected_items=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bloom_deterministic_across_builds(spark):
    ref = spark.createDataFrame([(f"t{i}",) for i in range(100)], "text string")
    a = build_bloom(ref.repartition(2), expected_items=100)
    b = build_bloom(ref.repartition(7), expected_items=100)
    np.testing.assert_array_equal(a[0], b[0])
    assert a[1:] == b[1:]


def test_bloom_merge_levels_agree(spark):
    """r12: the direct-collect small build and the executor-merged large
    build (forced via a tiny driver_inbound_cap_bytes) produce the exact
    same bitmap — the scale-adaptive level is a pure transport choice."""
    ref = spark.createDataFrame(
        [(f"doc {i}",) for i in range(500)], "text string"
    ).repartition(6)
    direct = build_bloom(ref, expected_items=500)
    merged = build_bloom(ref, expected_items=500, driver_inbound_cap_bytes=1)
    np.testing.assert_array_equal(direct[0], merged[0])
    assert direct[1:] == merged[1:]
