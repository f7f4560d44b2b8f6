"""DSIR-style importance resampling (operators/dsir): Python-oracle
parity, planted-relevance behavior, determinism, plan shape."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

from pangeo_forge_recipes_spark.operators.dsir import (
    dsir_sample,
    hashed_ngram_counts,
    importance_weights,
)

B = 256
ALPHA = 1.0


def _py_ngrams(text: str):
    toks = [t for t in re.sub(r"[^A-Za-z0-9]+", " ", text).lower().split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _py_weights(raw, target):
    from collections import Counter

    p = Counter(_py_bucket(g) for t in target for g in _py_ngrams(t))
    q = Counter(_py_bucket(g) for t in raw.values() for g in _py_ngrams(t))
    p_tot, q_tot = sum(p.values()), sum(q.values())

    def lr(b):
        return math.log((p[b] + ALPHA) / (p_tot + ALPHA * B)) - math.log(
            (q[b] + ALPHA) / (q_tot + ALPHA * B)
        )

    return {
        i: sum(lr(_py_bucket(g)) for g in _py_ngrams(t))
        for i, t in raw.items()
    }


RAW = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "stock market prices rose sharply on tuesday trading",
    3: "the neural network model training converged quickly",
    4: "lorem ipsum dolor sit amet consectetur adipiscing elit",
    5: "gradient descent optimizes the model parameters iteratively",
    6: "",
}
TARGET = [
    "training neural network models with gradient descent",
    "the model parameters update during training iterations",
    "deep neural networks learn hierarchical features",
]


def test_importance_weights_match_python_oracle(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(raw, tgt, buckets=B, alpha=ALPHA).collect()
    }
    want = _py_weights(RAW, TARGET)
    for i in RAW:
        assert got[i] == pytest.approx(want[i], rel=1e-9), i
    # ML-flavored docs outrank the others against the ML target corpus
    assert got[3] > got[1] and got[5] > got[2] and got[3] > got[4]
    # empty doc gets the neutral weight
    assert got[6] == 0.0


def test_hashed_ngram_counts_shape(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    hist = hashed_ngram_counts(raw, buckets=B)
    rows = hist.collect()
    assert all(0 <= r["bucket"] < B for r in rows)
    total = sum(r["cnt"] for r in rows)
    assert total == sum(len(_py_ngrams(t)) for t in RAW.values())


def test_dsir_sample_deterministic_and_biased(spark):
    rng = np.random.RandomState(5)
    ml_words = ["model", "training", "network", "gradient", "neural", "layer"]
    other = ["market", "recipe", "football", "weather", "travel", "music"]
    rows = []
    for i in range(200):
        vocab = ml_words if i % 2 == 0 else other
        rows.append((i, " ".join(rng.choice(vocab, size=12))))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(" ".join(rng.choice(ml_words, size=12)),) for _ in range(30)],
        "text string",
    )
    s1 = sorted(r["doc_id"] for r in dsir_sample(raw, tgt, 40, buckets=B).collect())
    s2 = sorted(r["doc_id"] for r in dsir_sample(raw, tgt, 40, buckets=B).collect())
    assert s1 == s2  # deterministic resample
    ml_frac = sum(1 for i in s1 if i % 2 == 0) / len(s1)
    assert ml_frac > 0.9  # overwhelmingly target-like docs selected


def test_importance_weights_plan_shape(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    plan = (
        importance_weights(raw, tgt, buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # r12: scoring is a pure map over a literal log-ratio array — no
    # join, no exchange, and the n-gram pipeline stays JVM-side
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
