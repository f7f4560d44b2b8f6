"""CCNet-style LM quality scoring (operators/lmscore): Python-oracle
parity, planted language discrimination, determinism."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from pangeo_forge_recipes_spark.operators.lmscore import (
    quality_filter,
    score_cross_entropy,
    train_char_lm,
)

REF = [
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells by the sea shore",
    "the rain in spain stays mainly on the plain",
]


def _py_model(texts):
    c = Counter()
    for t in texts:
        b = t.encode()
        for i in range(len(b) - 2):
            c[(b[i] << 16) | (b[i + 1] << 8) | b[i + 2]] += 1
    return c


def _py_score(text, model, k=0.5):
    ctx = Counter()
    for tri, n in model.items():
        ctx[tri >> 8] += n
    b = text.encode()
    if len(b) < 3:
        return None
    logps = []
    for i in range(len(b) - 2):
        tri = (b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
        c = model.get(tri, 0)
        ct = ctx.get(tri >> 8, 0)
        logps.append(math.log2(c + k) - math.log2(ct + k * 256))
    return -sum(logps) / len(logps)


def test_lm_score_matches_python_oracle(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    docs = {
        1: "the quick brown dog",
        2: "zzqx jkvw pfft glarb",
        3: "sea shells on the plain",
        4: "ab",  # too short -> NULL
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    model = train_char_lm(ref)
    got = {
        r["doc_id"]: r["bits_per_char"]
        for r in score_cross_entropy(df, model).collect()
    }
    pym = _py_model(REF)
    for i, t in docs.items():
        want = _py_score(t, pym)
        if want is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(want, rel=1e-12), i
    # English-like text scores lower (more target-like) than gibberish
    assert got[1] < got[2] and got[3] < got[2]


def test_train_is_partitioning_invariant(spark):
    ref = spark.createDataFrame([(t,) for t in REF * 10], "text string")
    t1, c1 = train_char_lm(ref.repartition(2))
    t2, c2 = train_char_lm(ref.repartition(13))
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(c1, c2)


def test_quality_filter_keeps_target_like(spark):
    rng = np.random.RandomState(3)
    english = ["the cat sat on the mat and the dog ran in the park"] * 1
    ref = spark.createDataFrame(
        [(" ".join(rng.choice("the cat dog sat ran park mat on in and".split(), 12)),)
         for _ in range(50)],
        "text string",
    )
    rows = []
    for i in range(100):
        if i % 2 == 0:
            rows.append((i, " ".join(rng.choice(
                "the cat dog sat ran park mat on in and".split(), 10))))
        else:
            rows.append((i, "".join(rng.choice(list("zqxjkvwpfg"), 40))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = [r["doc_id"] for r in quality_filter(df, ref, keep_fraction=0.5).collect()]
    assert len(kept) >= 45  # ~half survive the median cut
    assert all(i % 2 == 0 for i in kept)  # only the target-like half


def test_perplexity_buckets_head_middle_tail(spark):
    """CCNet bucketing: reference-like docs land in head, junk in tail;
    labels partition the corpus at the requested terciles and agree with
    a Python recomputation from the scored bits_per_char."""
    from pangeo_forge_recipes_spark.operators.lmscore import (
        perplexity_buckets,
        score_cross_entropy,
        train_char_lm,
    )

    ref_rows = [(i, "the quick brown fox jumps over the lazy dog " * 3)
                for i in range(8)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    corpus_rows = (
        [(i, "the quick brown fox jumps over the dog") for i in range(4)]
        + [(10 + i, "a quick brown dog walks past the lazy fox") for i in range(4)]
        + [(20 + i, "zxq wvu tsr qpo nml kji hgf edc") for i in range(4)]
    )
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    out = perplexity_buckets(corpus, ref).collect()
    by_id = {r["doc_id"]: r for r in out}
    # junk must be tail, reference-like must be head
    assert all(by_id[20 + i]["ppl_bucket"] == "tail" for i in range(4))
    assert all(by_id[i]["ppl_bucket"] == "head" for i in range(4))
    # labels agree with a recomputation from the same scores
    import numpy as np

    model = train_char_lm(ref)
    scored = {
        r["doc_id"]: r["bits_per_char"]
        for r in score_cross_entropy(corpus, model).collect()
    }
    vals = sorted(scored.values())
    lo = float(np.percentile(vals, 100 / 3, method="linear"))
    hi = float(np.percentile(vals, 200 / 3, method="linear"))
    for i, b in scored.items():
        want = "head" if b <= lo else ("middle" if b <= hi else "tail")
        assert by_id[i]["ppl_bucket"] == want, (i, b, lo, hi)
