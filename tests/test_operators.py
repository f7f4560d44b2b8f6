"""Semantic tests for the extension operators: do the dedupers actually
find duplicates, does LSH-ANN approximate brute force, does the multimodal
plumbing hold its schemas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "a completely different document about spark query engines and shuffles",
        "numpy arrays and pandas frames power the modern python data stack",
        "streaming watermarks handle late data in event time processing",
    ]
    rows = []
    doc_id = 0
    for text_ in base:
        rows.append((doc_id, text_))
        doc_id += 1
    # exact duplicate of doc 0
    rows.append((100, base[0]))
    # near-duplicate of doc 0 (one word changed)
    rows.append((101, base[0].replace("lazy", "sleepy")))
    # near-duplicate of doc 1 (word swapped)
    rows.append((102, base[1].replace("shuffles", "joins")))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).collect()
    groups = {r["doc_id"]: r["n_copies"] for r in out}
    assert groups[0] == 2  # doc 0 + its copy 100
    assert sum(r["n_copies"] for r in out) == 7
    assert len(out) == 6  # 7 docs, one exact pair


def test_minhash_dedup_finds_near_dups(docs):
    pairs = dedup.minhash_dedup(docs, threshold=0.5, bands=16, num_perm=64).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in found  # exact dup → jaccard 1.0
    assert (0, 101) in found  # near dup
    assert (1, 102) in found
    # unrelated docs must not pair
    assert not any({a, b} <= {0, 1, 2, 3} for a, b in found)
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 100)] == 1.0
    assert 0.5 <= jac[(0, 101)] < 1.0


def test_minhash_bands_consistent_with_signatures(docs):
    # band-hash collisions must correspond exactly to equality of the
    # published signature bands — one hash family across both functions
    num_perm, bands = 64, 16
    per_band = num_perm // bands
    sigs = {
        r["doc_id"]: r["signature"]
        for r in dedup.minhash_signatures(docs, num_perm=num_perm).collect()
    }
    bh = {}
    for r in dedup.minhash_band_hashes(docs, num_perm=num_perm, bands=bands).collect():
        bh[(r["doc_id"], r["band"])] = r["band_hash"]
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            for band in range(bands):
                sig_eq = (
                    sigs[a][band * per_band : (band + 1) * per_band]
                    == sigs[b][band * per_band : (band + 1) * per_band]
                )
                assert (bh[(a, band)] == bh[(b, band)]) == sig_eq, (a, b, band)


def test_simhash_dedup(docs):
    pairs = dedup.simhash_dedup(docs, max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in found
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert ham[(0, 100)] == 0


def test_ngram_signature_dedup(docs):
    out = dedup.ngram_signature_dedup(docs).collect()
    # the exact pair shares a rolling fingerprint
    by_id = {r["doc_id"]: r["n_members"] for r in out}
    assert by_id[0] >= 2


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(0)
    base = rng.standard_normal((40, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(40)]
    # vector 100 = near-copy of vector 0
    rows.append((100, (base[0] + 0.01 * rng.standard_normal(16).astype("float32")).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(vectors):
    out = similarity.brute_force_topk(vectors, vectors, k=1).collect()
    top = {r["vec_id"]: (r["neighbor_id"], r["cosine"]) for r in out}
    assert top[0][0] == 100 and top[0][1] > 0.99
    assert top[100][0] == 0


def test_brute_force_topk_k_exceeds_corpus(spark):
    rows = [(i, [float(i), 1.0]) for i in range(3)]
    small = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k larger than the corpus: results cap at the available candidates
    out = similarity.brute_force_topk(small, small, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {0, 1, 2}
    for q, neighbors in by_q.items():
        assert len(neighbors) == 2  # 3 candidates minus self
        assert q not in neighbors  # the -inf-masked self never leaks out


def test_embedding_near_dup(vectors):
    pairs = dedup.embedding_near_dup(vectors, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100)}


def test_broadcast_exact_tiers_size_gated(vectors):
    # over-bound: each broadcast-exact tier raises up front, naming the
    # bucketed alternative, instead of collecting the corpus (41 rows x
    # 16 elems x 8 B = 5248 B float estimate; PQ: 41 x m x 4 B codes)
    with pytest.raises(ValueError, match="ivf_topk"):
        similarity.brute_force_topk(vectors, vectors, k=1, max_broadcast_bytes=1024)
    with pytest.raises(ValueError, match="semantic_dedup_pairs"):
        dedup.embedding_near_dup(vectors, threshold=0.95, max_broadcast_bytes=1024)
    with pytest.raises(ValueError, match="ivf_topk"):
        similarity.pq_topk(vectors, k=1, m=8, nbits=4, max_broadcast_bytes=64)
    # under-bound (explicit generous bound): identical results to ungated
    out = similarity.brute_force_topk(
        vectors, vectors, k=1, max_broadcast_bytes=1 << 20
    ).collect()
    top = {r["vec_id"]: r["neighbor_id"] for r in out}
    assert top[0] == 100 and top[100] == 0
    # bound<=0 skips the estimate job entirely (caller asserts fit)
    pairs = dedup.embedding_near_dup(
        vectors, threshold=0.95, max_broadcast_bytes=0
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100)}


def test_estimate_collect_bytes(vectors):
    rows, width, est = similarity.estimate_collect_bytes(vectors, "embedding")
    assert (rows, width, est) == (41, 16, 41 * 16 * 8)
    rows, width, est = similarity.estimate_collect_bytes(
        vectors, "embedding", bytes_per_elem=1, elems=8
    )
    assert (rows, width, est) == (41, 8, 41 * 8)


def test_lsh_ann_recall(vectors):
    exact = similarity.brute_force_topk(vectors, vectors, k=1).collect()
    approx = similarity.lsh_ann_topk(vectors, k=1, nbits=4).collect()
    exact_nn = {r["vec_id"]: r["neighbor_id"] for r in exact}
    approx_nn = {r["vec_id"]: r["neighbor_id"] for r in approx}
    # near-identical pair lands in the same bucket → recalled
    assert approx_nn.get(0) == exact_nn[0] == 100
    # overall recall: random gaussian vectors have no cluster structure, so
    # single-table 4-bit LSH recall is modest by construction — assert it
    # beats the random-guess floor (1/40), not a tuned ANN benchmark
    hits = sum(1 for q, n in approx_nn.items() if exact_nn.get(q) == n)
    assert hits / max(len(approx_nn), 1) > 0.1


def test_lsh_ann_hot_bucket_cap(spark):
    # 60 identical (same-bucket-by-construction) vectors + 2 distinct ones:
    # with bucket_cap=10 the degenerate bucket's candidate side is capped at
    # the 10 smallest ids, so candidate volume is O(cap × n), not O(n²)
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(60)]
    rows += [(100, [0.0, 1.0, 0.0]), (101, [0.0, 1.0, 0.01])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.lsh_ann_topk(df, k=5, nbits=4, bucket_cap=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    # every hot-bucket member still gets results, drawn only from the
    # 10 smallest-id representatives (minus self)
    for q in range(60):
        assert by_q[q] <= set(range(10)) - {q}
        assert len(by_q[q]) == 5
    # total candidate volume is bounded: ≤ cap neighbors per query
    assert all(len(v) <= 10 for v in by_q.values())
    # the small bucket is untouched by the cap
    assert 101 in by_q.get(100, set()) or 100 in by_q.get(101, set())


def test_lsh_ann_plan_carries_vector_no_id_join(vectors):
    """r12: bucket assignment carries the vector through the Python
    scan, so the plan has no corpus⋈buckets equi-join on the id — the
    only join left is the bucket-keyed candidate meet."""
    plan = (
        similarity.lsh_ann_topk(vectors, k=2, nbits=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one join survives — the l⋈r bucket meet (keyed by bucket,
    # the shuffle the candidate generation fundamentally needs); the
    # former corpus⋈buckets id join is gone
    n_joins = sum(
        plan.count(j)
        for j in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin")
    )
    assert n_joins == 1


def test_lsh_ann_cap_default_no_effect(vectors):
    # default cap (1000) must not change results on a normal corpus
    a = similarity.lsh_ann_topk(vectors, k=2, nbits=4).collect()
    b = similarity.lsh_ann_topk(vectors, k=2, nbits=4, bucket_cap=10**6).collect()
    key = lambda r: (r["vec_id"], r["rank"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivf_assign(vectors):
    out = similarity.ivf_assign(vectors, n_centroids=4).collect()
    assert len(out) == 41
    assert all(0 <= r["centroid"] < 4 for r in out)
    # the near-dup pair quantizes to the same centroid
    cent = {r["vec_id"]: r["centroid"] for r in out}
    assert cent[0] == cent[100]


def test_ivf_topk(vectors):
    exact = similarity.brute_force_topk(vectors, vectors, k=1).collect()
    approx = similarity.ivf_topk(vectors, k=1, nprobe=2, n_centroids=4).collect()
    exact_nn = {r["vec_id"]: r["neighbor_id"] for r in exact}
    approx_nn = {r["vec_id"]: r["neighbor_id"] for r in approx}
    # the near-dup pair shares a centroid list → always recalled
    assert approx_nn.get(0) == exact_nn[0] == 100
    # probing 2/4 lists must beat the random floor comfortably
    hits = sum(1 for q, n in approx_nn.items() if exact_nn.get(q) == n)
    assert hits / max(len(approx_nn), 1) > 0.3


def test_multimodal_pipeline(spark, docs):
    media = multimodal.attach_fake_media(docs)
    assert media.columns == ["doc_id", "media", "format", "width", "height", "n_frames"]
    decoded = multimodal.decode_image(media)
    feats = multimodal.extract_features(decoded, dim=16).collect()
    assert len(feats) == 7
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic: same payload → same features
    by_id = {r["doc_id"]: list(r["features"]) for r in feats}
    assert by_id[0] == by_id[100]
    frames = multimodal.sample_frames(media, every=2).collect()
    assert len(frames) > len(feats)  # multiple frames per doc
    stats = multimodal.media_stats(media).collect()
    assert stats[0]["n_blobs"] == 7 and stats[0]["distinct_blobs"] == 6


def test_decode_image_corrupt_jpeg_raises(spark, docs):
    # JPEG decodes for real now — a truncated/corrupt payload must fail
    # loudly (wrapped in the Spark PythonException), not fall to the stub
    jpeg = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0 not really a jpeg"))],
        "doc_id long, media binary",
    )
    with pytest.raises(Exception, match="corrupt JPEG|marker"):
        multimodal.decode_image(jpeg).collect()


def test_decode_image_real_jpeg(spark, docs):
    """JPEG payloads decode for REAL (jpegio baseline DCT): decoded
    pixels match the closed-form source image within quantization
    error."""
    media = multimodal.attach_jpeg_media(docs, width=16, height=16)
    rows = multimodal.decode_image(media).collect()
    assert len(rows) == 7
    yy, xx = np.mgrid[0:16, 0:16]
    for r in rows:
        want = (128 + 60 * np.sin((xx + r["doc_id"]) / 5.0) * np.cos(yy / 4.0)).astype(
            np.uint8
        )
        got = np.array(r["pixels"]).reshape(16, 16) * 255.0
        assert np.abs(got - want).max() <= 6.0


def test_decode_image_real_png(spark, docs):
    """PNG payloads decode for REAL (pngio zlib+unfilter), not via the
    sha stub: decoded pixels equal the closed-form pixel formula."""
    media = multimodal.attach_png_media(docs, width=16, height=8)
    rows = multimodal.decode_image(media).collect()
    assert len(rows) == 7
    idx = np.arange(128, dtype=np.int64)
    for r in rows:
        want = ((r["doc_id"] * 31 + idx * 7) % 256) / 255.0
        np.testing.assert_allclose(np.array(r["pixels"]), want, rtol=1e-6)


def test_text_operators(spark, docs):
    out = text.with_fingerprints(
        text.with_lang_id(text.with_quality(text.with_token_counts(docs)))
    ).collect()
    r0 = next(r for r in out if r["doc_id"] == 0)
    assert r0["token_count"] == 14
    assert 0.0 <= r0["quality_score"] <= 1.0
    assert r0["pred_lang"] == "en"  # 'the' ×2, 'and'
    r100 = next(r for r in out if r["doc_id"] == 100)
    assert r100["fingerprint"] == r0["fingerprint"]
    assert r100["rolling_fingerprint"] == r0["rolling_fingerprint"]


def test_deterministic_split(spark, docs):
    out1 = {r["doc_id"]: r["split"] for r in text.with_split(docs).collect()}
    out2 = {
        r["doc_id"]: r["split"]
        for r in text.with_split(docs.repartition(5)).collect()
    }
    assert out1 == out2  # stable under repartitioning, unlike rand()
    assert set(out1.values()) <= {"train", "val", "test"}
    # identical ids land in identical splits on every run
    assert out1 == {r["doc_id"]: r["split"] for r in text.with_split(docs).collect()}


def test_bigram_counts(spark, docs):
    out = {r["bigram"]: r["n"] for r in text.bigram_counts(docs, k=50).collect()}
    # 'the quick' appears in doc 0, its exact copy 100, and near-dup 101
    assert out["the quick"] == 3
    assert out["quick brown"] == 3
    # one-token docs produce no bigrams; none contain a null
    assert all(b and " " in b for b in out)


def test_asof_join(spark):
    from pangeo_forge_recipes_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 10, "e")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 30, 300.0)],
        "k long, t long, rv double",
    )
    out = {
        (r["k"], r["t"]): (r["rv"], r["asof_t"])
        for r in asof_join(left, right, by="k", left_on="t", right_on="t").collect()
    }
    assert out[(1, 10)] == (100.0, 10)   # equal timestamp matches (backward)
    assert out[(1, 20)] == (150.0, 15)   # most recent prior
    assert out[(1, 5)] == (None, None)   # nothing prior
    assert out[(2, 10)] == (None, None)  # right row is in the future
    assert out[(3, 10)] == (None, None)  # key has no right rows

    strict = {
        (r["k"], r["t"]): r["rv"]
        for r in asof_join(
            left, right, by="k", left_on="t", right_on="t", strict=True
        ).collect()
    }
    assert strict[(1, 10)] is None       # strict excludes the equal match
    assert strict[(1, 20)] == 150.0

    # explicit right_cols=[] means "attach only asof_<right_on>", not "all"
    bare = asof_join(left, right, by="k", left_on="t", right_on="t", right_cols=[])
    assert bare.columns == ["k", "t", "lv", "asof_t"]


def test_salted_join_matches_plain_join(spark):
    from pangeo_forge_recipes_spark.operators.skew import salted_join

    # one hot key (90% of rows) + a key with no right match
    left = spark.createDataFrame(
        [(1 if i < 90 else i % 7, i) for i in range(100)], "k long, v long"
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(5)], "k long, rv string")
    for how in ("inner", "left"):
        plain = sorted(
            (r["k"], r["v"], r["rv"]) for r in left.join(right, "k", how).collect()
        )
        salted = sorted(
            (r["k"], r["v"], r["rv"])
            for r in salted_join(left, right, "k", salt=8, how=how).collect()
        )
        assert salted == plain, how
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full")


def test_range_join_binned(spark):
    from pangeo_forge_recipes_spark.operators.ranges import range_join
    from pangeo_forge_recipes_spark.plans import explain_string

    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 50, 150, 250, 995])],
        "pid long, t double",
    )
    intervals = spark.createDataFrame(
        [(0, 0.0, 100.0), (1, 40.0, 60.0), (2, 900.0, 1000.0), (3, 100.0, 150.0)],
        "iid long, lo double, hi double",
    )
    out = range_join(
        points, intervals, left_on="t", right_lo="lo", right_hi="hi",
        bin_size_seconds=100,
    )
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    # brute-force expectation with half-open [lo, hi)
    expect = {
        (p["pid"], i["iid"])
        for p in points.collect()
        for i in intervals.collect()
        if i["lo"] <= p["t"] < i["hi"]
    }
    assert pairs == expect
    # the whole point: an equi-join plan, never a nested loop
    assert "BroadcastNestedLoopJoin" not in explain_string(out, "simple")


def test_simhash_vectorized_matches_scalar_reference(docs):
    """Regression pin: the batched FNV+reduceat implementation must emit
    bit-identical signatures to the straightforward per-token algorithm."""

    def scalar_simhash(text):
        votes = np.zeros(64, dtype=np.int64)
        for tok in text.lower().split():
            h = 0xCBF29CE484222325
            for c in tok.encode("utf-8", "ignore"):
                h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += np.where(bits == 1, 1, -1)
        sig = int(
            ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
        )
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    rows = docs.collect()
    expected = {r["doc_id"]: scalar_simhash(r["text"]) for r in rows}
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(docs).collect()
    }
    assert got == expected
    # empty / whitespace-only docs produce signature 0 (no votes)
    empty = docs.sparkSession.createDataFrame(
        [(0, ""), (1, "   "), (2, "one")], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(empty).collect()}
    assert sigs[0] == 0 and sigs[1] == 0 and sigs[2] != 0


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """5000 copies of one document: the capped candidate path must emit a
    star (O(N) pairs to the min-id representative), not the O(N²)
    self-join, while normal-size buckets keep exact pair enumeration."""
    n = 5000
    rows = [(i, "identical text repeated everywhere in this degenerate corpus") for i in range(n)]
    rows += [(10_000, "another doc entirely"), (10_001, "another doc entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    banded = dedup.minhash_band_hashes(df, num_perm=16, bands=4)
    cand = dedup.minhash_lsh_candidates(banded, bucket_cap=100)
    pairs = cand.collect()
    # star: every degenerate member pairs with representative 0 only
    big = [(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] < 10_000]
    assert len(big) == n - 1
    assert all(a == 0 for a, _ in big)
    # the small bucket still enumerates its exact pair
    assert (10_000, 10_001) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_minhash_candidates_match_bruteforce_buckets(spark):
    """r12 restructure guard: the window/collect_list candidate engine
    must emit EXACTLY the pairs the bucket definition implies — for
    every (band, band_hash) bucket, all ordered pairs when the bucket is
    at or under the cap, the min-id star otherwise — deduped across
    bands."""
    rng = np.random.RandomState(3)
    vocab = ["alpha", "beta", "gamma", "delta", "spark", "query", "data"]
    rows = [
        (i, " ".join(rng.choice(vocab, size=8))) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    banded = dedup.minhash_band_hashes(df, num_perm=16, bands=4)
    cap = 5
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(banded, bucket_cap=cap).collect()
    }
    buckets: dict = {}
    for r in banded.collect():
        buckets.setdefault((r["band"], r["band_hash"]), []).append(r["doc_id"])
    want = set()
    for ids in buckets.values():
        ids = sorted(ids)
        if len(ids) <= cap:
            want.update(
                (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
            )
        else:
            want.update((ids[0], b) for b in ids[1:])
    assert got == want


def test_minhash_candidates_plan_has_no_join(spark):
    """r12: candidates come from one window + same-key groupBy over a
    single (band, band_hash) exchange — never a self-join of the banded
    table (the pre-r12 shape shuffled it three extra times)."""
    df = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(30)], "doc_id long, text string"
    )
    banded = dedup.minhash_band_hashes(df, num_perm=16, bands=4)
    plan = (
        dedup.minhash_lsh_candidates(banded)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_ivf_centroids_sampled_distributed(vectors):
    """Centroid selection must plan as a distributed partial top-k
    (TakeOrderedAndProject), never a full-corpus collect."""
    from pyspark.sql import functions as F

    plan = (
        vectors.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # and the sampled-centroid IVF still assigns every vector
    out = similarity.ivf_assign(vectors, n_centroids=4).collect()
    assert len(out) == vectors.count()
    assert {r["centroid"] for r in out} <= set(range(4))


def test_mix_corpora_deterministic_proportions(spark):
    from pangeo_forge_recipes_spark.operators.text import mix_corpora

    a = spark.createDataFrame([(i, f"a{i}") for i in range(200)], "doc_id long, text string")
    b = spark.createDataFrame([(1000 + i, f"b{i}") for i in range(200)], "doc_id long, text string")
    c = spark.createDataFrame([(2000 + i, f"c{i}") for i in range(50)], "doc_id long, text string")
    mix = mix_corpora([("web", a, 0.6), ("code", b, 0.3), ("papers", c, 0.1)], 100)
    rows = mix.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(rows) == 100
    assert len(by_src["web"]) == 60 and len(by_src["code"]) == 30 and len(by_src["papers"]) == 10
    # deterministic across invocations
    again = mix_corpora([("web", a, 0.6), ("code", b, 0.3), ("papers", c, 0.1)], 100)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(r["doc_id"] for r in rows)
    # largest-remainder rounding: weights that do not divide n_total
    odd = mix_corpora([("x", a, 1), ("y", b, 1), ("z", c, 1)], 100)
    counts = sorted(
        len([r for r in odd.collect() if r["source"] == s]) for s in ("x", "y", "z")
    )
    assert sum(counts) == 100 and counts == [33, 33, 34]


def test_ivf_plan_single_scan_no_join(vectors):
    """The fused IVF plan: ONE mapInPandas over the corpus (corpus +
    probe roles in a single Arrow crossing), one applyInPandas per
    centroid list, and NO join — the candidate pairing happens inside
    the grouped GEMM, so the only exchanges are the groupBy and the
    final per-query window."""
    plan = (
        similarity.ivf_topk(vectors, k=2, nprobe=2, n_centroids=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "Join" not in plan


def test_bloom_probe_plan_no_join_no_shuffle(spark, docs):
    """The Bloom probe side stays map-only: JVM md5 + broadcast bitmap
    membership — no join, no exchange on the corpus."""
    from pangeo_forge_recipes_spark.operators.bloom import (
        dedup_against_reference,
    )

    ref = docs.select(F.col("text"))
    out = dedup_against_reference(docs, ref, expected_items=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_resize_images_bilinear_and_nearest(spark, docs):
    """resize_images: batched PNG path, numpy-oracle parity for both
    methods, identity resize returns the input grid."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators import multimodal
    from pangeo_forge_recipes_spark.operators.multimodal import (
        _resize_plane_batch,
    )

    media = multimodal.attach_png_media(docs, width=16, height=8)
    # identity resize reproduces the decoded pixels exactly
    same = multimodal.resize_images(media, out_w=16, out_h=8).collect()
    dec = {r["doc_id"]: np.asarray(r["pixels"]) for r in
           multimodal.decode_image(media).collect()}
    for r in same:
        np.testing.assert_allclose(
            np.asarray(r["pixels"]), dec[r["doc_id"]], atol=1e-6
        )
        assert (r["width"], r["height"]) == (16, 8)
    # numpy-oracle parity on the known closed-form pixels
    for method in ("nearest", "bilinear"):
        out = {
            r["doc_id"]: np.asarray(r["pixels"], dtype="float64")
            for r in multimodal.resize_images(
                media, out_w=5, out_h=3, method=method
            ).collect()
        }
        for doc_id, got in out.items():
            i = np.arange(16 * 8)
            plane = ((doc_id * 31 + i * 7) % 256).reshape(8, 16).astype("float64")
            want = _resize_plane_batch(plane[None], 3, 5, method)[0] / 255.0
            np.testing.assert_allclose(got.reshape(3, 5), want, atol=1e-6)


def test_resize_images_multi_method_one_pass_matches(spark, docs):
    """r12: methods=(...) decodes once and must emit exactly the union
    of the per-method outputs (same ids, same pixels, same dims)."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators import multimodal

    media = multimodal.attach_png_media(docs, width=16, height=8)
    multi = multimodal.resize_images(
        media, out_w=5, out_h=3, methods=("bilinear", "nearest")
    ).collect()
    assert multi and multi[0].__fields__[0] == "method"
    got = {
        (r["method"], r["doc_id"]): np.asarray(r["pixels"]) for r in multi
    }
    for method in ("bilinear", "nearest"):
        single = multimodal.resize_images(
            media, out_w=5, out_h=3, method=method
        ).collect()
        assert {r["doc_id"] for r in single} == {
            d for m, d in got if m == method
        }
        for r in single:
            np.testing.assert_array_equal(
                got[(method, r["doc_id"])], np.asarray(r["pixels"])
            )


def test_resize_plane_batch_properties():
    """The resize kernel itself: nearest integer upscale is a kron
    expansion; bilinear 2x midpoint interpolates neighbor means;
    constant images stay constant under both methods."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators.multimodal import (
        _resize_plane_batch,
    )

    rng = np.random.RandomState(8)
    a = rng.uniform(0, 255, (3, 4, 6))
    up = _resize_plane_batch(a, 8, 12, "nearest")
    np.testing.assert_array_equal(up, np.kron(a, np.ones((1, 2, 2))))
    const = np.full((2, 5, 7), 42.0)
    for m in ("nearest", "bilinear"):
        np.testing.assert_allclose(
            _resize_plane_batch(const, 9, 11, m), np.full((2, 9, 11), 42.0)
        )
    # bilinear 1-D sanity: doubling a 2-px row puts the inner samples
    # 25/75% between the endpoints (align_corners=False convention)
    row = np.array([[[0.0, 100.0]]])
    out = _resize_plane_batch(row, 1, 4, "bilinear")[0, 0]
    np.testing.assert_allclose(out, [0.0, 25.0, 75.0, 100.0])
    import pytest as _p

    with _p.raises(ValueError, match="resize method"):
        _resize_plane_batch(const, 4, 4, "cubic")


def test_pq_topk_recall_and_determinism(spark):
    """Product quantization: ADC self-search recalls the planted nearest
    neighbors on separable blobs, codebooks/codes are deterministic, and
    pq_encode emits m small codes per vector."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators import similarity

    rng = np.random.RandomState(12)
    dim, m, nbits = 32, 8, 4
    centers = rng.standard_normal((6, dim)) * 5
    rows = []
    for i in range(180):
        v = centers[i % 6] + rng.standard_normal(dim) * 0.6
        rows.append((i, [float(x) for x in v]))
    # planted exact twin pairs
    rows.append((900, rows[0][1]))
    rows.append((901, rows[1][1]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = similarity.pq_train(vecs, m=m, nbits=nbits, sample_size=256)
    assert books.shape == (m, 1 << nbits, dim // m)
    np.testing.assert_array_equal(
        books, similarity.pq_train(vecs, m=m, nbits=nbits, sample_size=256)
    )
    enc = similarity.pq_encode(vecs, books).collect()
    assert all(len(r["codes"]) == m for r in enc)
    assert all(0 <= c < (1 << nbits) for r in enc for c in r["codes"])

    # exact twins quantize to IDENTICAL codes (the PQ invariant — rank-1
    # recall of a specific twin is not guaranteed under coarse codebooks,
    # same-code neighbors tie at reconstruction level)
    by_id = {r["vec_id"]: list(r["codes"]) for r in enc}
    assert by_id[900] == by_id[0] and by_id[901] == by_id[1]

    approx = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.pq_topk(vecs, k=1, m=m, nbits=nbits).collect()
    }
    # blob-level recall: the approximate top-1 must land in the query's
    # own blob almost always (blob of id i is i % 6; twins map back)
    def blob(i):
        return (i - 900) % 6 if i >= 900 else i % 6

    same_blob = sum(1 for q, nb in approx.items() if blob(q) == blob(nb))
    assert same_blob / len(approx) > 0.9
    # and determinism of the whole search
    again = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.pq_topk(vecs, k=1, m=m, nbits=nbits).collect()
    }
    assert again == approx


def test_ann_topk_auto_dispatch(vectors):
    # under the bound: exact tier (matches brute force bit-for-bit)
    exact = similarity.brute_force_topk(vectors, vectors, k=1).collect()
    auto = similarity.ann_topk_auto(vectors, k=1, max_broadcast_bytes=1 << 20).collect()
    assert {(r["vec_id"], r["neighbor_id"]) for r in auto} == {
        (r["vec_id"], r["neighbor_id"]) for r in exact
    }
    assert auto[0].__fields__ == ["vec_id", "neighbor_id", "rank", "score"]
    # over the bound: routes to IVF (still finds the planted near-copy)
    routed = similarity.ann_topk_auto(
        vectors, k=1, max_broadcast_bytes=64, n_centroids=4, nprobe=2
    ).collect()
    nn = {r["vec_id"]: r["neighbor_id"] for r in routed}
    assert nn[0] == 100 and nn[100] == 0


def test_simhash_hot_bucket_star_fallback(spark):
    # 40 identical docs: every band bucket is degenerate. With a tiny
    # bucket_cap the star path pairs each member with the min-id rep
    # only — O(cap x n) candidates, connectivity preserved
    rows = [(i, "same exact text repeated for everyone here") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.simhash_dedup(df, max_hamming=0, bucket_cap=10).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert pairs == {(0, i) for i in range(1, 40)}  # star around min id
    assert all(r["hamming"] == 0 for r in out)


def test_ivf_pq_topk_recall_and_consistency(spark):
    """IVF x PQ: recalls the planted near-copy, agrees with full-scan PQ
    where the probed lists cover the true neighbor, and never emits a
    self-pair. Uses a clustered corpus (IVF's recall story needs
    structure; random gaussians have none)."""
    rng = np.random.RandomState(2)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(60):
        c = centers[i % 4]
        rows.append((i, (c + 0.3 * rng.standard_normal(16)).astype("float32").tolist()))
    base0 = np.array(rows[0][1], dtype="float32")
    rows.append((100, (base0 + 0.01 * rng.standard_normal(16).astype("float32")).tolist()))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = similarity.ivf_pq_topk(vecs, k=1, nprobe=4, n_centroids=8, m=8, nbits=4).collect()
    assert all(r["vec_id"] != r["neighbor_id"] for r in out)
    assert all(r["rank"] == 1 for r in out)
    assert len(out) == 61  # every vector got an answer
    # the right oracle for this tier is FULL-SCAN PQ (the approximation
    # comes from the codes, not the lists): with nprobe covering every
    # list, IVF x PQ must agree with pq_topk EXACTLY — same codes, same
    # LUT scores, same tie-breaks
    from pangeo_forge_recipes_spark.operators.similarity import pq_train

    books = pq_train(vecs, m=8, nbits=4)
    full = {
        r["vec_id"]: (r["neighbor_id"], r["score"])
        for r in similarity.pq_topk(vecs, k=1, m=8, nbits=4, codebooks=books).collect()
    }
    ivf = {
        r["vec_id"]: (r["neighbor_id"], r["score"])
        for r in similarity.ivf_pq_topk(
            vecs, k=1, nprobe=8, n_centroids=8, m=8, nbits=4, codebooks=books
        ).collect()
    }
    assert set(ivf) == set(full)
    for q in ivf:
        assert ivf[q][0] == full[q][0], q
        assert abs(ivf[q][1] - full[q][1]) < 1e-9
    # at nprobe=4 (half the lists), recall vs full-scan PQ stays high on
    # clustered data — the IVF premise
    part = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.ivf_pq_topk(
            vecs, k=1, nprobe=4, n_centroids=8, m=8, nbits=4, codebooks=books
        ).collect()
    }
    hits = sum(1 for q in part if part[q] == full[q][0])
    assert hits >= 0.8 * len(full)


def test_stratified_sample_exact_and_dual_engine(spark):
    """Exact per-stratum counts, repartition-invariance, and a DuckDB
    replication of the md5 order (dual-engine determinism)."""
    import duckdb
    import os

    from pangeo_forge_recipes_spark.operators.text import stratified_sample

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    doc_path = os.path.join(sf, "documents.parquet")
    docs = spark.read.parquet(doc_path)
    out = stratified_sample(docs, "lang", n_per_stratum=7)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(7, sizes[lang])
    got = sorted(r["doc_id"] for r in out.collect())
    got2 = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(9), "lang", n_per_stratum=7).collect()
    )
    assert got == got2
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""
        SELECT doc_id FROM (
          SELECT doc_id, ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
          ) AS rk FROM read_parquet('{doc_path}')
        ) WHERE rk <= 7
        """
        ).fetchall()
    )
    assert got == want
    # fractions variant: exact ceil(f * size) per stratum
    out_f = stratified_sample(
        docs, "lang", fractions={k: 0.1 for k in sizes}
    )
    cf = {r["lang"]: r["n"] for r in out_f.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    import math

    for lang, n in cf.items():
        # round-before-ceil: 30*0.1 must quota 3, not 4 (IEEE 3.0000…4)
        assert n == math.ceil(round(0.1 * sizes[lang], 9))
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang")
    # non-string strata column (review regression): int strata work
    df_int = docs.withColumn("bucket", (F.col("doc_id") % 3).cast("int"))
    out_i = stratified_sample(df_int, "bucket", fractions={0: 0.1, 1: 0.2, 2: 0.3})
    got_i = {r["bucket"]: r["n"] for r in out_i.groupBy("bucket").agg(
        F.count("*").alias("n")).collect()}
    sizes_i = {r["bucket"]: r["n"] for r in df_int.groupBy("bucket").agg(
        F.count("*").alias("n")).collect()}
    for b, f in ((0, 0.1), (1, 0.2), (2, 0.3)):
        assert got_i[b] == math.ceil(round(f * sizes_i[b], 9))


def test_minhash_verify_jaccard_matches_numpy(docs):
    """r13 verify restructure: the exact-Jaccard stage now computes
    |A∩B|/|A∪B| via JVM array_intersect over per-doc shingle-hash sets
    built in ONE semi-joined text pass. Values must be bit-identical to
    the straight numpy computation the old double-text-join path did."""
    pairs = dedup.minhash_dedup(docs, threshold=0.0, bands=16, num_perm=64).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in pairs:
        ha = dedup._shingle_hashes(texts[r["id_a"]], 5)
        hb = dedup._shingle_hashes(texts[r["id_b"]], 5)
        inter = np.intersect1d(ha, hb, assume_unique=True).size
        union = ha.size + hb.size - inter
        expect = inter / union if union else 1.0
        assert r["jaccard"] == expect, (r["id_a"], r["id_b"])


def test_minhash_verify_plan_single_text_pass(docs):
    """r13 (guide §2.3/§3): the verify stage's final plan joins the tiny
    checkpointed shingle-signature table twice — the TEXT table is
    scanned once (inside the signature checkpoint job), so the executed
    plan contains no text scan and no Python verify stage at all."""
    plan = (
        dedup.minhash_dedup(docs, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan
    # both verify inputs are materialized RDDs, not re-derived scans
    assert "Scan parquet" not in plan and "Scan ExistingRDD" in plan


def test_lsh_ann_plan_broadcasts_capped_side(vectors):
    """r13 (guide §3.1): under the size gate the capped candidate side is
    broadcast, so the bucket-meet join is a BroadcastHashJoin and the
    probe side streams from the checkpointed assignment with no
    exchange of its own."""
    plan = (
        similarity.lsh_ann_topk(vectors, k=2, nbits=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
