"""Training-corpus cleaning pipeline — the engine's LLM-data-pipeline
operators composed end-to-end on the synthetic ``documents`` table:

PII scrub → corpus-level line dedup (CCNet) → quality gate →
repetition gate → exact dedup → MinHash near-dup pairs →
connected-component cluster resolution → canonical-doc selection →
benchmark decontamination → deterministic train/val/test split →
per-split token stats.

Every stage is a DataFrame transformation, so the whole pipeline is ONE
Catalyst plan per action: the quality filter pushes into the parquet
scan, the dedups are hash-groupBy / band-bucket equi-joins (no
all-pairs), and the split is an md5 bucket — stable across runs and
partitionings, which is what makes a 100 TB resplit reproducible.

Run: PYTHONPATH=/root/repo python examples/corpus_pipeline.py

See also examples/warc_ingest.py (WARC -> text -> broadcast-Bloom
incremental dedup) and the further selection operators this pipeline
composes with: operators/lmscore.py (CCNet-shaped LM quality filter),
operators/dsir.py (target-distribution importance resampling),
operators/urls.py (URL-level dedup), operators/packing.py
(context-window chunking + sequence packing).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.operators import dedup, filters, text
from pangeo_forge_recipes_spark.operators.components import (
    canonical_docs,
    dedup_clusters,
)
from pangeo_forge_recipes_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_raw = docs.count()

    # 0. PII scrub (codegen'd regexp_replace chain — pure map, no shuffle)
    docs = filters.scrub_pii(docs)

    # 0b. corpus-level line dedup (CCNet-style): drop lines whose
    # normalized form appears in >= min_docs distinct documents — the
    # cross-document boilerplate per-document cleaning can't see. The
    # synthetic corpus is single-line, so this is a structural no-op
    # here, but the stage composes exactly like this on real web text.
    docs = filters.dedup_lines(docs, min_docs=50).drop(
        "n_lines_kept", "n_lines_dropped"
    )

    # 1. quality + repetition gates (JVM-side expressions; no Python in
    # the hot path). The repetition gate is Gopher-style: drop documents
    # dominated by duplicated lines.
    scored = filters.with_repetition_metrics(
        text.with_quality(text.with_token_counts(docs))
    )
    kept = scored.filter(
        (F.col("quality_score") >= 0.3)
        & (F.col("token_count") >= 5)
        & (F.col("dup_line_char_frac") <= 0.6)
    )

    # 2. exact dedup: keep the min-id representative per fingerprint
    reps = dedup.exact_dedup(kept).select("doc_id")
    exact_unique = kept.join(reps, "doc_id", "left_semi")
    n_exact = exact_unique.count()

    # 3. near-dup dedup: MinHash-verified pairs → connected-component
    # clusters → keep ONE canonical doc per cluster (highest quality).
    # Cluster resolution matters: with pairs (a,b),(b,c) but no (a,c)
    # edge, naive drop-the-higher-id would delete the whole chain except
    # a; components keep exactly one representative per transitive group.
    pairs = dedup.minhash_dedup(exact_unique, threshold=0.8)
    clusters = dedup_clusters(exact_unique, pairs)
    cleaned = (
        canonical_docs(exact_unique, clusters, order_col="quality_score")
        .where("is_canonical")
        .drop("cluster_id", "is_canonical")
    )
    n_clean = cleaned.count()

    # 3b. benchmark decontamination: drop any doc sharing a 13-gram with
    # the "eval set" (here: a held-out slice of the corpus itself). The
    # benchmark side is hashed and broadcast; the corpus never shuffles.
    bench = docs.orderBy("doc_id").limit(5).select("text")
    cleaned = filters.decontaminate(cleaned, bench, n=13)
    n_decon = cleaned.count()

    # 4. deterministic split + per-split stats
    stats = (
        text.with_split(cleaned)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("token_count").alias("total_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy("split")
        .collect()
    )

    # 5. subword tokenization: train a BPE merge table on the cleaned
    # corpus (one word-count pass + driver merge loop) and tokenize
    # map-only — the token stream real packing/loader stages consume.
    from pangeo_forge_recipes_spark.operators.bpe import (
        tokenize_bpe,
        train_bpe,
    )

    merges = train_bpe(cleaned, num_merges=64)
    bpe = tokenize_bpe(cleaned, merges)
    n_bpe_tokens = bpe.agg(F.sum("n_tokens")).collect()[0][0]
    assert len(merges) > 0 and n_bpe_tokens > 0

    # 6. loader-ready shards: WebDataset tars in deterministic md5
    # order (one task streams per tar; manifest = integrity record)
    import shutil
    import tempfile

    from pangeo_forge_recipes_spark.operators.packing import (
        write_webdataset_shards,
    )

    shard_dir = tempfile.mkdtemp(prefix="corpus_wds_")
    try:
        manifest = write_webdataset_shards(
            cleaned.select("doc_id", "text"), shard_dir, n_shards=4
        ).collect()
        assert sum(r["n_docs"] for r in manifest) == n_decon
        # ... and close the loop: the loader side streams the shards
        # back (one task per tar, one sample per row)
        from pangeo_forge_recipes_spark.sources import (
            decode_webdataset_text,
            read_webdataset,
        )

        reread = decode_webdataset_text(read_webdataset(spark, shard_dir))
        assert reread.count() == n_decon
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)

    # semantic retrieval over the embeddings table through the PQ tier:
    # codebooks from an md5 sample, map-only encode, LUT-based
    # asymmetric-distance self-search (the compressed-broadcast path)
    from pangeo_forge_recipes_spark.operators import similarity

    embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    pq_nn = similarity.pq_topk(embs, k=2, m=8, nbits=4)
    n_pq = pq_nn.count()
    assert n_pq == 2 * embs.count()

    print(
        f"raw={n_raw}  post-quality+exact={n_exact}  post-neardup={n_clean}"
        f"  post-decontam={n_decon}  bpe_merges={len(merges)}"
        f"  bpe_tokens={n_bpe_tokens}"
    )
    for r in stats:
        print(f"  {r['split']:5s}  docs={r['n_docs']:6d}  tokens={r['total_tokens']:8d}  q={r['avg_quality']}")

    # verify: monotone shrinkage, full partition into splits, determinism
    assert n_raw >= n_exact >= n_clean >= n_decon > 0
    assert sum(r["n_docs"] for r in stats) == n_decon
    again = {
        r["split"]: r["n_docs"]
        for r in text.with_split(cleaned).groupBy("split").count()
        .withColumnRenamed("count", "n_docs").collect()
    }
    assert again == {r["split"]: r["n_docs"] for r in stats}
    print("corpus_pipeline OK")


if __name__ == "__main__":
    main()
