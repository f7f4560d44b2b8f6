"""Keep the rotated-out shared-SQL slots warm (round-2 VERDICT ask #10).

q6/q10/q14/q17 and the batch hourly rollup were swapped out of the
driver's 50-query window to make room for dedup_clusters + assembly
queries; their SQL text stays in ``_shared_sql()`` so coverage can rotate
back. This test runs each text on BOTH engines (Spark and DuckDB, same
ANSI string, same parquet inputs) and asserts the driver-style
order-insensitive value-hash match, so the rotated-out queries cannot
rot while outside the driver window.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

ROTATED_OUT = [
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "q16_supplier_cnt",
    "q17_small_quantity_revenue",
    "q9_product_profit",
    "events_hourly_rollup",
    # round-4 rotation (slots moved to dsir_select + gopher_c4_filter);
    # events_sessions' text still grades via the streaming twin, but the
    # batch execution path stays warm here
    "events_minmax_count",
    "events_sessions",
    # round-5 rotation (slots moved to url_dedup + bpe_tokenize)
    "q4_order_priority",
    "q13_customer_distribution",
    # round-5 rotation (slots moved to mix_corpora + chunk_documents)
    "topk_customers",
    "q19_disjunctive_revenue",
    # round-6 rotation (slots moved to webdataset_roundtrip +
    # decontaminate)
    "q5_local_supplier_volume",
    "window_running_total",
    # round-6 rotation, fourth pass (slot moved to snapshot_delta)
    "q3_unshipped_revenue",
    # round-6 rotation, second pass (slots moved to c4_clean +
    # scrub_pii + dedup_minhash_stream)
    "q22_inactive_customers",
    "set_ops_customers",
    # round-7 rotation (slots moved to zarr_source_scan + resize_images;
    # q1 also remains the entry() flagship smoke)
    "q1_pricing_summary",
    "q18_large_orders",
    # round-7 second pass (slot moved to zarr_writer_roundtrip)
    "events_multi_grain_rollup",
]


def _summary(pdf: pd.DataFrame):
    """Driver-style frame summary: sorted columns, normalized cells,
    order-insensitive row hash."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)

    rows = sorted("|".join(cell(v) for v in r) for r in pdf.itertuples(index=False))
    return (
        len(pdf),
        list(pdf.columns),
        hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16],
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", ROTATED_OUT)
def test_rotated_out_sql_still_matches(spark, duck, name):
    sql = entrymod._shared_sql()[name]
    entrymod._register(spark, SF_DIR)
    got = _summary(spark.sql(sql).toPandas())
    want = _summary(duck.execute(sql).df())
    assert got == want, f"{name}: spark {got} != duckdb {want}"


@pytest.mark.parametrize(
    "name",
    [
        "dedup_ngram_signature",
        "text_fingerprints",
        "sample_split_stats",
        "top_bigrams",
        "text_langid",
        "corpus_clean",
        "dedup_exact",
    ],
)
def test_rotated_out_text_sql_still_matches(spark, duck, name):
    """dedup_ngram_signature yielded its driver slot to
    semantic_dedup_pairs (r3); text_fingerprints yielded its slot to
    dedup_lines (r5); sample_split_stats yielded its slot to
    quality_filter (r5, md5-bucket shape graded via mix_corpora);
    top_bigrams yielded its slot to perplexity_buckets (r6) and
    text_langid to the r6 second-pass rotation; corpus_clean to
    domain_cap_sample (r7); dedup_exact to pipeline_spill_roundtrip
    (r11); the dialect-pair texts stay warm here."""
    entrymod._register(spark, SF_DIR)
    got = _summary(spark.sql(entrymod._text_sql("spark")[name]).toPandas())
    want = _summary(duck.execute(entrymod._text_sql("duckdb")[name]).df())
    assert got == want


def test_rotated_out_events_props_json_still_matches(spark, duck):
    """events_props_json yielded its driver slot to warc_roundtrip (r6
    third pass); the JSON-extraction dialect pair stays warm here."""
    entrymod._register(spark, SF_DIR)
    got = _summary(
        spark.sql(entrymod._props_json_sql("spark")).toPandas()
    )
    want = _summary(duck.execute(entrymod._props_json_sql("duckdb")).df())
    assert got == want


def test_rotated_out_multimodal_stats_still_matches(spark, duck):
    """multimodal_stats yielded its driver slot to ann_pq_topk (r6
    second pass); the sha-fake blob-plumbing aggregate and its oracle
    stay warm here."""
    got = _summary(entrymod._multimodal_stats(spark, SF_DIR).toPandas())
    want = _summary(duck.execute(entrymod._MULTIMODAL_ORACLE).df())
    assert got == want


def test_rotated_out_corpus_shards_still_matches(spark, duck):
    """corpus_shards yielded its driver slot to tfrecord_roundtrip (r8
    second pass — the TFRecord loop's writer runs the same shard_assign
    expression); the shard-stat aggregate and its oracle stay warm
    here."""
    got = _summary(entrymod._corpus_shards(spark, SF_DIR).toPandas())
    want = _summary(duck.execute(entrymod._shards_oracle()).df())
    assert got == want


def test_round9_rotation_slots_dual_engine(spark):
    """The four r9 rotation slots (phash_near_dup,
    quality_classifier_score, stratified_sample,
    streaming_hamming_dedup) pinned at sf0.001 against their DuckDB
    oracles — the same compare the driver's gate runs at sf0.01.

    Uses the SHARED entrymod instance, never a second importlib copy:
    a separate module copy carries its own _REGISTERED cache, so its
    sf0.001 re-registration silently clobbered the session's views
    under the first copy's nose and the NEXT entrymod._register call
    skipped the re-register — a later sf0.01 test then read sf0.001
    data (r12 review-session finding, surfaced by the perplexity warm
    test)."""
    import duckdb

    entry = entrymod
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    for name in (
        "phash_near_dup",
        "quality_classifier_score",
        "stratified_sample",
        "streaming_hamming_dedup",
    ):
        got = sorted(map(tuple, entry.queries()[name](spark, sf).collect()))
        want = sorted(map(tuple, con.execute(entry.oracle_sql()[name]).fetchall()))
        assert got == want and got, name


def test_rotated_out_perplexity_buckets_still_matches(spark, duck):
    """perplexity_buckets yielded its driver slot to audio_near_dup
    (r12); the CCNet tercile split and its trigram-LM replication
    oracle stay warm here, dual-engine at the same SF the other
    rotated pairs use."""
    got = _summary(entrymod._perplexity_buckets_q(spark, SF_DIR).toPandas())
    want = _summary(duck.execute(entrymod._perplexity_buckets_oracle()).df())
    assert got == want and got[0] > 0
