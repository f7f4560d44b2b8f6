"""Common-Crawl-style ingestion: WARC archives → cleaned, deduplicated
document table.

WARC files → `read_warc` (map-only record parse, one task per archive)
→ HTML text extraction → language/quality gates → broadcast-Bloom
incremental dedup against the already-ingested corpus snapshot (no
join, no shuffle) → append-ready documents.

At 100 TB the shape holds: archives outnumber executors (binaryFile
parallelism), every pre-dedup stage is map-only, and the dedup is a
one-pass reference scan + a broadcast bitmap — the corpus side never
shuffles. Run: PYTHONPATH=/root/repo python examples/warc_ingest.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.operators.bloom import dedup_against_reference
from pangeo_forge_recipes_spark.operators.text import with_token_counts
from pangeo_forge_recipes_spark.session import get_spark
from pangeo_forge_recipes_spark.sources.warc import (
    html_payload_text,
    read_warc,
    write_warc,
)


def main() -> None:
    spark = get_spark(app_name="warc-ingest")
    tmp = tempfile.mkdtemp(prefix="warc_demo_")

    # --- synthesize two "crawl" archives (stand-ins for CC-MAIN files)
    def page(i: int, body: str) -> dict:
        return {
            "warc_type": "response",
            "target_uri": f"http://site-{i % 7}.example/page/{i}",
            "http": {
                "status": 200,
                "content_type": "text/html",
                "payload": f"<html><body><h1>Page {i}</h1><p>{body}</p></body></html>".encode(),
            },
        }

    write_warc(
        os.path.join(tmp, "crawl-0.warc.gz"),
        [page(i, f"unique words number {i} " * 30) for i in range(40)],
    )
    write_warc(
        os.path.join(tmp, "crawl-1.warc.gz"),
        [page(i, f"unique words number {i} " * 30) for i in range(20, 60)],
    )

    # --- parse + extract (both map-only; no shuffle before dedup)
    records = read_warc(spark, os.path.join(tmp, "*.warc.gz"))
    docs = html_payload_text(records).where(F.col("http_status") == 200)
    docs = docs.withColumn(
        "doc_id", F.abs(F.xxhash64("target_uri", "text"))
    )

    # --- quality gate
    scored = with_token_counts(docs.select("doc_id", "target_uri", "text"))
    kept = scored.where(F.col("token_count").between(20, 10_000))

    # --- incremental dedup against the already-ingested snapshot
    # (crawl-0 holds pages 0..39; crawl-1 holds 20..59 — the 20..39
    # overlap must be dropped, leaving crawl-1's 40..59 as new)
    ref = html_payload_text(
        read_warc(spark, os.path.join(tmp, "crawl-0.warc.gz"))
    ).select("text")
    fresh = dedup_against_reference(
        kept, ref, col="text", expected_items=1_000, fpp=1e-9
    )

    n_all, n_fresh = kept.count(), fresh.count()
    print(f"parsed+kept: {n_all} rows; new vs snapshot: {n_fresh}")
    assert n_all == 80 and n_fresh == 20, (n_all, n_fresh)
    spark.stop()


if __name__ == "__main__":
    main()
