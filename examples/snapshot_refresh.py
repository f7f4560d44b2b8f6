"""Incremental crawl refresh: reprocess ONLY what changed between two
snapshots.

The composition every recurring-crawl pipeline runs:

1. ``snapshot_delta`` classifies each canonical URL across OLD and NEW
   (added / removed / unchanged / touched / rewritten) in one shuffle.
2. Only ``added`` + ``rewritten`` pages — the rows whose content is
   genuinely new — flow into the expensive downstream stages (here the
   Gopher/C4-style hygiene pass and domain-cap balance); ``touched``
   pages (near-duplicate template tweaks) keep their existing artifacts.

At crawl scale the delta is a small fraction of the snapshot, so the
recurring cost is O(changed), not O(corpus).

Run: PYTHONPATH=/root/repo python examples/snapshot_refresh.py
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.operators.filters import scrub_pii
from pangeo_forge_recipes_spark.operators.snapshots import snapshot_delta
from pangeo_forge_recipes_spark.operators.urls import domain_cap_sample
from pangeo_forge_recipes_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    url = F.expr("concat('https://site', cast(doc_id % 40 as string), "
                 "'.example/page/', cast(doc_id as string))")
    old = docs.select("doc_id", url.alias("url"), "text")
    # synthetic NEW snapshot: some pages dropped, some lightly touched,
    # some rewritten — the shapes a monthly re-crawl actually produces
    new = docs.where("doc_id % 11 != 1").select(
        "doc_id",
        url.alias("url"),
        F.expr(
            "CASE WHEN doc_id % 11 = 2 THEN concat(text, ' minor footer change')"
            " WHEN doc_id % 11 = 3 THEN concat('fresh content ', md5(text))"
            " ELSE text END"
        ).alias("text"),
    )

    delta = snapshot_delta(old, new).cache()
    print("delta composition:")
    delta.groupBy("status").count().orderBy("status").show()

    # reprocess ONLY the genuinely-new content
    work = (
        delta.where(F.col("status").isin("added", "rewritten"))
        .join(new, delta.new_id == new.doc_id, "inner")
        .select("doc_id", "url", "text")
    )
    # hygiene stages plug in here (c4_clean / gopher filters for real
    # web text; the synthetic corpus has no punctuation so this example
    # runs the PII scrub + a minimum-length gate)
    cleaned = scrub_pii(work).where(F.expr("size(split(text, ' ')) >= 3"))
    balanced = domain_cap_sample(cleaned, cap=50)
    print(f"pages reprocessed this refresh: {balanced.count()} "
          f"(of {new.count()} in the new snapshot)")


if __name__ == "__main__":
    main()
