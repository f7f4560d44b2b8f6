"""Crawl-snapshot delta: classify every page across two corpus snapshots.

Incremental web-corpus pipelines (Common Crawl monthly snapshots,
recurring site crawls) reprocess only what changed. Given snapshot OLD
and snapshot NEW — each ``(id, url, text)`` — ``snapshot_delta`` labels
every canonical URL:

* ``added``     — present only in NEW
* ``removed``   — present only in OLD
* ``unchanged`` — same content bytes (md5 of the text matches)
* ``touched``   — content changed but still near-duplicate
  (character-shingle Jaccard ≥ ``near_threshold`` — a template tweak,
  timestamp, ad rotation)
* ``rewritten`` — content changed substantively (Jaccard below the
  threshold): the rows downstream stages actually reprocess

100 TB shape: both sides canonicalize and hash map-side; ONE shuffle —
the full-outer join on the canonical URL (each side pre-deduped to its
smallest id per canonical form, a window). The near-dup check needs no
LSH and no extra shuffle: after the join, a changed page's old and new
text sit in the SAME row, so the Jaccard is a per-row JVM expression
over bound distinct-shingle arrays (xxhash64 of character 5-grams, the
same shingle family as ``operators.dedup.minhash_dedup``). Content
equality compares md5 digests, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import canonical_url_sql

__all__ = ["snapshot_delta", "jaccard_sql"]


def _gram_array(col: str, n: int) -> str:
    """Bound distinct hashed char-n-gram array of ``col`` (the
    single-element-array transform binds the lowered text once, so the
    per-gram lambda is O(1) per element, not a re-lower per slot)."""
    return (
        f"element_at(transform(array(lower({col})), t -> "
        f"array_distinct(transform("
        f"sequence(1, greatest(length(t) - {n - 1}, 1)), "
        f"i -> xxhash64(substring(t, i, {n}))))), 1)"
    )


def jaccard_sql(col_a: str, col_b: str, n: int = 5) -> str:
    """Spark SQL expression: character-``n``-gram Jaccard of two text
    columns, computed per row with no shuffle (distinct hashed shingle
    arrays + one intersect)."""
    ga, gb = _gram_array(col_a, n), _gram_array(col_b, n)
    return (
        f"element_at(transform(array(struct({ga} AS a, {gb} AS b)), p -> "
        f"size(array_intersect(p.a, p.b)) / "
        f"(size(p.a) + size(p.b) - size(array_intersect(p.a, p.b)))), 1)"
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    near_threshold: float = 0.8,
    shingle_n: int = 5,
) -> DataFrame:
    """Delta table between two crawl snapshots.

    Returns ``(canonical_url, status, old_id, new_id, jaccard)`` — one
    row per canonical URL seen in either snapshot; ``jaccard`` is NULL
    except for changed pages (where it attributes touched vs rewritten).
    """

    def side(df: DataFrame, tag: str) -> DataFrame:
        canon = F.expr(canonical_url_sql(url_col, "spark"))
        keyed = df.select(
            canon.alias("canonical_url"),
            F.col(id_col).alias(f"{tag}_id"),
            F.md5(F.col(text_col)).alias(f"{tag}_md5"),
            F.col(text_col).alias(f"{tag}_text"),
        ).where(F.col("canonical_url").isNotNull())
        # smallest id per canonical form wins (url_dedup semantics);
        # WindowGroupLimit keeps the top-1 pre-shuffle
        from pyspark.sql import Window

        w = Window.partitionBy("canonical_url").orderBy(f"{tag}_id")
        return (
            keyed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    o = side(old, "old")
    nw = side(new, "new")
    joined = o.join(nw, "canonical_url", "full_outer")
    jac = F.expr(jaccard_sql("old_text", "new_text", shingle_n))
    # null-safe: a page whose text is NULL in BOTH snapshots is
    # unchanged (plain != is NULL there and would fall through to the
    # Jaccard branch)
    changed = ~F.col("old_md5").eqNullSafe(F.col("new_md5"))
    # jaccard only where BOTH texts exist and differ (md5(NULL) is NULL,
    # so md5 presence ⟺ text presence; Spark's null-skipping greatest()
    # would otherwise produce a spurious 0.0 against a missing side).
    # Evaluated in its OWN projection so the O(text-length) shingle
    # expression runs ONCE per changed row — the status branch and the
    # output column both referencing the expression tree directly made
    # codegen evaluate it twice (conditional branches are excluded from
    # subexpression elimination).
    both = F.col("old_md5").isNotNull() & F.col("new_md5").isNotNull()
    scored = joined.withColumn("__jac", F.when(changed & both, jac))
    status = (
        F.when(F.col("old_id").isNull(), F.lit("added"))
        .when(F.col("new_id").isNull(), F.lit("removed"))
        .when(~changed, F.lit("unchanged"))
        .when(F.col("__jac") >= near_threshold, F.lit("touched"))
        .otherwise(F.lit("rewritten"))
    )
    return scored.select(
        "canonical_url",
        status.alias("status"),
        "old_id",
        "new_id",
        F.round(F.col("__jac"), 4).alias("jaccard"),
    )
