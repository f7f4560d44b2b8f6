"""Register the engine's expression library as Spark SQL scalar UDFs
(``CREATE TEMPORARY FUNCTION ... RETURN <expr>``, a Spark 4 feature) so
pure-SQL users get the same deterministic, codegen'd semantics the
DataFrame operators use — token counting, quality scoring, language ID,
fingerprints, md5 sample buckets/splits, URL canonicalization and SURT
keys — without importing any Python API.

SQL UDF bodies inline into the calling plan (they are Catalyst
expressions, not black-box UDFs), so filter/projection pushdown and
whole-stage codegen still apply — unlike a Python UDF, calling these
from SQL costs nothing extra.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.urls import canonical_url_sql, surt_key_sql
from .textexprs import TextExprs


def register_sql_functions(spark: SparkSession, prefix: str = "pf_") -> list:
    """Create the temporary SQL functions; returns the registered names.

    Functions (all ``{prefix}``-prefixed): token_count(text),
    bpe_token_count(text), quality_score(text), lang_id(text),
    fingerprint(text), sample_bucket(id), split_label(id),
    canonical_url(url), surt_key(url).
    """
    e = TextExprs("spark", col="__x")

    defs = {
        "token_count": ("(__x STRING) RETURNS INT", e.token_count()),
        "bpe_token_count": ("(__x STRING) RETURNS INT", e.bpe_ish_token_count()),
        "quality_score": ("(__x STRING) RETURNS DOUBLE", e.quality_score()),
        "lang_id": ("(__x STRING) RETURNS STRING", e.lang_id()),
        "fingerprint": ("(__x STRING) RETURNS STRING", e.rolling_min_hash()),
        "sample_bucket": (
            "(__x STRING) RETURNS INT",
            e.sample_bucket("__x"),
        ),
        "split_label": (
            "(__x STRING) RETURNS STRING",
            e.split_label("__x"),
        ),
        "canonical_url": (
            "(__x STRING) RETURNS STRING",
            canonical_url_sql("__x", "spark"),
        ),
        "surt_key": (
            "(__x STRING) RETURNS STRING",
            surt_key_sql("__x", "spark"),
        ),
    }
    names = []
    for name, (sig, body) in defs.items():
        full = f"{prefix}{name}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {full}{sig} RETURN {body}"
        )
        names.append(full)
    return names


__all__ = ["register_sql_functions"]
