"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All hot paths are built-in Spark SQL expressions (JVM, whole-stage
codegen) rendered from the dialect templates in
``functions.textexprs`` — the DuckDB correctness oracles render from the
same templates, so engine and oracle are structurally identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textexprs import TextExprs

_S = TextExprs("spark")


def with_token_counts(df: DataFrame, col: str = "text") -> DataFrame:
    e = TextExprs("spark", col)
    return df.withColumn("token_count", F.expr(e.token_count())).withColumn(
        "bpe_token_count", F.expr(e.bpe_ish_token_count())
    )


def with_quality(df: DataFrame, col: str = "text") -> DataFrame:
    e = TextExprs("spark", col)
    return (
        df.withColumn("punct_ratio", F.expr(e.punct_ratio()))
        .withColumn("stopword_ratio", F.expr(e.stopword_ratio()))
        .withColumn("mean_word_len", F.expr(e.mean_word_len()))
        .withColumn("quality_score", F.expr(e.quality_score()))
    )


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    e = TextExprs("spark", col)
    return df.withColumn("pred_lang", F.expr(e.lang_id()))


def with_fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    e = TextExprs("spark", col)
    return df.withColumn("fingerprint", F.expr(e.fingerprint_md5())).withColumn(
        "rolling_fingerprint", F.expr(e.rolling_min_hash(5))
    )


def with_split(
    df: DataFrame, id_col: str = "doc_id", train: int = 90, val: int = 5
) -> DataFrame:
    """Deterministic train/val/test split column from an md5 bucket of the
    id — stable across runs, engines and partitionings (``rand()`` is
    none of those), so a 100 TB corpus resplits identically every run."""
    e = TextExprs("spark")
    return df.withColumn(
        "split", F.expr(e.split_label(e._f("str", x=id_col), train, val))
    )


def bigram_counts(df: DataFrame, col: str = "text", k: int = 20) -> DataFrame:
    """Top-``k`` whitespace-token bigrams: explode → hash groupBy →
    ordered limit (TakeOrdered — no global sort)."""
    e = TextExprs("spark", col)
    return (
        df.select(F.explode(F.expr(e.token_bigrams())).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(k)
    )
