"""SQL scalar-function registration (functions/register): parity with
the DataFrame operators and inlined-expression plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.functions.register import register_sql_functions
from pangeo_forge_recipes_spark.functions.textexprs import TextExprs


@pytest.fixture(scope="module")
def funcs(spark):
    return register_sql_functions(spark)


def test_sql_functions_match_expression_library(spark, funcs):
    rows = [
        (1, "The quick brown fox and the dog"),
        (2, "der Hund und die Katze und der Vogel"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    df.createOrReplaceTempView("sqlfn_docs")
    e = TextExprs("spark", col="text")
    got = spark.sql(
        "SELECT id, pf_token_count(text) a, pf_quality_score(text) b, "
        "pf_lang_id(text) c, pf_fingerprint(text) d FROM sqlfn_docs"
    ).collect()
    want = df.selectExpr(
        "id",
        f"{e.token_count()} a",
        f"{e.quality_score()} b",
        f"{e.lang_id()} c",
        f"{e.rolling_min_hash()} d",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_tokens_col_binding_matches_inline_split(spark):
    """TextExprs(tokens_col=...) references a pre-bound token array and
    must produce values identical to the inline-split form — binding is
    a cost optimization (one split per row instead of one per metric),
    never semantics. The bound plan must not re-split."""
    rows = [
        (1, "The quick brown fox and the dog"),
        (2, "  leading and  double  spaces "),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    inline = TextExprs("spark", col="text")
    bound = TextExprs("spark", col="text", tokens_col="__t")
    dfb = df.withColumn("__t", F.expr(inline.tokens()))
    got = dfb.selectExpr(
        "id",
        f"{bound.token_count()} a",
        f"{bound.stopword_ratio()} b",
        f"{bound.mean_word_len()} c",
        f"{bound.lang_id()} d",
    ).collect()
    want = df.selectExpr(
        "id",
        f"{inline.token_count()} a",
        f"{inline.stopword_ratio()} b",
        f"{inline.mean_word_len()} c",
        f"{inline.lang_id()} d",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the bound projection splits once: the final select's plan text
    # carries no split() of the raw text column (only the __t reference)
    proj = dfb.selectExpr(
        f"{bound.token_count()} a",
        f"{bound.stopword_ratio()} b",
        f"{bound.mean_word_len()} c",
    )
    import re as _re

    top = proj._jdf.queryExecution().optimizedPlan().toString().split("\n")[0]
    assert not _re.search(r"split\(text", top)


def test_sql_functions_split_is_engine_deterministic(spark, funcs):
    df = spark.range(1000).selectExpr(
        "pf_split_label(cast(id as string)) AS split"
    )
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # identical on re-registration / re-run
    again = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_sql_functions_inline_into_codegen(spark, funcs):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    df.createOrReplaceTempView("sqlfn_plan")
    plan = (
        spark.sql("SELECT pf_token_count(text) FROM sqlfn_plan")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the body inlines as Catalyst expressions: no python eval nodes
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
