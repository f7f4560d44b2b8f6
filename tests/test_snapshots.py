"""Crawl-snapshot delta (operators/snapshots): added/removed/unchanged/
touched/rewritten classification across two snapshots, checked against a
pure-Python oracle, with plan gates for the one-shuffle/no-UDF shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _snapshots(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # OLD: every doc, with a canonical VARIANT url (case/fragment noise
    # the canonicalizer must fold before the sides join)
    old = docs.select(
        "doc_id",
        F.expr(
            "concat('HTTPS://Ex.COM/page/', cast(doc_id as string), '#frag')"
        ).alias("url"),
        "text",
    )
    # NEW: %7==1 removed; %7==2 touched (short suffix); %7==3 rewritten
    # (md5-derived gibberish); plus 5 added pages
    base = docs.where("doc_id % 7 != 1").select(
        "doc_id",
        F.expr(
            "concat('https://ex.com/page/', cast(doc_id as string))"
        ).alias("url"),
        F.expr(
            "CASE WHEN doc_id % 7 = 2 THEN concat(text, ' tiny tail tweak')"
            " WHEN doc_id % 7 = 3 THEN concat('REWRITE ', md5(text), ' ',"
            " md5(concat(text, 'x')))"
            " ELSE text END"
        ).alias("text"),
    )
    added = spark.range(5).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.expr(
            "concat('https://ex.com/new/', cast(id as string))"
        ).alias("url"),
        F.expr("concat('brand new page ', cast(id as string))").alias("text"),
    )
    return old, base.unionByName(added)


def _py_jaccard(a: str, b: str, n: int = 5) -> float:
    def grams(t):
        t = t.lower()
        k = max(len(t) - n + 1, 1)
        return {t[i : i + n] for i in range(k)}

    ga, gb = grams(a), grams(b)
    i = len(ga & gb)
    return i / (len(ga) + len(gb) - i)


def test_snapshot_delta_matches_python_oracle(spark):
    from pangeo_forge_recipes_spark.operators.snapshots import snapshot_delta

    old, new = _snapshots(spark)
    out = snapshot_delta(old, new, near_threshold=0.8).collect()
    old_rows = {r["doc_id"]: r["text"] for r in old.collect()}
    new_rows = {r["doc_id"]: r["text"] for r in new.collect()}

    got = {r["canonical_url"]: r for r in out}
    assert len(got) == len(out), "one row per canonical url"
    for did, text in old_rows.items():
        url = f"https://ex.com/page/{did}"
        r = got[url]
        if did % 7 == 1:
            assert r["status"] == "removed" and r["new_id"] is None
            continue
        assert r["old_id"] == did and r["new_id"] == did
        if did % 7 == 2:
            want = _py_jaccard(text, new_rows[did])
            assert r["status"] == ("touched" if want >= 0.8 else "rewritten")
            assert r["jaccard"] == pytest.approx(round(want, 4), abs=2e-4)
        elif did % 7 == 3:
            assert r["status"] == "rewritten"
            assert r["jaccard"] < 0.2
        else:
            assert r["status"] == "unchanged" and r["jaccard"] is None
    for i in range(5):
        r = got[f"https://ex.com/new/{i}"]
        assert r["status"] == "added"
        assert r["old_id"] is None and r["new_id"] == 1_000_000 + i


def test_snapshot_delta_plan_shape(spark):
    """One shuffle family per side (the window + join on the canonical
    key), no Python eval, no cartesian/nested-loop join."""
    from pangeo_forge_recipes_spark.operators.snapshots import snapshot_delta

    old, new = _snapshots(spark)
    plan = snapshot_delta(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan  # per-side top-1 pre-shuffle


def test_jaccard_sql_identity_and_disjoint(spark):
    from pangeo_forge_recipes_spark.operators.snapshots import jaccard_sql

    row = spark.sql(
        f"SELECT {jaccard_sql(chr(39) + 'hello corpus' + chr(39), chr(39) + 'hello corpus' + chr(39))} AS same, "
        f"{jaccard_sql(chr(39) + 'aaaaaaaa' + chr(39), chr(39) + 'bbbbbbbb' + chr(39))} AS disjoint"
    ).collect()[0]
    assert row["same"] == pytest.approx(1.0)
    assert row["disjoint"] == pytest.approx(0.0)
