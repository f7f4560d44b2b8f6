"""URL canonicalization / SURT keys (operators/urls): three-way check —
Spark SQL, DuckDB (same dual-dialect text), and a urllib-based Python
oracle."""

from __future__ import annotations

from urllib.parse import urlsplit

import duckdb
import pytest

from pangeo_forge_recipes_spark.operators.urls import (
    canonical_url_sql,
    host_stats,
    surt_key_sql,
    url_dedup,
    with_canonical_url,
)

URLS = [
    "HTTP://Example.COM/path/Page?b=2&a=1#frag",
    "http://example.com:80/path/Page?a=1&b=2",
    "https://example.com:443/",
    "https://example.com",
    "http://sub.Example.org/x%20y?z",
    "http://example.com/a?b=2&a=1&a=0",
    "ftp://files.example.net/pub/file.txt",
    "not a url",
    "http://example.com/q?",
    "https://EXAMPLE.com:8443/keep/port",  # non-default port host-drop rule
]


def _py_canonical(u: str):
    """Independent oracle via urllib: same canonical definition."""
    s = urlsplit(u)
    if not s.scheme or "://" not in u:
        return None
    host = s.netloc.lower()
    for suffix in (":80", ":443"):
        if host.endswith(suffix):
            host = host[: -len(suffix)]
    path = s.path or "/"
    out = f"{s.scheme.lower()}://{host}{path}"
    if s.query:
        out += "?" + "&".join(sorted(s.query.split("&")))
    return out


def _py_surt(u: str):
    c = _py_canonical(u)
    if c is None:
        return None
    s = urlsplit(c)
    host = s.netloc.split(":")[0]
    rev = ",".join(reversed(host.split(".")))
    tail = (s.path or "/") + (f"?{s.query}" if s.query else "")
    return f"{rev}){tail}"


def test_canonical_matches_python_oracle_and_duckdb(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [
        r[0]
        for r in df.selectExpr(canonical_url_sql("url", "spark")).collect()
    ]
    want = [_py_canonical(u) for u in URLS]
    assert got == want
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            "SELECT "
            + canonical_url_sql("url", "duckdb")
            + " FROM (SELECT unnest(?) AS url)",
            [URLS],
        ).fetchall()
    ]
    assert duck == want


def test_surt_matches_python_oracle_and_duckdb(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [r[0] for r in df.selectExpr(surt_key_sql("url", "spark")).collect()]
    want = [_py_surt(u) for u in URLS]
    assert got == want
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            "SELECT " + surt_key_sql("url", "duckdb")
            + " FROM (SELECT unnest(?) AS url)",
            [URLS],
        ).fetchall()
    ]
    assert duck == want
    # SURT groups a domain's subdomains adjacently under sort
    keys = sorted(k for k in got if k and k.startswith("com,example"))
    assert keys == [k for k in sorted(filter(None, got)) if k.startswith("com,example")]


def test_url_dedup_and_host_stats(spark):
    rows = [
        (1, "HTTP://Example.COM/a?b=2&a=1"),
        (2, "http://example.com:80/a?a=1&b=2"),  # same canonical as 1
        (3, "http://example.com/other"),
        (4, "http://sub.example.com/a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [1, 3, 4]
    hosts = {r["host"]: r["n_docs"] for r in host_stats(df).collect()}
    assert hosts == {"example.com": 3, "sub.example.com": 1}


def test_canonical_is_pure_codegen(spark):
    df = spark.createDataFrame([("http://a.b/c",)], "url string")
    plan = (
        with_canonical_url(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_cap_sample_deterministic_and_one_shuffle(spark):
    """domain_cap_sample keeps at most `cap` rows per host, the kept set
    is the md5-ordered prefix (deterministic across partitionings), and
    the plan is one window shuffle with map-side WindowGroupLimit
    pruning — never a groupBy + join pair."""
    import hashlib

    from pangeo_forge_recipes_spark.operators.urls import domain_cap_sample

    rows = [
        (i, f"http://{'big.com' if i % 3 else 'small.com'}/p{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_cap_sample(df, cap=4)
    kept = sorted(r["doc_id"] for r in out.collect())

    # python oracle: md5-ordered per-host prefix
    want = []
    for host in ("big.com", "small.com"):
        members = [i for i in range(30) if (i % 3 != 0) == (host == "big.com")]
        members.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want += members[:4]
    assert kept == sorted(want)
    # repartitioning does not change the kept set
    kept2 = sorted(
        r["doc_id"] for r in domain_cap_sample(df.repartition(7), cap=4).collect()
    )
    assert kept2 == kept
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "HashAggregate" not in plan and "Join" not in plan
