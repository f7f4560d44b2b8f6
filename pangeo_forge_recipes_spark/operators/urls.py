"""URL canonicalization for web-corpus pipelines: dedup keys, host
aggregation, and CDX-style SURT sort keys.

Crawl corpora reference the same page under syntactic URL variants
(case-shifted scheme/host, fragments, default ports, unsorted query
params). Canonicalizing BEFORE url-level dedup/aggregation is standard
(cf. the transforms in web-archive CDX tooling). Everything here is a
single codegen'd SQL expression — no UDF, no shuffle — written in the
dual-dialect regex subset both Spark and DuckDB execute identically, so
the same text serves the engine and the test oracle.

Canonical form: ``lower(scheme)://lower(host)[:port]/path[?sorted-query]``
with the fragment dropped, default ports (80/443) dropped, an empty path
normalized to ``/``, and query parameters sorted bytewise.

SURT (Sort-friendly URI Reordering Transform, the public web-archive
convention): ``com,example,sub)/path?query`` — hosts reversed at the
dots so a sort groups by registrable domain; scheme and port dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url_sql(col: str, dialect: str = "spark") -> str:
    """Dual-dialect SQL expression canonicalizing URL column ``col``."""
    # strip fragment
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '{_SCHEME}', 1))"
    rest = f"regexp_replace({nofrag}, '{_SCHEME}', '')"
    authority = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    # lowercase host, drop default ports
    host = (
        f"regexp_replace(lower({authority}), ':(80|443)$', '')"
    )
    tail = f"regexp_replace({rest}, '^[^/?]*', '')"  # path [+ query]
    path = f"regexp_extract({tail}, '^([^?]*)', 1)"
    norm_path = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    query = f"regexp_extract({tail}, '[?](.*)$', 1)"
    if dialect == "spark":
        sorted_q = f"array_join(array_sort(split({query}, '&')), '&')"
    elif dialect == "duckdb":
        sorted_q = f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    else:
        raise ValueError(f"dialect {dialect!r}")
    return (
        f"CASE WHEN {scheme} = '' THEN NULL ELSE "
        f"concat({scheme}, '://', {host}, {norm_path}, "
        f"CASE WHEN {query} = '' OR {query} IS NULL THEN '' "
        f"ELSE concat('?', {sorted_q}) END) END"
    )


def surt_key_sql(col: str, dialect: str = "spark") -> str:
    """Dual-dialect SQL for the SURT sort key of URL column ``col``."""
    canon = canonical_url_sql(col, dialect)
    rest = f"regexp_replace({canon}, '{_SCHEME}', '')"
    host = f"regexp_extract({rest}, '^([^/?:]*)', 1)"
    tail = f"regexp_replace({rest}, '^[^/?]*', '')"
    if dialect == "spark":
        rev = f"array_join(reverse(split({host}, '[.]')), ',')"
    elif dialect == "duckdb":
        rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    else:
        raise ValueError(f"dialect {dialect!r}")
    return (
        f"CASE WHEN {canon} IS NULL THEN NULL ELSE "
        f"concat({rev}, ')', CASE WHEN {tail} = '' THEN '/' ELSE {tail} END) "
        f"END"
    )


def canonical_url(col: str = "url") -> Column:
    return F.expr(canonical_url_sql(col, "spark"))


def surt_key(col: str = "url") -> Column:
    return F.expr(surt_key_sql(col, "spark"))


def with_canonical_url(
    df: DataFrame, col: str = "url", out: str = "canonical_url"
) -> DataFrame:
    """Attach the canonical form (codegen'd; pushes through scans)."""
    return df.withColumn(out, canonical_url(col))


def url_dedup(df: DataFrame, col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest ``id_col`` row per canonical URL — the
    crawl-level exact-URL dedup. ONE shuffle (a window on the canonical
    key), not a groupBy + join pair."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("__canon").orderBy(F.asc(id_col))
    return (
        df.select("*", canonical_url(col).alias("__canon"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__canon", "__rn")
    )


def host_expr(col: str = "url") -> Column:
    """Canonical host of a URL column (lowercased, port/query stripped) —
    the shared grouping key of host_stats / domain_cap_sample / the
    streaming cap."""
    return F.regexp_extract(
        F.regexp_replace(canonical_url(col), _SCHEME, ""), "^([^/?:]*)", 1
    )


def host_stats(df: DataFrame, col: str = "url") -> DataFrame:
    """Documents per registrable host (SURT-grouped): the standard crawl
    composition report. One map-side-combining aggregation."""
    host = host_expr(col)
    return (
        df.select(host.alias("host"))
        .where(F.col("host") != "")
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
    )


def domain_cap_sample(
    df: DataFrame,
    cap: int,
    col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per host — the standard
    domain-balance step (C4 and friends cap any one site's share so a
    wiki mirror or link farm cannot dominate the corpus). The kept
    subset is DETERMINISTIC (md5 of the id orders each host's rows, so
    reruns, repartitionings and engines agree), and the plan is ONE
    shuffle: a row_number window on the host key whose per-host top-cap
    prunes map-side via WindowGroupLimit — never a groupBy + join pair,
    and the 100 TB corpus crosses the exchange once."""
    from pyspark.sql.window import Window

    host = host_expr(col)
    w = Window.partitionBy("__host").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select("*", host.alias("__host"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__host", "__rn")
    )


__all__ = [
    "canonical_url",
    "canonical_url_sql",
    "surt_key",
    "surt_key_sql",
    "with_canonical_url",
    "url_dedup",
    "host_expr",
    "host_stats",
    "domain_cap_sample",
]
