from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pangeo_forge_recipes_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(autouse=True)
def _stable_session_conf(request):
    """The session-scoped SparkSession is shared by every test; anything
    that flips session confs (e.g. ``__spark_entry__._register`` sets
    ``spark.sql.timestampType=TIMESTAMP_NTZ`` for DuckDB-naive timestamp
    parity) would otherwise leak into later tests. Restore the confs each
    test mutates."""
    if "spark" not in request.fixturenames:
        yield
        return
    spark = request.getfixturevalue("spark")
    keys = ["spark.sql.timestampType", "spark.sql.legacy.parquet.nanosAsLong"]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
