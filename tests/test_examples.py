"""Execute the example scripts end-to-end (each asserts its own
invariants and prints an OK line) so the documented entry points cannot
rot. Marked slow-ish: each boots a SparkSession subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Subprocess budget: corpus_pipeline alone runs ~330 s on a quiet box of
# this round's (slow-SIMD) hardware class, so 420 s flaked under any
# co-load; 900 s keeps the guard meaningful without load sensitivity.
_EXAMPLE_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_EXAMPLE_TIMEOUT_S", "900"))

_EXAMPLES = [
    ("warc_ingest.py", "new vs snapshot"),
    ("corpus_pipeline.py", "corpus_pipeline OK"),
    ("kerchunk_reference.py", None),
    ("rechunk_existing.py", None),
    ("append_daily.py", "verified"),
    ("gpcp_like.py", "verified"),
    ("terraclimate_like.py", "verified"),
    ("events_to_zarr.py", "events_to_zarr OK"),
    ("snapshot_refresh.py", "pages reprocessed this refresh"),
    ("http_ingest.py", "kerchunk scan over http"),
    ("quality_to_tfrecord.py", "quality_to_tfrecord OK"),
    ("retrieval_index.py", "retrieval_index OK"),
    ("cloud_pyramid.py", "cloud_pyramid OK"),
]


@pytest.mark.examples
@pytest.mark.parametrize("script,marker", _EXAMPLES)
def test_example_runs(script, marker):
    path = os.path.join(_ROOT, "examples", script)
    env = {**os.environ, "PYTHONPATH": _ROOT}
    out = subprocess.run(
        [sys.executable, path],
        env=env,
        capture_output=True,
        text=True,
        timeout=_EXAMPLE_TIMEOUT_S,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    if marker:
        assert marker in out.stdout, out.stdout[-2000:]


def test_bake_example_feedstock_to_s3_with_prune(spark):
    """The reference's integration shape (tests/test_integration.py:
    105-141): bake the examples/feedstock recipes against an object
    store with --prune — meta.yaml discovery, config injection, input
    cache, pruned pattern, both pipeline kinds."""
    from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
    from pangeo_forge_recipes_spark.runner import bake, parse_meta
    from pangeo_forge_recipes_spark.s3io import configure_spark_s3
    from pangeo_forge_recipes_spark.zarrio import open_group

    from .fake_s3 import FakeS3

    fs = os.path.join(_ROOT, "examples", "feedstock")
    assert [e["id"] for e in parse_meta(fs)] == [
        "daily-zarr",
        "daily-reference",
    ]
    srv = FakeS3()
    try:
        configure_spark_s3(spark, **srv.client_kwargs())
        config = {
            "TargetStorage": {"root_path": "s3://bakery/target"},
            "InputCacheStorage": {"root_path": "s3://bakery/cache"},
        }
        result = bake(
            fs, config=config, recipe_id="daily-zarr", prune=True,
            spark=spark,
        )
        assert result.path == "s3://bakery/target/daily.zarr"
        ds = result.open()
        # --prune keeps the first two concat keys only
        assert ds.sizes["time"] == 2
        assert float(ds["temp"].data[1, 0, 0]) == 10.0
        # the input cache absorbed the source files
        assert any(k.startswith("cache/") for (b, k) in srv.objects if b == "bakery")
        # group metadata is real zarr-v3 on the object store
        grp = open_group("s3://bakery/target/daily.zarr")
        assert "temp" in grp.array_names()
        refpath = bake(
            fs, config=config, recipe_id="daily-reference", prune=True,
            spark=spark,
        )
        back = open_reference_dataset(refpath)
        assert back.sizes["time"] == 2
        assert float(back["temp"].data[0, 2, 3]) == pytest.approx(2.3)
    finally:
        srv.stop()
