"""Execute the example scripts end-to-end (each asserts its own
invariants and prints an OK line) so the documented entry points cannot
rot. Marked slow-ish: each boots a SparkSession subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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


@pytest.mark.parametrize("script,marker", _EXAMPLES)
def test_example_runs(script, marker):
    path = os.path.join(_ROOT, "examples", script)
    env = {**os.environ, "PYTHONPATH": _ROOT}
    out = subprocess.run(
        [sys.executable, path],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    if marker:
        assert marker in out.stdout, out.stdout[-2000:]
