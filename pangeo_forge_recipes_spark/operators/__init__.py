"""Extension operators for large-scale training-data pipelines.

Beyond reference parity (BASELINE.json north star): deduplication,
similarity search, text analysis and multimodal-column handling over
tabular corpora — plain Spark SQL/DataFrame ops (joins, windows, Catalyst)
on the engine's tabular side.
"""

from . import (  # noqa: F401
    asof,
    audiohash,
    bloom,
    classifier,
    clustering,
    components,
    dedup,
    dsir,
    filters,
    imagehash,
    lmscore,
    multimodal,
    ranges,
    similarity,
    skew,
    text,
    urls,
)
