"""Structured Streaming surface: incremental ingestion beyond the
reference's batch-append model (SURVEY §2.8)."""

from .append import (
    stream_append_to_zarr,
    stream_manifest,
    streaming_dedup,
    watermarked_event_rollup,
)
from .stateful import (
    stateful_sessionize,
    streaming_domain_cap,
    streaming_hamming_dedup,
    streaming_minhash_dedup,
)

__all__ = [
    "stream_manifest",
    "stream_append_to_zarr",
    "streaming_dedup",
    "watermarked_event_rollup",
    "stateful_sessionize",
    "streaming_minhash_dedup",
    "streaming_hamming_dedup",
    "streaming_domain_cap",
]
