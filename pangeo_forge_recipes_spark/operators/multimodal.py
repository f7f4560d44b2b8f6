"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample stages as Arrow-batched
``mapInPandas`` transforms.

The container environment has no image/audio codecs, so the *decode*
kernels are stubbed exactly as the charter requires: attempting a real
decode raises ``NotImplementedError`` unless a library is importable, and
a clearly-marked deterministic fake decoder exercises the real Spark-side
plumbing (schemas, batching, partitioning) end-to-end.

Scale notes: binary payloads stay opaque to Catalyst (no row explosion
until feature extraction); per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; feature vectors come
back as fixed-width ``array<float>`` columns ready for the similarity
operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, format string, width int, height int, n_frames int"
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic binary 'media' column (utf-8 payload of
    the text) with typed metadata — the canonical multimodal row shape."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("fake/raw").alias("format"),
        (F.length(text_col) % 64 + 1).cast("int").alias("width"),
        (F.length(text_col) % 48 + 1).cast("int").alias("height"),
        (F.length(text_col) % 8 + 1).cast("int").alias("n_frames"),
    )


def _try_real_decoder():
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def decode_image(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Decode binary → (doc_id, pixels array<float>) via mapInPandas.

    STUB: no codec libraries exist in this container. With
    ``use_stub=False`` this raises ``NotImplementedError`` unless PIL is
    importable; the stub path derives a deterministic 8×8 'thumbnail' from
    the payload bytes so the Spark plumbing (schema, batch shape,
    partition flow) is real and testable.
    """
    real = _try_real_decoder()
    if not use_stub and real is None:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, which is not installed; "
            "pass use_stub=True for the deterministic fake decoder"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for blob in pdf["media"]:
                # deterministic fake decode: sha256-seeded 8x8 grayscale
                digest = hashlib.sha256(bytes(blob)).digest()
                arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8).astype("float32")
                pixels.append(arr / 255.0)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pixels": pixels})

    return df.select("doc_id", "media").mapInPandas(
        decode, "doc_id long, pixels array<float>"
    )


def extract_features(decoded: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: fold pixels to a fixed-dim embedding (mean-pool
    blocks). Deterministic; output ready for operators.similarity."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px in pdf["pixels"]:
                arr = np.asarray(px, dtype="float32")
                blocks = np.array_split(arr, dim)
                out.append(np.array([b.mean() for b in blocks], dtype="float32"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": out})

    return decoded.mapInPandas(feats, "doc_id long, features array<float>")


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """'Video' frame sampling: slice the binary payload into n_frames
    segments, keep every ``every``-th → one row per kept frame."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_idx, frame_bytes = [], [], []
            for doc_id, blob, n in zip(pdf["doc_id"], pdf["media"], pdf["n_frames"]):
                blob = bytes(blob)
                n = max(int(n), 1)
                size = max(len(blob) // n, 1)
                for i in range(0, n, every):
                    ids.append(doc_id)
                    frame_idx.append(i)
                    frame_bytes.append(blob[i * size : (i + 1) * size])
            yield pd.DataFrame(
                {"doc_id": ids, "frame": frame_idx, "frame_bytes": frame_bytes}
            )

    return df.select("doc_id", "media", "n_frames").mapInPandas(
        frames, "doc_id long, frame int, frame_bytes binary"
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Per-source binary column statistics — pure built-in functions (the
    SQL-oracle-checkable face of the multimodal surface)."""
    return df.groupBy("format").agg(
        F.count("*").alias("n_blobs"),
        F.sum(F.octet_length("media")).alias("total_bytes"),
        F.countDistinct(F.md5("media")).alias("distinct_blobs"),
    )
