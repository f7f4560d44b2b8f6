"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample stages as Arrow-batched
``mapInPandas`` transforms.

PNG, JPEG and WAV payloads all decode for REAL with no external
library: :mod:`..pngio` (zlib inflate + per-row unfilter),
:mod:`..jpegio` (baseline Huffman-DCT decode), and :mod:`..audioio`
(RIFF/PCM/float parse). Unknown payload formats fall through to a
clearly-marked deterministic sha256 fake decoder so the Spark-side
plumbing (schemas, batching, partitioning) stays exercised end-to-end
for any corpus.

Scale notes: binary payloads stay opaque to Catalyst (no row explosion
until feature extraction); per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; feature vectors come
back as fixed-width ``array<float>`` columns ready for the similarity
operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional, Sequence

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


def attach_png_media(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 8,
) -> DataFrame:
    """Synthesize REAL PNG payloads (encoded by :mod:`..pngio`): pixel
    ``i`` of doc ``d`` is ``(d*31 + i*7) % 256`` — a closed form a SQL
    oracle can recompute — but the bytes on the wire are genuine
    zlib-compressed, per-row-filtered PNG that ``decode_image`` must
    really decode. Filter types cycle with the row and doc so all five
    unfilter paths are exercised across a corpus."""
    from ..pngio import encode_png_batch

    n = width * height

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(n, dtype=np.int64)
        rows_r = np.arange(height, dtype=np.int64)
        for pdf in batches:
            # whole-batch pixel + filter synthesis, whole-batch filter
            # prediction (encode_png_batch): per image only the deflate
            # + chunk assembly remain Python-side
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            px = ((ids[:, None] * 31 + idx[None, :] * 7) % 256).astype(
                np.uint8
            )
            filters = ((ids[:, None] + rows_r[None, :]) % 5).astype(np.uint8)
            blobs = encode_png_batch(
                px.reshape(-1, height, width), filters
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media": blobs,
                    "format": ["image/png"] * len(pdf),
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "n_frames": np.ones(len(pdf), dtype="int32"),
                }
            )

    return df.select(id_col).mapInPandas(build, MEDIA_SCHEMA)


def attach_wav_media(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 256,
    sample_rate: int = 8000,
) -> DataFrame:
    """Synthesize REAL 16-bit PCM WAV payloads (encoded by
    :mod:`..audioio`): sample ``i`` of doc ``d`` is a triangle wave with
    doc-dependent period — a closed form tests can recompute — but the
    bytes on the wire are genuine RIFF/WAVE that ``decode_audio`` must
    really parse."""
    from ..audioio import encode_wav_batch

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            # whole-batch synthesis + ONE vectorized encode pass (r13,
            # guide §4.2): same elementwise math per clip as the former
            # per-doc loop, so the bytes on the wire are identical
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            periods = (8 + ids % 23)[:, None]
            tri = (
                np.abs((idx[None, :] % periods) * 2.0 / periods - 1.0) * 2.0 - 1.0
            )
            blobs = encode_wav_batch(tri * 0.5, sample_rate, bits=16)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media": blobs,
                    "format": ["audio/wav"] * len(pdf),
                    "width": np.full(len(pdf), n_samples, dtype="int32"),
                    "height": np.ones(len(pdf), dtype="int32"),
                    "n_frames": np.full(len(pdf), n_samples, dtype="int32"),
                }
            )

    return df.select(id_col).mapInPandas(build, MEDIA_SCHEMA)


def decode_audio(df: DataFrame) -> DataFrame:
    """Decode binary → (doc_id, samples array<float>, sample_rate, channels)
    via mapInPandas. RIFF/WAVE blobs (signature-sniffed) decode for REAL
    through :mod:`..audioio`; other payloads take the deterministic
    sha256 fake (keeping non-audio rows flowing through the same plan)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..audioio import decode_wav, decode_wav_batch

        for pdf in batches:
            blobs = [bytes(b) for b in pdf["media"]]
            samples: list = [None] * len(blobs)
            rates = np.zeros(len(blobs), dtype="int32")
            chans = np.zeros(len(blobs), dtype="int32")
            # uniform-layout WAV corpora (the common case) decode as ONE
            # frombuffer/astype pass (r13, guide §4.2); anything ragged
            # falls through to the per-blob scalar decode below
            wav_idx = [
                i
                for i, b in enumerate(blobs)
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE"
            ]
            if wav_idx:
                batch = decode_wav_batch([blobs[i] for i in wav_idx])
                if batch is not None:
                    mono, rate, ch = batch
                    for j, i in enumerate(wav_idx):
                        samples[i] = mono[j]
                        rates[i] = rate
                        chans[i] = ch
            for i, blob in enumerate(blobs):
                if samples[i] is not None:
                    continue
                if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                    arr, rate = decode_wav(blob)
                    samples[i] = arr.mean(axis=1)  # downmix to mono
                    rates[i] = rate
                    chans[i] = arr.shape[1]
                else:
                    digest = hashlib.sha256(blob).digest()
                    fake = np.frombuffer((digest * 2)[:64], dtype=np.uint8)
                    samples[i] = fake.astype("float32") / 255.0 - 0.5
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "samples": samples,
                    "sample_rate": rates,
                    "channels": chans,
                }
            )

    return df.select("doc_id", "media").mapInPandas(
        decode, "doc_id long, samples array<float>, sample_rate int, channels int"
    )


def audio_features(decoded: DataFrame) -> DataFrame:
    """Per-clip features over decoded samples: duration, RMS energy,
    zero-crossing rate, peak amplitude — the audio analogue of
    :func:`extract_features`."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dur, rms, zcr, peak = [], [], [], []
            for px, rate in zip(pdf["samples"], pdf["sample_rate"]):
                arr = np.asarray(px, dtype="float64")
                n = max(arr.size, 1)
                dur.append(arr.size / rate if rate else 0.0)
                rms.append(float(np.sqrt(np.mean(arr**2))) if arr.size else 0.0)
                zcr.append(float(np.count_nonzero(np.diff(np.signbit(arr)))) / n)
                peak.append(float(np.max(np.abs(arr))) if arr.size else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "duration_s": np.array(dur, dtype="float64"),
                    "rms": np.array(rms, dtype="float64"),
                    "zero_crossing_rate": np.array(zcr, dtype="float64"),
                    "peak": np.array(peak, dtype="float64"),
                }
            )

    return decoded.mapInPandas(
        feats,
        "doc_id long, duration_s double, rms double, "
        "zero_crossing_rate double, peak double",
    )


def attach_jpeg_media(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
    subsample: bool = False,
) -> DataFrame:
    """Synthesize REAL baseline JPEG payloads (encoded by
    :mod:`..jpegio`): a smooth doc-dependent luminance ramp, so decode
    error stays within quantization bounds tests can assert."""
    from ..jpegio import encode_jpeg

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            blobs = []
            for d in pdf[id_col]:
                img = (128 + 60 * np.sin((xx + int(d)) / 5.0) * np.cos(yy / 4.0)).astype(
                    np.uint8
                )
                blobs.append(encode_jpeg(img, quality=95, subsample=subsample))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media": blobs,
                    "format": ["image/jpeg"] * len(pdf),
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "n_frames": np.ones(len(pdf), dtype="int32"),
                }
            )

    return df.select(id_col).mapInPandas(build, MEDIA_SCHEMA)


def decode_image(df: DataFrame, keep_dims: bool = False) -> DataFrame:
    """Decode binary → (doc_id, pixels array<float>) via mapInPandas.
    With ``keep_dims=True`` the grayscale (height, width) ride along as
    int columns so shape-aware consumers (e.g. the pHash DCT in
    :mod:`.imagehash`) can reshape the flat pixels.

    PNG blobs (signature-sniffed) decode for REAL through
    :mod:`..pngio` — zlib inflate + unfilter — JPEG blobs through
    :mod:`..jpegio` (baseline Huffman DCT), and raw JPEG2000
    codestreams through :mod:`..jp2kio` (T.800 subset), all
    grayscale-averaged to normalized floats. Other formats take the
    deterministic sha256 fake so the Spark plumbing (schema, batch
    shape, partition flow) stays testable end-to-end regardless of
    payload type.
    """
    from ..jp2kio import decode_j2k
    from ..jpegio import decode_jpeg
    from ..pngio import PNG_SIGNATURE, decode_png, decode_png_batch

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["media"]]
            pixels: list = [None] * len(blobs)
            dims: list = [None] * len(blobs)
            # same-shape plain-8-bit PNGs (the common corpus case) decode
            # as ONE batched unfilter pass; anything else falls through
            # to the scalar decoders below
            png_idx = [
                i for i, b in enumerate(blobs) if b[:8] == PNG_SIGNATURE
            ]
            if png_idx:
                batch = decode_png_batch([blobs[i] for i in png_idx])
                if batch is not None:
                    fb = batch.astype("float32")
                    if fb.ndim == 4:  # channel-average to grayscale
                        fb = fb.mean(axis=3)
                    flat = fb.reshape(len(png_idx), -1) / 255.0
                    for j, i in enumerate(png_idx):
                        pixels[i] = flat[j]
                        dims[i] = fb.shape[1:3]
            for i, blob in enumerate(blobs):
                if pixels[i] is not None:
                    continue
                if blob[:8] == PNG_SIGNATURE:
                    arr = decode_png(blob).astype("float32")
                elif blob[:2] == b"\xff\xd8":
                    arr = decode_jpeg(blob).astype("float32")
                elif blob[:4] == b"\xff\x4f\xff\x51":
                    img, depth, _ = decode_j2k(blob)
                    arr = img.astype("float32") * (255.0 / ((1 << depth) - 1))
                else:
                    # deterministic fake decode: sha256-seeded 8x8 grayscale
                    digest = hashlib.sha256(blob).digest()
                    arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8).astype(
                        "float32"
                    )
                    pixels[i] = arr / 255.0
                    dims[i] = (8, 8)
                    continue
                if arr.ndim == 3:  # channel-average to grayscale
                    arr = arr.mean(axis=2)
                if keep_dims:
                    dims[i] = arr.shape
                pixels[i] = arr.ravel() / 255.0
            cols = {"doc_id": pdf["doc_id"], "pixels": pixels}
            if keep_dims:
                cols["height"] = [d[0] for d in dims]
                cols["width"] = [d[1] for d in dims]
            yield pd.DataFrame(cols)

    schema = "doc_id long, pixels array<float>"
    if keep_dims:
        schema += ", height int, width int"
    return df.select("doc_id", "media").mapInPandas(decode, schema)


def extract_features(
    decoded: DataFrame, dim: int = 16, keep_pixels: bool = False
) -> DataFrame:
    """Feature extraction: fold pixels to a fixed-dim embedding (mean-pool
    blocks). Deterministic; output ready for operators.similarity.
    ``keep_pixels=True`` passes the pixel array through so a consumer
    needing both representations gets them from ONE decode pass instead
    of two subtrees re-running the decode."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px_list = [np.asarray(p, dtype="float32") for p in pdf["pixels"]]
            lens = {p.shape[0] for p in px_list}
            if len(lens) == 1 and next(iter(lens)) % dim == 0:
                # equal-length, evenly divisible: ONE stacked reshape-mean
                # for the whole batch (bit-identical to the per-image
                # array_split path — same float32 8-ish-element sums)
                mat = np.stack(px_list).reshape(len(px_list), dim, -1)
                out = list(mat.mean(axis=2))
            else:
                out = [
                    np.array(
                        [b.mean() for b in np.array_split(arr, dim)],
                        dtype="float32",
                    )
                    for arr in px_list
                ]
            cols = {"doc_id": pdf["doc_id"]}
            if keep_pixels:
                cols["pixels"] = pdf["pixels"]
            cols["features"] = out
            yield pd.DataFrame(cols)

    schema = (
        "doc_id long, pixels array<float>, features array<float>"
        if keep_pixels
        else "doc_id long, features array<float>"
    )
    return decoded.mapInPandas(feats, schema)


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


def _resize_plane_batch(
    arr: np.ndarray, out_h: int, out_w: int, method: str
) -> np.ndarray:
    """Resize a (n, h, w) float batch to (n, out_h, out_w) with pure
    numpy — one vectorized gather (nearest) or four gathers + lerp
    (bilinear, the standard align_corners=False pixel-center
    convention). No per-image Python."""
    n, h, w = arr.shape
    if method == "nearest":
        ys = np.minimum(
            ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1
        )
        xs = np.minimum(
            ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1
        )
        return arr[:, ys[:, None], xs[None, :]]
    if method != "bilinear":
        raise ValueError(f"resize method {method!r} (nearest | bilinear)")
    fy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    fx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = fy.astype(np.int64)
    x0 = fx.astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[None, :, None]
    wx = (fx - x0)[None, None, :]
    top = arr[:, y0[:, None], x0[None, :]] * (1 - wx) + arr[
        :, y0[:, None], x1[None, :]
    ] * wx
    bot = arr[:, y1[:, None], x0[None, :]] * (1 - wx) + arr[
        :, y1[:, None], x1[None, :]
    ] * wx
    return top * (1 - wy) + bot * wy


def resize_images(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    method: str = "bilinear",
    methods: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Resize decoded media to a fixed (out_h, out_w) grid — the
    standard pre-embedding normalization stage. Input is the media
    frame (``attach_*_media`` schema); PNG payloads decode through the
    batched codec path and every same-shape group resizes as ONE numpy
    gather/lerp (no per-image Python in the common case); other
    decodable payloads take the scalar decoders. Output:
    ``(doc_id, pixels array<float>, width, height)`` with pixels the
    row-major flattened resized grayscale in [0, 1].

    r12 (guide §1.2): ``methods`` resizes to SEVERAL interpolation
    methods in ONE decode pass — output gains a leading ``method``
    column, one row per (image, method). Callers comparing methods
    previously ran the whole encode+decode chain once per method; the
    decode dominates, the per-method gather/lerp is the cheap tail."""
    from ..jp2kio import decode_j2k
    from ..jpegio import decode_jpeg
    from ..pngio import PNG_SIGNATURE, decode_png, decode_png_batch

    multi = methods is not None
    method_list = list(methods) if multi else [method]
    for m in method_list:
        if m not in ("nearest", "bilinear"):
            raise ValueError(f"resize method {m!r} (nearest | bilinear)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["media"]]
            # decode once per image into float64 grayscale planes
            grays: list = [None] * len(blobs)
            png_idx = [
                i for i, b in enumerate(blobs) if b[:8] == PNG_SIGNATURE
            ]
            png_batch = None
            if png_idx:
                batch = decode_png_batch([blobs[i] for i in png_idx])
                if batch is not None:
                    png_batch = batch.astype("float64")
                    if png_batch.ndim == 4:
                        png_batch = png_batch.mean(axis=3)
            if png_batch is None:
                png_idx = []
            png_set = set(png_idx)
            for i, blob in enumerate(blobs):
                if i in png_set:
                    continue
                if blob[:8] == PNG_SIGNATURE:
                    arr = decode_png(blob).astype("float64")
                elif blob[:2] == b"\xff\xd8":
                    arr = decode_jpeg(blob).astype("float64")
                elif blob[:4] == b"\xff\x4f\xff\x51":
                    img, depth, _ = decode_j2k(blob)
                    arr = img.astype("float64") * (255.0 / ((1 << depth) - 1))
                else:
                    digest = hashlib.sha256(blob).digest()
                    arr = np.frombuffer((digest * 2)[:64], np.uint8).astype(
                        "float64"
                    ).reshape(8, 8)
                if arr.ndim == 3:
                    arr = arr.mean(axis=2)
                grays[i] = arr

            def resized_planes(m: str) -> list:
                planes: list = [None] * len(blobs)
                if png_idx:
                    rs = _resize_plane_batch(png_batch, out_h, out_w, m)
                    flat = (rs / 255.0).astype("float32").reshape(
                        len(png_idx), -1
                    )
                    for j, i in enumerate(png_idx):
                        planes[i] = flat[j]
                for i, arr in enumerate(grays):
                    if arr is None:
                        continue
                    rs = _resize_plane_batch(arr[None, :, :], out_h, out_w, m)[0]
                    planes[i] = (rs / 255.0).astype("float32").ravel()
                return planes

            for m in method_list:
                out = {
                    "doc_id": pdf["doc_id"],
                    "pixels": resized_planes(m),
                    "width": np.full(len(blobs), out_w, dtype="int32"),
                    "height": np.full(len(blobs), out_h, dtype="int32"),
                }
                if multi:
                    out = {"method": np.repeat(m, len(blobs)), **out}
                yield pd.DataFrame(out)

    schema = "doc_id long, pixels array<float>, width int, height int"
    if multi:
        schema = "method string, " + schema
    return df.select("doc_id", "media").mapInPandas(run, schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Per-source binary column statistics — pure built-in functions (the
    SQL-oracle-checkable face of the multimodal surface)."""
    return df.groupBy("format").agg(
        F.count("*").alias("n_blobs"),
        F.sum(F.octet_length("media")).alias("total_bytes"),
        F.countDistinct(F.md5("media")).alias("distinct_blobs"),
    )
