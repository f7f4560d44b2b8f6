"""Pure stdlib+numpy WAV (RIFF/WAVE) codec.

Makes the multimodal audio path REAL for the one format that needs no
external codec library: PCM WAV — 8-bit unsigned, 16/24/32-bit signed
little-endian, and IEEE float32/float64, any channel count. Tests
cross-check against the independent stdlib ``wave`` implementation.

Reference parity note: the reference delegates all media decoding to
external libraries; this engine decodes WAV natively so audio feature
extraction (see operators/multimodal.py) runs on genuine samples.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

WAV_FORMAT_PCM = 1
WAV_FORMAT_IEEE_FLOAT = 3
WAV_FORMAT_EXTENSIBLE = 0xFFFE


def decode_wav(buf: bytes) -> Tuple[np.ndarray, int]:
    """Decode a WAV file → (samples[frames, channels] float32 in [-1, 1],
    sample_rate). Walks RIFF chunks, so fact/LIST/cue chunks are skipped."""
    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == WAV_FORMAT_EXTENSIBLE:
        # the real format is the first 2 bytes of the SubFormat GUID
        if len(fmt) < 26:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk truncated")
        (audio_format,) = struct.unpack("<H", fmt[24:26])
    if n_channels < 1:
        raise ValueError("WAV with zero channels")
    if audio_format == WAV_FORMAT_IEEE_FLOAT:
        dtype = {32: "<f4", 64: "<f8"}.get(bits)
        if dtype is None:
            raise ValueError(f"float WAV with {bits} bits unsupported")
        arr = np.frombuffer(data, dtype=dtype).astype(np.float32)
    elif audio_format == WAV_FORMAT_PCM:
        if bits == 8:
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            val = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            val = np.where(val >= 1 << 23, val - (1 << 24), val)
            arr = val.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"PCM WAV with {bits} bits unsupported")
    else:
        raise NotImplementedError(
            f"WAV format code {audio_format} unsupported (PCM and IEEE float are)"
        )
    frames = len(arr) // n_channels
    return arr[: frames * n_channels].reshape(frames, n_channels), int(sample_rate)


def decode_wav_batch(blobs) -> Optional[Tuple[np.ndarray, int, int]]:
    """Uniform-corpus fast path for :func:`decode_wav` (r13, guide §4.2):
    when every blob shares the SAME byte layout outside its data chunk
    (identical header/trailer bytes and total length — the common case
    for a synthesized or single-recorder corpus), the data regions
    concatenate into ONE buffer and a single ``frombuffer``/``astype``
    pass decodes the whole batch, instead of one RIFF walk + two small
    allocations per clip. Returns ``(mono float32 (m, frames), rate,
    channels)`` with values bit-identical to per-blob ``decode_wav`` +
    ``mean(axis=1)`` downmix (same elementwise conversions, same
    reduction order), or ``None`` whenever ANY blob deviates — ragged
    corpora fall back to the scalar path, never decode inconsistently."""
    if not blobs:
        return None
    b0 = bytes(blobs[0])
    if len(b0) < 12 or b0[:4] != b"RIFF" or b0[8:12] != b"WAVE":
        return None
    pos, fmt, dstart, dend = 12, None, None, None
    while pos + 8 <= len(b0):
        cid = b0[pos : pos + 4]
        (size,) = struct.unpack("<I", b0[pos + 4 : pos + 8])
        if cid == b"fmt ":
            fmt = b0[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            dstart, dend = pos + 8, pos + 8 + size
        pos += 8 + size + (size & 1)
    if fmt is None or len(fmt) < 16 or dstart is None or dend > len(b0):
        return None  # truncated/odd layouts take the scalar path
    audio_format, n_channels, sample_rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == WAV_FORMAT_EXTENSIBLE:
        if len(fmt) < 26:
            return None
        (audio_format,) = struct.unpack("<H", fmt[24:26])
    if n_channels < 1:
        return None
    n, pre, post = len(b0), b0[:dstart], b0[dend:]
    for b in blobs[1:]:
        bb = bytes(b)
        if len(bb) != n or bb[:dstart] != pre or bb[dend:] != post:
            return None
    dlen = dend - dstart
    itemsize = {8: 1, 16: 2, 24: 3, 32: 4, 64: 8}.get(bits)
    if itemsize is None or dlen % itemsize:
        # a trailing partial sample would misalign the concatenated
        # buffer across blob boundaries — scalar path handles it
        return None
    buf = b"".join(bytes(b)[dstart:dend] for b in blobs)
    # identical elementwise conversions to decode_wav, over one buffer
    if audio_format == WAV_FORMAT_IEEE_FLOAT:
        dtype = {32: "<f4", 64: "<f8"}.get(bits)
        if dtype is None:
            return None
        vals = np.frombuffer(buf, dtype=dtype).astype(np.float32)
    elif audio_format == WAV_FORMAT_PCM:
        if bits == 8:
            vals = (np.frombuffer(buf, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            vals = np.frombuffer(buf, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 3)
            val = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            val = np.where(val >= 1 << 23, val - (1 << 24), val)
            vals = val.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            vals = np.frombuffer(buf, dtype="<i4").astype(np.float32) / float(1 << 31)
        else:
            return None
    else:
        return None
    per = vals.size // len(blobs)
    frames = per // n_channels
    mat = vals.reshape(len(blobs), per)[:, : frames * n_channels].reshape(
        len(blobs), frames, n_channels
    )
    # same per-(clip, frame) reduction the scalar downmix performs
    return mat.mean(axis=2), int(sample_rate), int(n_channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Encode float samples in [-1, 1] (frames or frames×channels) to PCM
    or float32 WAV bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    if bits == 16:
        data = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2").tobytes()
        audio_format, balign = WAV_FORMAT_PCM, n_channels * 2
    elif bits == 8:
        data = np.clip(np.round(arr * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
        audio_format, balign = WAV_FORMAT_PCM, n_channels
    elif bits == 24:
        val = np.clip(np.round(arr * float(1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int64)
        val = np.where(val < 0, val + (1 << 24), val)
        raw = np.empty((val.size, 3), dtype=np.uint8)
        flat = val.ravel()
        raw[:, 0] = flat & 0xFF
        raw[:, 1] = (flat >> 8) & 0xFF
        raw[:, 2] = (flat >> 16) & 0xFF
        data = raw.tobytes()
        audio_format, balign = WAV_FORMAT_PCM, n_channels * 3
    elif bits == 32:
        data = arr.astype("<f4").tobytes()
        audio_format, balign = WAV_FORMAT_IEEE_FLOAT, n_channels * 4
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    fmt = struct.pack(
        "<HHIIHH",
        audio_format,
        n_channels,
        sample_rate,
        sample_rate * balign,
        balign,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_batch(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> list:
    """Vectorized :func:`encode_wav` over a mono batch (r13, guide
    §4.2): one clip/round/astype over the whole ``(m, frames)`` matrix
    instead of per-clip small-array passes; the shared RIFF header is
    packed once. Per-row bytes are IDENTICAL to ``encode_wav(row)``
    (same elementwise conversions — pinned in tests/test_audioio.py)."""
    mat = np.asarray(samples, dtype=np.float64)
    if mat.ndim != 2:
        raise ValueError("encode_wav_batch expects a (m, frames) mono batch")
    m, n_frames = mat.shape
    if bits == 16:
        rows = np.clip(np.round(mat * 32768.0), -32768, 32767).astype("<i2")
        audio_format, balign = WAV_FORMAT_PCM, 2
    elif bits == 8:
        rows = np.clip(np.round(mat * 128.0 + 128.0), 0, 255).astype(np.uint8)
        audio_format, balign = WAV_FORMAT_PCM, 1
    elif bits == 24:
        val = np.clip(
            np.round(mat * float(1 << 23)), -(1 << 23), (1 << 23) - 1
        ).astype(np.int64)
        val = np.where(val < 0, val + (1 << 24), val)
        raw = np.empty((val.size, 3), dtype=np.uint8)
        flat = val.ravel()
        raw[:, 0] = flat & 0xFF
        raw[:, 1] = (flat >> 8) & 0xFF
        raw[:, 2] = (flat >> 16) & 0xFF
        rows = raw.reshape(m, n_frames * 3)
        audio_format, balign = WAV_FORMAT_PCM, 3
    elif bits == 32:
        rows = mat.astype("<f4")
        audio_format, balign = WAV_FORMAT_IEEE_FLOAT, 4
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    dlen = n_frames * balign
    pad = b"\x00" if dlen & 1 else b""
    fmt = struct.pack(
        "<HHIIHH", audio_format, 1, sample_rate, sample_rate * balign, balign, bits
    )
    head = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + dlen + len(pad))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", dlen)
    )
    return [head + rows[i].tobytes() + pad for i in range(m)]
