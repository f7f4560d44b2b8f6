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
from typing import Tuple

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
