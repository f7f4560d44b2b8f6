"""Pure stdlib+numpy PNG codec (no PIL/pillow in this container).

Implements the public PNG spec subset that covers real-world thumbnails
and ML-pipeline image payloads:

* decode: every legal depth/color combination — 1/2/4/8/16-bit gray,
  1/2/4/8-bit palette, 8/16-bit RGB/gray+alpha/RGBA (sub-byte samples
  return their raw 0..2^depth-1 values); all five filter types
  (None/Sub/Up/Average/Paeth); both interlace methods (none and Adam7 —
  seven independently-filtered passes scattered back into the image);
  ancillary chunks skipped; IDAT spans concatenated; CRCs verified.
* encode: 8-bit gray/RGB/RGBA with a per-row filter choice (default
  None; pass ``filters`` to exercise specific filter paths) — used by
  the multimodal operators and tests to synthesize real PNG payloads.

The decode hot path is row-vectorized: None/Up/Sub are full-numpy (Sub
via a mod-256 prefix sum along the row); Average and Paeth keep the
spec's sequential left-dependency per row.

Reference parity note: the reference delegates image IO to external
codecs; this engine treats images as opaque ``binary`` columns and
decodes them in Arrow-batched stages (operators/multimodal.py).
"""

from __future__ import annotations

import binascii
import struct
import zlib
from typing import List, Optional, Sequence

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", binascii.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def encode_png(
    arr: np.ndarray, filters: Optional[Sequence[int]] = None
) -> bytes:
    """Encode a uint8 array as PNG: (h, w) gray, (h, w, 3) RGB, or
    (h, w, 4) RGBA. ``filters`` gives the per-row filter type (0-4,
    cycled if shorter than the image); default all rows type 0."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png needs uint8 input, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    bpp = channels
    rows = arr.reshape(h, w * channels).astype(np.int32)
    filt = list(filters) if filters else [0]
    out_rows: List[bytes] = []
    prev = np.zeros(w * channels, dtype=np.int32)
    for r in range(h):
        line = rows[r]
        ft = filt[r % len(filt)]
        left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - left
        elif ft == 2:
            enc = line - prev
        elif ft == 3:
            enc = line - (left + prev) // 2
        elif ft == 4:
            enc = line - _paeth_predict(left, prev, upleft)
        else:
            raise ValueError(f"filter type {ft} (PNG defines 0-4)")
        out_rows.append(bytes([ft]) + (enc & 255).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows), 6)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse the per-row filters of one (sub)image. ``raw`` is
    (h, stride+1) uint8 — filter byte + filtered scanline per row."""
    h, stride1 = raw.shape
    stride = stride1 - 1
    w = stride // bpp
    recon = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        ft = raw[r, 0]
        line = raw[r, 1:].astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 1:
            # Sub: recon(x) = raw(x) + recon(x - bpp) → per-lane mod-256
            # prefix sum (vectorized)
            cur = np.cumsum(line.reshape(w, bpp), axis=0).reshape(stride) & 255
        elif ft == 2:
            cur = (line + prev) & 255
        elif ft == 3:
            cur = line.copy()
            cur[:bpp] = (cur[:bpp] + prev[:bpp] // 2) & 255
            for i in range(bpp, stride):
                cur[i] = (cur[i] + (cur[i - bpp] + prev[i]) // 2) & 255
        elif ft == 4:
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 255
        else:
            raise ValueError(f"PNG filter type {ft}")
        recon[r] = cur
        prev = cur
    return recon


# Adam7: (x0, y0, dx, dy) per pass (spec starting_col/starting_row tables)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _deinterlace_adam7(decomp: np.ndarray, w: int, h: int, bpp: int) -> np.ndarray:
    """Seven independently-filtered Adam7 passes → full (h, w*bpp) image."""
    out = np.zeros((h, w * bpp), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        stride = pw * bpp
        need = ph * (stride + 1)
        if pos + need > decomp.size:
            raise ValueError("PNG Adam7 data truncated")
        sub = _unfilter(decomp[pos : pos + need].reshape(ph, stride + 1), bpp)
        pos += need
        cols = (x0 + np.arange(pw) * dx) * bpp
        col_idx = (cols[:, None] + np.arange(bpp)[None, :]).ravel()
        out[y0::dy][:ph][:, col_idx] = sub
    if pos != decomp.size:
        raise ValueError("PNG Adam7 data has trailing bytes")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8/uint16 array of shape (h, w) for
    grayscale or (h, w, channels) otherwise. Palette images return
    expanded (h, w, 3) RGB."""
    data = bytes(data)
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat: List[bytes] = []
    plte = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if binascii.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if compression != 0 or filter_method != 0:
        raise ValueError("PNG: nonzero compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG color type {color_type}")
    valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if depth not in valid_depths[color_type]:
        raise ValueError(
            f"PNG bit depth {depth} invalid for color type {color_type}"
        )
    channels = _CHANNELS[color_type]
    decomp = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if depth < 8:
        # sub-byte gray/palette samples: filters operate on BYTES with
        # bpp = 1 (spec), then each row's bit stream expands to pixels
        def expand(rows: np.ndarray, width: int) -> np.ndarray:
            bits = np.unpackbits(rows, axis=1)[:, : width * depth]
            vals = bits.reshape(len(rows), width, depth).astype(np.uint8)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            return (vals * weights).sum(axis=2).astype(np.uint8)

        if interlace == 1:
            px = np.zeros((h, w), np.uint8)
            pos = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = -(-(w - x0) // dx) if w > x0 else 0
                ph = -(-(h - y0) // dy) if h > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                stride = (pw * depth + 7) // 8
                need = ph * (stride + 1)
                sub = _unfilter(decomp[pos : pos + need].reshape(ph, stride + 1), 1)
                pos += need
                px[y0::dy][:ph][:, x0::dx] = expand(sub, pw)
        else:
            stride = (w * depth + 7) // 8
            if decomp.size != h * (stride + 1):
                raise ValueError(
                    f"PNG data size {decomp.size} != expected {h * (stride + 1)}"
                )
            px = expand(_unfilter(decomp.reshape(h, stride + 1), 1), w)
        arr = px[:, :, None]
    else:
        bytes_per = depth // 8
        bpp = channels * bytes_per
        stride = w * bpp
        if interlace == 1:
            recon = _deinterlace_adam7(decomp, w, h, bpp)
        else:
            if decomp.size != h * (stride + 1):
                raise ValueError(
                    f"PNG data size {decomp.size} != expected {h * (stride + 1)}"
                )
            recon = _unfilter(decomp.reshape(h, stride + 1), bpp)
        if depth == 16:
            arr = recon.reshape(h, w, channels, 2).astype(np.uint16)
            arr = (arr[..., 0] << 8) | arr[..., 1]
        else:
            arr = recon.reshape(h, w, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("PNG palette image missing PLTE chunk")
        arr = plte[arr[:, :, 0]]
    if arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return arr
