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
    stride = w * channels
    rows = arr.reshape(h, stride).astype(np.int32)
    filt = list(filters) if filters else [0]
    fts = np.array([filt[r % len(filt)] for r in range(h)], np.uint8)
    if fts.size and int(fts.max()) > 4:
        raise ValueError(
            f"filter type {int(fts.max())} (PNG defines 0-4)"
        )
    # encode predictors depend only on RAW neighbor values, so every
    # filter type — Paeth included — vectorizes across the whole image:
    # one shifted view per neighbor, one masked select per row type
    left = np.zeros_like(rows)
    left[:, bpp:] = rows[:, :-bpp]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    upleft = np.zeros_like(rows)
    upleft[1:, bpp:] = rows[:-1, :-bpp]
    pred = np.zeros_like(rows)
    for ft in np.unique(fts):
        m = fts == ft
        if ft == 1:
            pred[m] = left[m]
        elif ft == 2:
            pred[m] = up[m]
        elif ft == 3:
            pred[m] = (left[m] + up[m]) // 2
        elif ft == 4:
            pred[m] = _paeth_predict(left[m], up[m], upleft[m])
    raw = np.empty((h, stride + 1), np.uint8)
    raw[:, 0] = fts
    raw[:, 1:] = (rows - pred) & 255
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse the per-row filters of one (sub)image. ``raw`` is
    (h, stride+1) uint8 — filter byte + filtered scanline per row.

    Uniform None/Sub/Up images unfilter as ONE whole-image numpy op
    (identity / per-row lane prefix sum / per-column prefix sum — the
    mod-256 cumsum trick). Average and Paeth carry the spec's sequential
    left-dependency, so those rows run a Python loop — over plain lists
    with local bindings, which beats per-element numpy scalar indexing
    ~5x on the thumbnail-sized payloads the multimodal operators decode."""
    h, stride1 = raw.shape
    stride = stride1 - 1
    w = stride // bpp
    fts = raw[:, 0]
    ft0 = int(fts[0]) if h else 0
    if h and (fts == ft0).all() and ft0 in (0, 1, 2):
        body = raw[:, 1:]
        if ft0 == 0:
            return body.copy()
        if ft0 == 1:
            # Sub: per-lane mod-256 prefix sum along each row
            return (
                body.reshape(h, w, bpp)
                .cumsum(axis=1, dtype=np.int64)
                .reshape(h, stride)
                & 255
            ).astype(np.uint8)
        # Up: mod-256 prefix sum down each column
        return (body.cumsum(axis=0, dtype=np.int64) & 255).astype(np.uint8)
    recon = np.empty((h, stride), np.uint8)
    prev: List[int] = [0] * stride
    rng_sub = range(bpp, stride)
    for r in range(h):
        ft = fts[r]
        lp = raw[r, 1:].tolist()
        if ft == 0:
            cur = lp
        elif ft == 1:
            cur = lp
            for i in rng_sub:
                cur[i] = (cur[i] + cur[i - bpp]) & 255
        elif ft == 2:
            cur = [(x + p) & 255 for x, p in zip(lp, prev)]
        elif ft == 3:
            cur = lp
            for i in range(bpp):
                cur[i] = (cur[i] + prev[i] // 2) & 255
            for i in rng_sub:
                cur[i] = (cur[i] + (cur[i - bpp] + prev[i]) // 2) & 255
        elif ft == 4:
            cur = lp
            for i in range(bpp):
                b = prev[i]
                # a = c = 0 -> predictor is b
                cur[i] = (cur[i] + b) & 255
            for i in rng_sub:
                a = cur[i - bpp]
                b = prev[i]
                c = prev[i - bpp]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 255
        else:
            raise ValueError(f"PNG filter type {ft}")
        recon[r] = cur
        prev = cur
    return recon


def _unfilter_batch(raw: np.ndarray, bpp: int) -> np.ndarray:
    """Unfilter N same-shape images at once: ``raw`` is (N, h, stride+1)
    uint8. The spec's sequential dependencies (rows top-down; Average /
    Paeth left-to-right) stay as short Python loops, but EVERY step is a
    vectorized op across the whole batch — per-image cost drops from
    ~stride·h Python operations to ~(stride·h)/N. Bit-identical to
    :func:`_unfilter` per image (the batch tests pin this)."""
    n, h, s1 = raw.shape
    stride = s1 - 1
    w = stride // bpp
    fts = raw[:, :, 0]
    if fts.size and int(fts.max()) > 4:
        raise ValueError(f"PNG filter type {int(fts.max())}")
    out = np.empty((n, h, stride), np.uint8)
    prev = np.zeros((n, stride), np.int32)
    for r in range(h):
        f = fts[:, r]
        cur = raw[:, r, 1:].astype(np.int32)  # ft 0 rows stay as-is
        m = f == 1
        if m.any():
            cur[m] = (
                cur[m]
                .reshape(-1, w, bpp)
                .cumsum(axis=1, dtype=np.int64)
                .reshape(-1, stride)
                & 255
            )
        m = f == 2
        if m.any():
            cur[m] = (cur[m] + prev[m]) & 255
        m = f == 3
        if m.any():
            sub, pv = cur[m], prev[m]
            sub[:, :bpp] = (sub[:, :bpp] + pv[:, :bpp] // 2) & 255
            for i in range(bpp, stride):
                sub[:, i] = (sub[:, i] + (sub[:, i - bpp] + pv[:, i]) // 2) & 255
            cur[m] = sub
        m = f == 4
        if m.any():
            sub, pv = cur[m], prev[m]
            sub[:, :bpp] = (sub[:, :bpp] + pv[:, :bpp]) & 255
            for i in range(bpp, stride):
                a, b, c = sub[:, i - bpp], pv[:, i], pv[:, i - bpp]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                sub[:, i] = (sub[:, i] + pred) & 255
            cur[m] = sub
        prev = cur
        out[:, r, :] = cur
    return out


def encode_png_batch(
    arrs: np.ndarray, filters: Optional[np.ndarray] = None
) -> List[bytes]:
    """Encode N same-shape uint8 images — (n, h, w) gray, (n, h, w, 3)
    RGB or (n, h, w, 4) RGBA — as individual PNGs in one vectorized
    pass: every filter predictor (Paeth included) depends only on RAW
    neighbor values, so prediction runs as a handful of whole-batch
    numpy ops; per image only the zlib deflate + chunk assembly remain.
    ``filters`` is (n, h) uint8 per-row filter types (default all 0).
    Bit-identical to per-image :func:`encode_png`."""
    arrs = np.asarray(arrs)
    if arrs.dtype != np.uint8:
        raise ValueError(f"encode_png_batch needs uint8 input, got {arrs.dtype}")
    if arrs.ndim == 3:
        color_type, channels = 0, 1
        arrs = arrs[..., None]
    elif arrs.ndim == 4 and arrs.shape[3] == 3:
        color_type, channels = 2, 3
    elif arrs.ndim == 4 and arrs.shape[3] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported batch shape {arrs.shape}")
    n, h, w = arrs.shape[:3]
    bpp = channels
    stride = w * channels
    rows = arrs.reshape(n, h, stride).astype(np.int32)
    if filters is None:
        fts = np.zeros((n, h), np.uint8)
    else:
        fts = np.asarray(filters, np.uint8)
        if fts.shape != (n, h):
            raise ValueError(f"filters shape {fts.shape} != {(n, h)}")
    if fts.size and int(fts.max()) > 4:
        raise ValueError(f"filter type {int(fts.max())} (PNG defines 0-4)")
    left = np.zeros_like(rows)
    left[:, :, bpp:] = rows[:, :, :-bpp]
    up = np.zeros_like(rows)
    up[:, 1:] = rows[:, :-1]
    upleft = np.zeros_like(rows)
    upleft[:, 1:, bpp:] = rows[:, :-1, :-bpp]
    avg = (left + up) // 2
    paeth = _paeth_predict(left, up, upleft)
    pred = np.choose(
        fts[:, :, None].astype(np.intp), (0, left, up, avg, paeth)
    )
    raw = np.empty((n, h, stride + 1), np.uint8)
    raw[:, :, 0] = fts
    raw[:, :, 1:] = (rows - pred) & 255
    ihdr_chunk = _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    )
    iend = _chunk(b"IEND", b"")
    return [
        PNG_SIGNATURE
        + ihdr_chunk
        + _chunk(b"IDAT", zlib.compress(raw[i].tobytes(), 6))
        + iend
        for i in range(n)
    ]


def decode_png_batch(blobs: Sequence[bytes]) -> Optional[np.ndarray]:
    """Decode N PNGs that share one plain-8-bit shape — (w, h, depth 8,
    gray/RGB/gray+alpha/RGBA, no interlace) — in one batched unfilter
    pass, returning (n, h, w) or (n, h, w, channels) uint8. Returns
    ``None`` when the blobs are not batchable (mixed shapes, palette,
    sub-byte or 16-bit depth, Adam7): callers fall back to per-image
    :func:`decode_png`. CRCs are verified exactly as in the scalar path."""
    headers = []
    streams = []
    for data in blobs:
        data = bytes(data)
        if data[:8] != PNG_SIGNATURE:
            return None
        pos = 8
        ihdr = None
        idat: List[bytes] = []
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack(
                ">I", data[pos + 8 + length : pos + 12 + length]
            )
            if binascii.crc32(tag + payload) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
            if tag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", payload)
            elif tag == b"IDAT":
                idat.append(payload)
            elif tag == b"PLTE":
                return None  # palette path stays scalar
            elif tag == b"IEND":
                break
            pos += 12 + length
        if ihdr is None:
            raise ValueError("PNG missing IHDR")
        headers.append(ihdr)
        streams.append(b"".join(idat))
    if not headers or any(hd != headers[0] for hd in headers[1:]):
        return None
    w, h, depth, color_type, compression, filter_method, interlace = headers[0]
    if (
        depth != 8
        or interlace != 0
        or compression != 0
        or filter_method != 0
        or color_type not in (0, 2, 4, 6)
    ):
        return None
    channels = _CHANNELS[color_type]
    stride = w * channels
    raw = np.empty((len(streams), h, stride + 1), np.uint8)
    expect = h * (stride + 1)
    for i, s in enumerate(streams):
        d = zlib.decompress(s)
        if len(d) != expect:
            raise ValueError(f"PNG data size {len(d)} != expected {expect}")
        raw[i] = np.frombuffer(d, np.uint8).reshape(h, stride + 1)
    recon = _unfilter_batch(raw, channels)
    if channels == 1:
        return recon.reshape(len(streams), h, w)
    return recon.reshape(len(streams), h, w, channels)


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
