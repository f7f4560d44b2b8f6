"""Pure-python PNG codec (pngio.py): spec-subset encode/decode with all
five filter types, verified against an independent scalar unfilter
reference and hand-built fixture bytes (no PIL in this container)."""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pytest

from pangeo_forge_recipes_spark.pngio import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)


def _scalar_unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Independent spec-literal unfilter: straight from the PNG RFC
    pseudocode, one byte at a time (no numpy tricks shared with the
    implementation under test)."""
    stride = w * bpp
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int32)
    for r in range(h):
        ft = rows[r, 0]
        for i in range(stride):
            x = int(rows[r, 1 + i])
            a = int(out[r, i - bpp]) if i >= bpp else 0
            b = int(out[r - 1, i]) if r > 0 else 0
            c = int(out[r - 1, i - bpp]) if (r > 0 and i >= bpp) else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x + a
            elif ft == 2:
                v = x + b
            elif ft == 3:
                v = x + (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = x + pred
            out[r, i] = v % 256
    return out.astype(np.uint8)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", binascii.crc32(tag + payload) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_roundtrip_all_filters(channels, filters):
    rng = np.random.default_rng(7)
    shape = (11, 13) if channels == 1 else (11, 13, channels)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    blob = encode_png(arr, filters=filters)
    assert blob[:8] == PNG_SIGNATURE
    out = decode_png(blob)
    np.testing.assert_array_equal(out, arr)


def test_decode_matches_scalar_reference():
    """Cross-check the vectorized unfilter against the spec-literal
    scalar implementation on every filter type."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    blob = encode_png(arr, filters=[4, 3, 1, 2, 0])
    # pull the raw filtered stream back out of the IDAT chunk
    pos = 8
    idat = b""
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    ref = _scalar_unfilter(zlib.decompress(idat), 9, 10, 3)
    np.testing.assert_array_equal(
        decode_png(blob).reshape(10, 27), ref
    )


def test_decode_16bit_and_palette_fixtures():
    # hand-built 16-bit grayscale 2x3, filter 0
    vals = np.array([[1000, 2000, 3000], [40000, 50000, 65535]], dtype=np.uint16)
    scan = b"".join(b"\x00" + row.astype(">u2").tobytes() for row in vals)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0)
    blob = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(blob), vals)

    # hand-built palette 2x2: indices into a 3-entry palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = b"\x00\x00\x01" + b"\x00\x02\x01"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    blob = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    np.testing.assert_array_equal(
        out,
        np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [0, 255, 0]]],
            dtype=np.uint8,
        ),
    )


def test_corrupt_crc_and_bad_signature_raise():
    arr = np.zeros((2, 2), dtype=np.uint8)
    blob = bytearray(encode_png(arr))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + bytes(blob[4:]))
    blob[20] ^= 0xFF  # flip a byte inside IHDR payload → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_illegal_depth_color_combo_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)  # 4-bit RGB: illegal
    blob = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="depth"):
        decode_png(blob)


def _pack_rows(px: np.ndarray, depth: int) -> bytes:
    """Hand-pack sub-byte samples row by row, MSB-first (spec order)."""
    out = b""
    for row in px:
        bits = np.unpackbits(row[:, None].astype(np.uint8), axis=1)[:, 8 - depth :]
        out += np.packbits(bits.ravel()).tobytes()
    return out


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_decode(depth):
    rng = np.random.default_rng(depth)
    h, w = 6, 11  # width not a byte multiple at any sub-byte depth
    px = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
    stride = (w * depth + 7) // 8
    packed = _pack_rows(px, depth)
    # filter 0 rows, then the same image with Up (filter 2) rows after
    # the first — byte-level filtering per spec
    rows = [packed[i * stride : (i + 1) * stride] for i in range(h)]
    scan0 = b"".join(b"\x00" + r for r in rows)
    up_rows = [b"\x00" + rows[0]]
    for i in range(1, h):
        cur = np.frombuffer(rows[i], np.uint8).astype(int)
        prev = np.frombuffer(rows[i - 1], np.uint8).astype(int)
        up_rows.append(b"\x02" + ((cur - prev) & 255).astype(np.uint8).tobytes())
    scan2 = b"".join(up_rows)
    for scan in (scan0, scan2):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
        blob = (
            PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(scan)))
            + _chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(decode_png(blob), px)


def test_subbyte_palette_and_interlaced_1bit():
    # 4-bit palette 2x3
    plte = bytes(range(48))  # 16 RGB entries
    px = np.array([[0, 5, 15], [7, 1, 2]], dtype=np.uint8)
    scan = b"".join(b"\x00" + _pack_rows(px[i : i + 1], 4) for i in range(2))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 4, 3, 0, 0, 0)
    blob = (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    expect = np.frombuffer(plte, np.uint8).reshape(16, 3)[px]
    np.testing.assert_array_equal(out, expect)

    # 1-bit interlaced checkerboard
    h, w = 9, 13
    px = ((np.arange(h)[:, None] + np.arange(w)[None, :]) % 2).astype(np.uint8)
    scan = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            scan += b"\x00" + _pack_rows(row[None, :], 1)
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 1)
    blob = (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(blob), px)


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _interlaced_png(arr: np.ndarray) -> bytes:
    """Independent Adam7 encoder for fixtures: slice the passes straight
    from the spec's pass table, filter type 0 rows."""
    if arr.ndim == 2:
        arr3, color = arr[:, :, None], 0
    else:
        arr3, color = arr, {3: 2, 4: 6}[arr.shape[2]]
    h, w, ch = arr3.shape
    scan = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = arr3[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            scan += b"\x00" + row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )


def test_adam7_pass_table_partitions_grid():
    """The seven passes must tile every pixel exactly once (catches a
    wrong starting-row/col table that a self-consistent encoder/decoder
    pair would otherwise hide)."""
    for h, w in ((16, 16), (13, 11), (9, 3), (1, 1)):
        cover = np.zeros((h, w), dtype=int)
        for x0, y0, dx, dy in _ADAM7:
            cover[y0::dy, x0::dx] += 1
        assert (cover == 1).all(), (h, w)


@pytest.mark.parametrize("shape", [(16, 16), (13, 11), (7, 5, 3), (3, 2)])
def test_adam7_interlace_decode(shape):
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(_interlaced_png(arr)), arr)


def test_encode_png_batch_bit_identical_to_scalar():
    import numpy as np

    from pangeo_forge_recipes_spark.pngio import encode_png, encode_png_batch

    rng = np.random.RandomState(3)
    for shape, _ct in (((6, 8), 0), ((6, 8, 3), 2), ((6, 8, 4), 6)):
        arrs = rng.randint(0, 256, (7,) + shape).astype(np.uint8)
        filters = rng.randint(0, 5, (7, shape[0])).astype(np.uint8)
        batch = encode_png_batch(arrs, filters)
        for i in range(7):
            single = encode_png(arrs[i], list(filters[i]))
            assert batch[i] == single, (shape, i)


def test_decode_png_batch_bit_identical_and_fallback():
    import numpy as np

    from pangeo_forge_recipes_spark.pngio import (
        decode_png,
        decode_png_batch,
        encode_png,
        encode_png_batch,
    )

    rng = np.random.RandomState(4)
    arrs = rng.randint(0, 256, (9, 5, 11, 3)).astype(np.uint8)
    filters = rng.randint(0, 5, (9, 5)).astype(np.uint8)
    blobs = encode_png_batch(arrs, filters)
    out = decode_png_batch(blobs)
    assert out is not None and out.shape == (9, 5, 11, 3)
    for i in range(9):
        np.testing.assert_array_equal(out[i], decode_png(blobs[i]))
        np.testing.assert_array_equal(out[i], arrs[i])
    # mixed shapes are not batchable -> None (caller falls back)
    other = encode_png(rng.randint(0, 256, (4, 4)).astype(np.uint8))
    assert decode_png_batch([blobs[0], other]) is None


def test_unfilter_batch_matches_scalar_per_image():
    import numpy as np

    from pangeo_forge_recipes_spark.pngio import _unfilter, _unfilter_batch

    rng = np.random.RandomState(5)
    for bpp in (1, 3):
        stride = 8 * bpp
        raw = rng.randint(0, 256, (6, 4, stride + 1)).astype(np.uint8)
        raw[:, :, 0] = rng.randint(0, 5, (6, 4))
        batch = _unfilter_batch(raw, bpp)
        for i in range(6):
            np.testing.assert_array_equal(batch[i], _unfilter(raw[i], bpp))
