"""Codec layer: Blosc1 container, LZ4 block (pure-Python decoder
cross-checked against pyarrow's independent lz4_raw implementation),
numcodecs LZ4/Zstd frames, byte-shuffle — and zarr v2 stores compressed
with each of them opening end-to-end."""

from __future__ import annotations

import itertools
import json
import os
import struct
import zlib

import numpy as np
import pytest

from pangeo_forge_recipes_spark import codecs as C
from pangeo_forge_recipes_spark.dsio import open_zarr_group
from pangeo_forge_recipes_spark.zarrio import open_group


def _patterned(n: int, seed: int = 0) -> bytes:
    """Compressible-but-not-trivial payload."""
    rng = np.random.RandomState(seed)
    base = np.arange(n, dtype=np.int64) // 7
    noise = rng.randint(0, 3, size=n)
    return (base + noise).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# LZ4 block: two independent implementations must agree
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [0, 1, 13, 300, 5000])
def test_lz4_pure_python_matches_pyarrow(n):
    data = _patterned(n, seed=n)
    comp = C.lz4_block_compress(data)  # pyarrow encoder
    assert C._lz4_block_decompress_py(comp, n) == data  # own decoder
    assert C.lz4_block_decompress(comp, n) == data  # pyarrow decoder


def test_lz4_pure_python_incompressible():
    rng = np.random.RandomState(3)
    data = rng.bytes(1024)
    comp = C.lz4_block_compress(data)
    assert C._lz4_block_decompress_py(comp, len(data)) == data


def test_lz4_overlapping_match():
    # RLE-ish: long run forces offset-1 overlapping copies
    data = b"a" * 1000 + b"b" * 7
    comp = C.lz4_block_compress(data)
    assert C._lz4_block_decompress_py(comp, len(data)) == data


def test_numcodecs_lz4_frame_roundtrip():
    data = _patterned(777)
    assert C.numcodecs_lz4_decompress(C.numcodecs_lz4_compress(data)) == data


def test_zstd_roundtrip():
    data = _patterned(4096, seed=9)
    assert C.zstd_decompress(C.zstd_compress(data, 3), len(data)) == data


# ---------------------------------------------------------------------------
# byte-shuffle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
def test_shuffle_inverse(typesize):
    data = _patterned(typesize * 50, seed=typesize)
    assert C.unshuffle_bytes(C.shuffle_bytes(data, typesize), typesize) == data


def test_shuffle_remainder_tail_verbatim():
    # c-blosc generic shuffle: len % typesize tail is copied unshuffled
    data = bytes(range(10))
    out = C.shuffle_bytes(data, 4)
    assert out[-2:] == data[-2:]
    assert C.unshuffle_bytes(out, 4) == data


def test_shuffle_matches_hdf5io():
    """Same byte-transpose the HDF5 shuffle filter uses (independent impl)."""
    data = np.arange(64, dtype="<i4").tobytes()
    lanes = np.frombuffer(data, dtype=np.uint8).reshape(-1, 4).T.tobytes()
    assert C.shuffle_bytes(data, 4) == lanes


# ---------------------------------------------------------------------------
# Blosc1 container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cname,typesize,shuffle",
    list(itertools.product(["lz4", "zlib", "zstd"], [1, 4, 8], [True, False])),
)
def test_blosc_roundtrip(cname, typesize, shuffle):
    data = np.arange(1000, dtype=f"<i{max(typesize,1)}" if typesize in (1, 4, 8) else "<i4")
    raw = data.astype(f"<i{typesize}" if typesize != 1 else "<i1").tobytes()
    frame = C.blosc_compress(raw, typesize=typesize, cname=cname, shuffle=shuffle)
    assert C.blosc_decompress(frame) == raw
    # header sanity: nbytes field == payload size
    assert struct.unpack("<I", frame[4:8])[0] == len(raw)


def test_blosc_multi_block_with_partial_tail():
    # blocksize forces several blocks; last block is a partial (unsplit) one
    raw = _patterned(10_000, seed=1)
    frame = C.blosc_compress(raw, typesize=4, cname="lz4", shuffle=True, blocksize=4096)
    nblocks = (10_000 + 4095) // 4096
    assert nblocks == 3
    assert C.blosc_decompress(frame) == raw


def test_blosc_incompressible_stores_verbatim():
    rng = np.random.RandomState(11)
    raw = rng.bytes(2048)
    frame = C.blosc_compress(raw, typesize=8, cname="lz4", shuffle=True)
    assert C.blosc_decompress(frame) == raw


def test_blosc_memcpy_flag():
    raw = np.random.RandomState(2).bytes(100)
    # hand-build a memcpy frame
    header = struct.pack("<BBBB III", 2, 1, 0x2, 1, len(raw), len(raw), 16 + len(raw))
    assert C.blosc_decompress(header + raw) == raw


def test_blosc_empty():
    frame = C.blosc_compress(b"", typesize=4)
    assert C.blosc_decompress(frame) == b""


def test_blosc_gates():
    # truncation
    with pytest.raises(ValueError, match="truncated"):
        good = C.blosc_compress(b"z" * 500, typesize=1)
        C.blosc_decompress(good[: len(good) // 2])


# ---------------------------------------------------------------------------
# blosclz block codec
# ---------------------------------------------------------------------------


def test_blosclz_handbuilt_tokens_decode():
    """Decode hand-assembled token streams against the public format
    description (independent of our own encoder)."""
    # pure literal run: ctrl = len-1 (< 32), then bytes
    assert C.blosclz_decompress(bytes([4]) + b"hello", 5) == b"hello"
    # literal 'abc' then match len=3 dist=3 (copy 'abc' again):
    # match ctrl byte: ((3-2)<<5) | hi(dist-1=2 -> 0), code byte = 2
    stream = bytes([2]) + b"abc" + bytes([(1 << 5) | 0, 2])
    assert C.blosclz_decompress(stream, 6) == b"abcabc"
    # overlapping RLE-style match: literal 'a', match len=7 dist=1
    stream = bytes([0]) + b"a" + bytes([(5 << 5) | 0, 0])
    assert C.blosclz_decompress(stream, 8) == b"a" * 8
    # long match with 255-terminated length extension: len = 9+255+5 = 269
    lit = b"q"
    stream = bytes([0]) + lit + bytes([(7 << 5) | 0, 255, 5, 0])
    assert C.blosclz_decompress(stream, 270) == b"q" * 270


def test_blosclz_far_distance_roundtrip():
    # layout: 16 unique bytes, > 8191 bytes of filler, repeat of the 16 —
    # the repeat is beyond MAX_DISTANCE so the encoder must use far form
    rng = np.random.RandomState(7)
    uniq = rng.bytes(16)
    filler = rng.bytes(9000)
    raw = uniq + filler + uniq
    enc = C.blosclz_compress(raw)
    assert C.blosclz_decompress(enc, len(raw)) == raw


@pytest.mark.parametrize("n", [0, 1, 63, 1000, 5000])
def test_blosclz_roundtrip_patterned(n):
    raw = _patterned(n, seed=n or 1)
    enc = C.blosclz_compress(raw)
    assert C.blosclz_decompress(enc, n) == raw
    if n >= 1000:
        assert len(enc) < n  # patterned data must actually compress


def test_blosclz_roundtrip_incompressible():
    raw = np.random.RandomState(3).bytes(4096)
    enc = C.blosclz_compress(raw)
    assert C.blosclz_decompress(enc, len(raw)) == raw


def _blz_literals(payload: bytes) -> bytearray:
    """Hand-emit blosclz literal runs (token = run-1, then bytes)."""
    out = bytearray()
    pos = 0
    while pos < len(payload):
        run = min(32, len(payload) - pos)
        out.append(run - 1)
        out += payload[pos : pos + run]
        pos += run
    return out


def test_blosclz_far_form_hand_built_vectors():
    """Far-distance (>8191) tokens transcribed by hand from the public
    blosclz.c format description: the reserved pattern code==255 &&
    ofs==31<<8 escapes to a 16-bit offset, and the effective distance is
    ofs16 + MAX_DISTANCE + 1 (8192 + ofs16) — the historical divergence
    point between blosclz and FastLZ level 2.  These vectors are
    independent of the Python encoder."""
    # vector 1: distance 8200 (fofs = 8)
    head = b"XYZ" + bytes((7 + 13 * i) % 251 for i in range(8197))
    assert len(head) == 8200
    stream = _blz_literals(head)
    stream += bytes([((3 - 2) << 5) | 31, 255, 0x00, 0x08])  # far, fofs=8
    expect = head + head[:3]  # match copies output[-8200:][:3] == head[0:3]
    assert C.blosclz_decompress(bytes(stream), len(expect)) == expect

    # vector 2: distance exactly MAX_DISTANCE+1 = 8192 (fofs = 0) — the
    # smallest distance that MUST take the far form (near encoding would
    # collide with the escape pattern)
    head = b"PQR" + bytes((3 + 11 * i) % 249 for i in range(8189))
    assert len(head) == 8192
    stream = _blz_literals(head)
    stream += bytes([((3 - 2) << 5) | 31, 255, 0x00, 0x00])  # far, fofs=0
    expect = head + head[:3]
    assert C.blosclz_decompress(bytes(stream), len(expect)) == expect

    # vector 3: extended length (mlen=10) at far distance 8300 — length
    # extension and far escape compose: ctrl len bits = 7, one extension
    # byte mlen-9=1... wait: ext byte is mlen-9, then +3 applied after
    head = b"abcdefghij" + bytes((5 + 17 * i) % 250 for i in range(8290))
    assert len(head) == 8300
    stream = _blz_literals(head)
    # ctrl: (7<<5)|31; ext byte: mlen-9 = 1; code byte 255; fofs = 108
    stream += bytes([(7 << 5) | 31, 1, 255, 108 >> 8, 108 & 0xFF])
    expect = head + head[:10]
    assert C.blosclz_decompress(bytes(stream), len(expect)) == expect


def test_blosclz_encoder_emits_far_form_and_round_trips():
    """Data whose only match lies beyond 8191 bytes forces the encoder's
    far path; the stream must contain the reserved escape and round-trip."""
    data = b"MNO" + bytes((1 + 7 * i) % 253 for i in range(8500)) + b"MNO"
    enc = C.blosclz_compress(data)
    assert C.blosclz_decompress(enc, len(data)) == data


# ---------------------------------------------------------------------------
# bitshuffle
# ---------------------------------------------------------------------------


def _bitshuffle_oracle(buf: bytes, typesize: int) -> bytes:
    """Independent per-bit loop implementation of the bitshuffle
    transpose (kiyo-masui/bitshuffle TRANS_BIT_8X8 semantics):
    LSB-first on both axes — plane b*8+k holds bit k (from the LSB) of
    byte b of each element, and element 8*i+j lands in bit j (LSB) of
    plane byte i."""
    nelem = len(buf) // typesize
    nkeep = nelem - nelem % 8
    head = buf[: nkeep * typesize]
    out = bytearray()
    bits = []
    for b in range(typesize):
        for i in range(8):  # bit i counted from the LSB
            for e in range(nkeep):
                bits.append((head[e * typesize + b] >> i) & 1)
    for k in range(0, len(bits), 8):
        out.append(sum(bit << j for j, bit in enumerate(bits[k : k + 8])))
    return bytes(out) + buf[nkeep * typesize :]


@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
def test_bitshuffle_matches_independent_oracle(typesize):
    raw = _patterned(typesize * 24 + 3, seed=typesize)  # odd tail bytes
    assert C.bitshuffle_bytes(raw, typesize) == _bitshuffle_oracle(raw, typesize)


def test_bitshuffle_hand_built_vectors():
    # Hand-derived from the public TRANS_BIT_8X8 macro semantics
    # (kiyo-masui/bitshuffle src/bitshuffle_core.c), independent of any
    # Python implementation:
    #
    # 8 one-byte elements, element0 = 0x02 (bit 1 set), rest zero.
    # Bit 1 lives in plane index 1 (LSB-first plane order); element 0
    # contributes bit 0 (LSB) of that plane's byte.
    raw = bytes([0x02, 0, 0, 0, 0, 0, 0, 0])
    assert C.bitshuffle_bytes(raw, 1) == bytes([0x00, 0x01, 0, 0, 0, 0, 0, 0])
    # element3 = 0x80 (bit 7): plane 7, bit 3 of the plane byte -> 0x08.
    raw = bytes([0, 0, 0, 0x80, 0, 0, 0, 0])
    assert C.bitshuffle_bytes(raw, 1) == bytes([0, 0, 0, 0, 0, 0, 0, 0x08])
    # typesize=2, 8 elements: element0 = 0x0001 LE (byte0 bit0) and
    # element5 = 0x4000 LE (byte1 bit6).  Byte-plane 0's planes come
    # first (indices 0..7), then byte-plane 1's (8..15).
    raw = bytearray(16)
    raw[0] = 0x01  # element 0, byte 0, bit 0 -> plane 0, bit 0
    raw[11] = 0x40  # element 5, byte 1, bit 6 -> plane 8+6=14, bit 5
    exp = bytearray(16)
    exp[0] = 0x01
    exp[14] = 0x20
    assert C.bitshuffle_bytes(bytes(raw), 2) == bytes(exp)
    # all-ones stays all-ones under any transpose
    assert C.bitshuffle_bytes(b"\xff" * 32, 4) == b"\xff" * 32


@pytest.mark.parametrize("typesize,n", [(1, 100), (2, 130), (4, 1000), (8, 333)])
def test_bitshuffle_inverse(typesize, n):
    raw = _patterned(n, seed=n)
    assert C.bitunshuffle_bytes(C.bitshuffle_bytes(raw, typesize), typesize) == raw


def test_blosc_container_blosclz_and_bitshuffle():
    data = np.arange(3000, dtype="<i4").tobytes()
    for shuffle in (False, True, "bit"):
        frame = C.blosc_compress(data, typesize=4, cname="blosclz", shuffle=shuffle)
        assert C.blosc_decompress(frame) == data
    # bitshuffle with a non-blosclz codec too
    frame = C.blosc_compress(data, typesize=8, cname="zlib", shuffle="bit", blocksize=1024)
    assert C.blosc_decompress(frame) == data


# ---------------------------------------------------------------------------
# zarr v2 stores with real-world compressors open end-to-end
# ---------------------------------------------------------------------------


def _write_v2_array(
    root: str, name: str, arr: np.ndarray, chunks, compressor, filters=None, order="C"
):
    adir = os.path.join(root, name)
    os.makedirs(adir, exist_ok=True)
    zarray = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": compressor,
        "fill_value": None,
        "order": order,
        "filters": filters,
    }
    json.dump(zarray, open(os.path.join(adir, ".zarray"), "w"))
    json.dump(
        {"_ARRAY_DIMENSIONS": [f"d{i}" for i in range(arr.ndim)]},
        open(os.path.join(adir, ".zattrs"), "w"),
    )
    grid = [range(0, s, c) for s, c in zip(arr.shape, chunks)]
    for origin in itertools.product(*grid):
        idx = [o // c for o, c in zip(origin, chunks)]
        block = np.zeros(chunks, dtype=arr.dtype)
        sl = tuple(slice(o, min(o + c, s)) for o, c, s in zip(origin, chunks, arr.shape))
        block[tuple(slice(0, sp.stop - sp.start) for sp in sl)] = arr[sl]
        raw = block.tobytes(order="F" if order == "F" else "C")
        for filt in filters or []:
            if filt["id"] == "shuffle":
                raw = C.shuffle_bytes(raw, filt["elementsize"])
            else:
                flat = np.frombuffer(raw, dtype=np.dtype(filt.get("dtype", arr.dtype.str)))
                raw = C.encode_v2_filter(flat, filt)
        cid = (compressor or {}).get("id")
        if cid == "blosc":
            raw = C.blosc_compress(
                raw,
                typesize=arr.dtype.itemsize,
                cname=compressor.get("cname", "lz4"),
                shuffle={0: False, 1: True, 2: "bit"}.get(
                    int(compressor.get("shuffle", 1)), True
                ),
            )
        elif cid == "lz4":
            raw = C.numcodecs_lz4_compress(raw)
        elif cid == "zstd":
            raw = C.zstd_compress(raw)
        elif cid == "gzip":
            co = zlib.compressobj(5, zlib.DEFLATED, 31)
            raw = co.compress(raw) + co.flush()
        elif cid == "zlib":
            raw = zlib.compress(raw, 5)
        with open(os.path.join(adir, ".".join(str(i) for i in idx)), "wb") as f:
            f.write(raw)


@pytest.mark.parametrize(
    "compressor",
    [
        {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
        {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 0},
        {"id": "blosc", "cname": "blosclz", "clevel": 5, "shuffle": 1},
        {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 2},
        {"id": "lz4"},
        {"id": "zstd", "level": 3},
        {"id": "gzip", "level": 5},
    ],
)
def test_v2_store_with_real_world_compressor(tmp_path, compressor):
    root = str(tmp_path / "v2c.zarr")
    os.makedirs(root)
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    rng = np.random.RandomState(7)
    foo = (rng.standard_normal((5, 6)) * 10).round(2)
    _write_v2_array(root, "foo", foo, (2, 6), compressor)
    _write_v2_array(root, "d0", np.arange(5, dtype="<i8"), (5,), compressor)
    ds = open_zarr_group(root)
    np.testing.assert_array_equal(ds.data_vars["foo"].data, foo)
    np.testing.assert_array_equal(ds.coords["d0"].data, np.arange(5))


def test_v2_store_with_shuffle_filter(tmp_path):
    root = str(tmp_path / "v2s.zarr")
    os.makedirs(root)
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    arr = np.arange(40, dtype="<f8").reshape(8, 5) * 1.5
    _write_v2_array(
        root,
        "bar",
        arr,
        (4, 5),
        {"id": "zlib", "level": 4},
        filters=[{"id": "shuffle", "elementsize": 8}],
    )
    ds = open_zarr_group(root)
    np.testing.assert_array_equal(ds.data_vars["bar"].data, arr)


def test_v2_f_order_store(tmp_path):
    """Column-major v2 arrays read through the v3 transpose codec."""
    root = str(tmp_path / "v2f.zarr")
    os.makedirs(root)
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    arr = np.arange(24, dtype="<f8").reshape(4, 6) * 1.25
    _write_v2_array(root, "foo", arr, (2, 3), {"id": "zlib", "level": 4}, order="F")
    ds = open_zarr_group(root)
    np.testing.assert_array_equal(ds.data_vars["foo"].data, arr)


@pytest.mark.parametrize(
    "filt",
    [
        {"id": "delta", "dtype": "<i8"},
        {"id": "delta", "dtype": "<i8", "astype": "<i4"},
        {"id": "fixedscaleoffset", "offset": 100.0, "scale": 10.0, "dtype": "<f8", "astype": "<i2"},
    ],
)
def test_v2_array_filters(tmp_path, filt):
    """numcodecs delta / fixedscaleoffset filter chains decode exactly."""
    root = str(tmp_path / "v2filt.zarr")
    os.makedirs(root)
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    if filt["id"] == "delta":
        arr = (np.arange(30, dtype="<i8") * 3 + 7).reshape(5, 6)
    else:
        arr = (100.0 + np.arange(30).reshape(5, 6) / 10.0).astype("<f8")
    _write_v2_array(root, "v", arr, (5, 6), {"id": "zlib", "level": 4}, filters=[filt])
    ds = open_zarr_group(root)
    np.testing.assert_allclose(ds.data_vars["v"].data, arr, rtol=1e-12)


def test_v2_quantize_filter_passthrough(tmp_path):
    root = str(tmp_path / "v2q.zarr")
    os.makedirs(root)
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    arr = np.round(np.linspace(0, 1, 20), 3).reshape(4, 5)
    _write_v2_array(
        root, "v", arr, (4, 5), None,
        filters=[{"id": "quantize", "digits": 3, "dtype": "<f8"}],
    )
    ds = open_zarr_group(root)
    # quantize is lossy at write; read-back equals the quantized values
    np.testing.assert_allclose(ds.data_vars["v"].data, arr, atol=10**-3)


def test_v2_unknown_compressor_still_gates(tmp_path):
    root = str(tmp_path / "v2g.zarr")
    os.makedirs(root)
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    _write_v2_array(root, "a", np.zeros((2, 2)), (2, 2), None)
    za_path = os.path.join(root, "a", ".zarray")
    za = json.load(open(za_path))
    za["compressor"] = {"id": "bz2", "level": 9}
    json.dump(za, open(za_path, "w"))
    with pytest.raises(NotImplementedError, match="bz2"):
        open_group(root)["a"].read()


def test_v3_array_with_zstd_codec_roundtrip(tmp_path):
    """Our own v3 writer/reader with a zstd codec chain."""
    from pangeo_forge_recipes_spark.zarrio import create_group

    grp = create_group(str(tmp_path / "z3.zarr"))
    arr = grp.create_array(
        "v", shape=(6, 4), chunks=(3, 4), dtype="<f4", compressor="zstd"
    )
    data = np.arange(24, dtype="<f4").reshape(6, 4)
    arr[:, :] = data
    back = open_group(str(tmp_path / "z3.zarr"))["v"].read()
    np.testing.assert_array_equal(back, data)
