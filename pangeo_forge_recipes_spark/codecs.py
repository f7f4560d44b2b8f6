"""Compression codecs for Zarr chunk IO: the Blosc1 container format,
numcodecs-style LZ4/Zstd framing, and a pure-Python LZ4 block decoder.

Real-world zarr v2 archives overwhelmingly use the numcodecs ``Blosc``
compressor (default ``cname='lz4'``, byte-shuffle) — this module opens
them without the blosc C library. The Blosc1 *container* (16-byte
header, block starts, per-block split streams, byte-shuffle) is parsed
in pure Python from the public format description
(c-blosc ``README_HEADER.rst`` / ``blosc.c``); the *internal* codec of
each stream is delegated to :mod:`pyarrow`'s bundled compressors
(``lz4_raw``, ``zstd``, ``snappy``) or stdlib ``zlib``; ``blosclz``
(the FastLZ-derived default codec of early c-blosc) and the
``bitshuffle`` filter are decoded by pure-Python/numpy implementations
of their public formats below.

A pure-Python LZ4 *block* decoder is included and cross-checked against
pyarrow's ``lz4_raw`` in tests — two independent implementations — and
serves as the fallback when a pyarrow build lacks lz4.

Reference parity: the reference opens these stores through zarr-python
+ numcodecs (reference/pangeo_forge_recipes/writers.py uses zarr
stores); this engine reads the same bytes natively.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# pyarrow codec access (import-try per charter: gate, don't crash at import)
# ---------------------------------------------------------------------------


def _arrow_codec(name: str):
    try:
        import pyarrow as pa

        return pa.Codec(name)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------


def lz4_block_decompress(buf: bytes, dst_size: int) -> bytes:
    """Decompress an LZ4 *block* (not frame) of known output size.

    Uses pyarrow's ``lz4_raw`` when available; otherwise a pure-Python
    decoder of the public block format (token byte: high nibble literal
    length, low nibble match length - 4, 0xF extension bytes, 2-byte LE
    match offset)."""
    codec = _arrow_codec("lz4_raw")
    if codec is not None:
        out = codec.decompress(buf, dst_size)
        return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)
    return _lz4_block_decompress_py(buf, dst_size)


def _lz4_block_decompress_py(buf: bytes, dst_size: int) -> bytes:
    src = memoryview(buf)
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        # literals
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if lit:
            dst += src[i : i + lit]
            i += lit
        if i >= n:
            break  # last sequence is literals-only
        # match
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(dst) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset before start")
        # overlapping copy must proceed front-to-back
        for j in range(mlen):
            dst.append(dst[start + j])
    if len(dst) != dst_size:
        raise ValueError(
            f"LZ4 block decoded to {len(dst)} bytes, expected {dst_size}"
        )
    return bytes(dst)


def lz4_block_compress(buf: bytes) -> bytes:
    codec = _arrow_codec("lz4_raw")
    if codec is None:
        raise NotImplementedError(
            "LZ4 block compression needs pyarrow's lz4_raw codec"
        )
    out = codec.compress(buf)
    return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)


# ---------------------------------------------------------------------------
# BloscLZ block format (FastLZ level-1/2 derivative; public format per
# c-blosc blosclz.c). Tokens: ctrl < 32 -> literal run of ctrl+1 bytes;
# else a match of length ((ctrl>>5)-1 [+255-terminated extension] +3)
# at distance ((ctrl&31)<<8) + code + 1, with the reserved pattern
# code==255 && ofs==31<<8 escaping to a 16-bit far distance offset by
# MAX_DISTANCE+1.
# ---------------------------------------------------------------------------

_BLZ_MAX_DISTANCE = 8191
_BLZ_MAX_FARDISTANCE = 65535 + _BLZ_MAX_DISTANCE - 32


def blosclz_decompress(buf: bytes, dst_size: int) -> bytes:
    """Decode a BloscLZ stream of known output size (pure Python)."""
    src = memoryview(buf)
    n = len(src)
    if n == 0:
        if dst_size:
            raise ValueError("empty blosclz stream with nonzero dst_size")
        return b""
    dst = bytearray()
    i = 0
    ctrl = src[i] & 31
    i += 1
    while True:
        if ctrl >= 32:
            mlen = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if mlen == 6:  # 7 - 1: 255-terminated length extension
                while True:
                    code = src[i]
                    i += 1
                    mlen += code
                    if code != 255:
                        break
            code = src[i]
            i += 1
            mlen += 3
            ref = len(dst) - ofs - 1 - code
            if code == 255 and ofs == (31 << 8):
                ofs = (src[i] << 8) | src[i + 1]
                i += 2
                ref = len(dst) - ofs - _BLZ_MAX_DISTANCE - 1
            if ref < 0:
                raise ValueError("corrupt blosclz stream: match before start")
            for j in range(mlen):  # overlapping copy front-to-back
                dst.append(dst[ref + j])
        else:
            lit = ctrl + 1
            dst += src[i : i + lit]
            i += lit
        if i < n:
            ctrl = src[i]
            i += 1
        else:
            break
    if len(dst) != dst_size:
        raise ValueError(
            f"blosclz decoded to {len(dst)} bytes, expected {dst_size}"
        )
    return bytes(dst)


def _blz_emit_match(out: bytearray, mlen: int, dist: int) -> None:
    """Append one match token: ``mlen`` copied bytes (>=3) at 1-based
    back-distance ``dist``."""
    if dist <= _BLZ_MAX_DISTANCE:
        store = dist - 1
        hi, lo = store >> 8, store & 0xFF
        far = False
    else:
        hi, lo = 31, 255
        far = True
    if mlen <= 8:
        out.append(((mlen - 2) << 5) | hi)
    else:
        out.append((7 << 5) | hi)
        ext = mlen - 9
        while ext >= 255:
            out.append(255)
            ext -= 255
        out.append(ext)
    out.append(lo)
    if far:
        fofs = dist - _BLZ_MAX_DISTANCE - 1
        out.append(fofs >> 8)
        out.append(fofs & 0xFF)


def blosclz_compress(data: bytes) -> bytes:
    """Greedy hash-table BloscLZ encoder producing streams readable by
    :func:`blosclz_decompress` (and by c-blosc's decoder — same public
    token format). Used for the write path and round-trip tests."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    table: dict = {}
    lit_start = 0
    i = 0

    def flush_literals(upto: int) -> None:
        nonlocal lit_start
        pos = lit_start
        while pos < upto:
            run = min(32, upto - pos)
            out.append(run - 1)
            out.extend(data[pos : pos + run])
            pos += run
        lit_start = upto

    while i + 3 <= n:
        key = data[i : i + 3]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _BLZ_MAX_FARDISTANCE:
            dist = i - cand
            # reserved short pattern dist==MAX_DISTANCE+1 must take the
            # far form; _blz_emit_match handles it via the dist threshold
            if dist == _BLZ_MAX_DISTANCE + 1:
                pass  # far form encodes fofs == 0 correctly
            mlen = 3
            while i + mlen < n and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            flush_literals(i)
            _blz_emit_match(out, mlen, dist)
            i += mlen
            lit_start = i
        else:
            i += 1
    flush_literals(n)
    return bytes(out)


# ---------------------------------------------------------------------------
# bitshuffle (public format per kiyo-masui/bitshuffle + c-blosc's
# bitshuffle-generic.c): transpose the (nelem, typesize*8) bit matrix so
# each bit plane is contiguous; elements beyond the largest multiple of
# 8 are copied verbatim at the tail, as are bytes beyond whole elements.
#
# Bit ordering is LSB-first on BOTH axes (TRANS_BIT_8X8 semantics): for
# byte-plane b, plane index b*8+k holds bit k counting from the LSB of
# each element's byte b, and within a plane byte, element 8*i+j lands in
# bit j (LSB) of plane byte i.  numpy's default bitorder is "big", so
# both unpackbits and packbits must be called with bitorder="little".
# ---------------------------------------------------------------------------


def bitshuffle_bytes(buf: bytes, typesize: int) -> bytes:
    buf = bytes(buf)
    if typesize <= 0:
        typesize = 1
    nelem = len(buf) // typesize
    nkeep = nelem - nelem % 8
    head = nkeep * typesize
    if nkeep == 0:
        return buf
    arr = np.frombuffer(buf, np.uint8, count=head).reshape(nkeep, typesize)
    # (nkeep, typesize*8): column b*8+k = bit k (LSB-first) of byte b
    bits = np.unpackbits(arr, axis=1, bitorder="little")
    out = np.packbits(np.ascontiguousarray(bits.T), bitorder="little")
    return out.tobytes() + buf[head:]


def bitunshuffle_bytes(buf: bytes, typesize: int) -> bytes:
    buf = bytes(buf)
    if typesize <= 0:
        typesize = 1
    nelem = len(buf) // typesize
    nkeep = nelem - nelem % 8
    head = nkeep * typesize
    if nkeep == 0:
        return buf
    arr = np.frombuffer(buf, np.uint8, count=head)
    bits = np.unpackbits(arr, bitorder="little").reshape(typesize * 8, nkeep)
    out = np.packbits(np.ascontiguousarray(bits.T), bitorder="little")
    return out.tobytes() + buf[head:]


# ---------------------------------------------------------------------------
# numcodecs-style frames (zarr v2 "lz4" / "zstd" compressor ids)
# ---------------------------------------------------------------------------


def numcodecs_lz4_decompress(buf: bytes) -> bytes:
    """numcodecs.LZ4 frame: 4-byte LE uint32 original size + LZ4 block."""
    (size,) = struct.unpack("<I", bytes(buf[:4]))
    return lz4_block_decompress(bytes(buf[4:]), size)


def numcodecs_lz4_compress(buf: bytes) -> bytes:
    return struct.pack("<I", len(buf)) + lz4_block_compress(buf)


def zstd_decompress(buf: bytes, dst_size: Optional[int] = None) -> bytes:
    codec = _arrow_codec("zstd")
    if codec is None:
        raise NotImplementedError("zstd decompression needs pyarrow's zstd codec")
    out = codec.decompress(buf, dst_size)
    return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)


def zstd_compress(buf: bytes, level: int = 1) -> bytes:
    try:
        import pyarrow as pa

        codec = pa.Codec("zstd", compression_level=level)
    except Exception:
        raise NotImplementedError("zstd compression needs pyarrow's zstd codec")
    out = codec.compress(buf)
    return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)


def snappy_decompress(buf: bytes, dst_size: Optional[int] = None) -> bytes:
    codec = _arrow_codec("snappy")
    if codec is None:
        raise NotImplementedError("snappy decompression needs pyarrow's snappy codec")
    out = codec.decompress(buf, dst_size)
    return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)


# ---------------------------------------------------------------------------
# byte-shuffle (c-blosc generic shuffle: trailing remainder copied verbatim)
# ---------------------------------------------------------------------------


def shuffle_bytes(buf: bytes, typesize: int) -> bytes:
    """Byte-transpose ``buf`` so byte-lane j of every element is
    contiguous; the ``len(buf) % typesize`` tail is copied verbatim
    (c-blosc generic-shuffle semantics)."""
    if typesize <= 1:
        return bytes(buf)
    n = len(buf)
    quot = n // typesize
    head = np.frombuffer(buf, dtype=np.uint8, count=quot * typesize)
    out = head.reshape(quot, typesize).T.tobytes()
    return out + bytes(buf[quot * typesize :])


def unshuffle_bytes(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return bytes(buf)
    n = len(buf)
    quot = n // typesize
    head = np.frombuffer(buf, dtype=np.uint8, count=quot * typesize)
    out = head.reshape(typesize, quot).T.tobytes()
    return out + bytes(buf[quot * typesize :])


# ---------------------------------------------------------------------------
# numcodecs array filters (zarr v2 ``filters`` list)
# ---------------------------------------------------------------------------


def decode_v2_filter(buf: bytes, conf: dict, out_dtype: np.dtype) -> np.ndarray:
    """Invert one numcodecs array filter. ``buf`` holds the filter's
    encoded form; returns the decoded array in ``out_dtype`` (the
    filter's declared ``dtype``, i.e. its input side)."""
    fid = conf.get("id")
    if fid == "delta":
        astype = np.dtype(conf.get("astype") or conf.get("dtype") or out_dtype)
        enc = np.frombuffer(buf, dtype=astype)
        return np.cumsum(enc.astype(np.dtype(conf.get("dtype", out_dtype)), copy=False)).astype(
            np.dtype(conf.get("dtype", out_dtype)), copy=False
        )
    if fid == "fixedscaleoffset":
        astype = np.dtype(conf.get("astype") or conf.get("dtype") or out_dtype)
        dtype = np.dtype(conf.get("dtype", out_dtype))
        enc = np.frombuffer(buf, dtype=astype).astype("float64")
        return (enc / conf["scale"] + conf["offset"]).astype(dtype, copy=False)
    if fid == "quantize":
        # lossy rounding applied at encode; decode is a pass-through
        return np.frombuffer(buf, dtype=np.dtype(conf.get("dtype", out_dtype)))
    raise NotImplementedError(
        f"numcodecs filter {fid!r} unsupported (delta / fixedscaleoffset / "
        "quantize / shuffle are)"
    )


def encode_v2_filter(arr: np.ndarray, conf: dict) -> bytes:
    fid = conf.get("id")
    if fid == "delta":
        astype = np.dtype(conf.get("astype") or conf.get("dtype") or arr.dtype)
        enc = np.empty(arr.shape, dtype=astype)
        flat = arr.ravel()
        enc = np.concatenate([flat[:1], np.diff(flat)]).astype(astype)
        return enc.tobytes()
    if fid == "fixedscaleoffset":
        astype = np.dtype(conf.get("astype") or conf.get("dtype") or arr.dtype)
        enc = np.round((arr.ravel().astype("float64") - conf["offset"]) * conf["scale"])
        return enc.astype(astype).tobytes()
    if fid == "quantize":
        digits = conf["digits"]
        dtype = np.dtype(conf.get("dtype", arr.dtype))
        precision = 10.0 ** -digits
        exp = np.log10(precision)
        bits = np.ceil(np.log2(10.0 ** -np.floor(exp)))
        scale = 2.0 ** bits
        return (np.around(scale * arr.ravel()) / scale).astype(dtype).tobytes()
    raise NotImplementedError(f"numcodecs filter {fid!r} unsupported")


# ---------------------------------------------------------------------------
# Blosc1 container
# ---------------------------------------------------------------------------

_BLOSC_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_BLOSC_CODES = {v: k for k, v in _BLOSC_CODECS.items()}
# flags
_DOSHUFFLE = 0x1
_MEMCPYED = 0x2
_DOBITSHUFFLE = 0x4
_DONT_SPLIT = 0x10


def _stream_decompress(cname: str, buf: bytes, dst_size: int) -> bytes:
    if cname == "lz4":
        return lz4_block_decompress(buf, dst_size)
    if cname == "zlib":
        return zlib.decompress(bytes(buf))
    if cname == "zstd":
        return zstd_decompress(bytes(buf), dst_size)
    if cname == "snappy":
        return snappy_decompress(bytes(buf), dst_size)
    if cname == "blosclz":
        return blosclz_decompress(bytes(buf), dst_size)
    raise NotImplementedError(
        f"blosc internal codec {cname!r} unsupported "
        "(blosclz/lz4/zlib/zstd/snappy are)"
    )


def _stream_compress(cname: str, buf: bytes) -> bytes:
    if cname == "lz4":
        return lz4_block_compress(buf)
    if cname == "zlib":
        return zlib.compress(bytes(buf), 5)
    if cname == "zstd":
        return zstd_compress(bytes(buf))
    if cname == "snappy":
        codec = _arrow_codec("snappy")
        if codec is None:
            raise NotImplementedError("snappy needs pyarrow")
        out = codec.compress(buf)
        return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)
    if cname == "blosclz":
        return blosclz_compress(buf)
    raise NotImplementedError(f"blosc internal codec {cname!r} unsupported")


def blosc_decompress(frame: bytes) -> bytes:
    """Decode a Blosc1 frame (as written by numcodecs.Blosc / c-blosc 1.x).

    Layout: 16-byte header (version, versionlz, flags, typesize, nbytes,
    blocksize, cbytes — all sizes LE uint32), then — unless the memcpy
    flag is set — one LE uint32 start offset per block, then the blocks.
    A block is ``typesize`` independently-compressed streams when
    byte-shuffle is on, split is allowed, and it is not the trailing
    partial block; else one stream. Each stream is a LE int32 compressed
    size followed by payload; size == uncompressed size marks a stored
    (incompressible) stream. Byte-shuffle is undone per block."""
    frame = bytes(frame)
    if len(frame) < 16:
        raise ValueError("blosc frame shorter than 16-byte header")
    version, _versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack("<III", frame[4:16])
    if cbytes > len(frame):
        raise ValueError(
            f"blosc frame truncated: header says {cbytes} bytes, got {len(frame)}"
        )
    if flags & _MEMCPYED:
        return frame[16 : 16 + nbytes]
    bitshuffled = bool(flags & _DOBITSHUFFLE) and typesize >= 1
    cname = _BLOSC_CODECS.get((flags >> 5) & 0x7, "?")
    if nbytes == 0:
        return b""
    if blocksize == 0:
        raise ValueError("corrupt blosc frame: zero blocksize")
    nblocks = (nbytes + blocksize - 1) // blocksize
    leftover = nbytes % blocksize
    bstarts = struct.unpack(f"<{nblocks}I", frame[16 : 16 + 4 * nblocks])
    shuffled = bool(flags & _DOSHUFFLE) and typesize > 1
    split = shuffled and not (flags & _DONT_SPLIT)
    out = bytearray()
    for j, start in enumerate(bstarts):
        last_partial = j == nblocks - 1 and leftover > 0
        bsize = leftover if last_partial else blocksize
        nstreams = typesize if (split and not last_partial) else 1
        neblock = bsize // nstreams
        pos = start
        block = bytearray()
        for _ in range(nstreams):
            (sbytes,) = struct.unpack("<i", frame[pos : pos + 4])
            pos += 4
            if sbytes < 0:
                raise ValueError("corrupt blosc frame: negative stream size")
            payload = frame[pos : pos + sbytes]
            pos += sbytes
            if sbytes == neblock:  # stored verbatim
                block += payload
            else:
                block += _stream_decompress(cname, payload, neblock)
        if len(block) != bsize:
            raise ValueError(
                f"blosc block {j} decoded to {len(block)} bytes, expected {bsize}"
            )
        if shuffled:
            block = unshuffle_bytes(bytes(block), typesize)
        elif bitshuffled:
            block = bitunshuffle_bytes(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc frame decoded to {len(out)}, expected {nbytes}")
    return bytes(out)


def blosc_compress(
    data: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    shuffle=True,
    blocksize: int = 0,
) -> bytes:
    """Encode a Blosc1 frame readable by :func:`blosc_decompress` (and by
    c-blosc/numcodecs — same public layout). ``shuffle`` accepts
    False/None, True/"byte" (byte-shuffle), or "bit" (bitshuffle).
    Used for the engine's zarr write path and for test fixtures."""
    data = bytes(data)
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = min(max(nbytes, typesize), 1 << 20)
    if typesize > 1:
        blocksize = max(blocksize - blocksize % typesize, typesize)
    flags = _BLOSC_CODES[cname] << 5
    bitshuffled = shuffle == "bit"
    shuffled = bool(shuffle) and not bitshuffled and typesize > 1
    if shuffled:
        flags |= _DOSHUFFLE
    if bitshuffled:
        flags |= _DOBITSHUFFLE
    if nbytes == 0:
        header = struct.pack("<BBBB III", 2, 1, flags | _MEMCPYED, max(typesize, 1), 0, blocksize, 16)
        return header
    nblocks = (nbytes + blocksize - 1) // blocksize
    leftover = nbytes % blocksize
    bstarts = []
    body = bytearray()
    body_base = 16 + 4 * nblocks
    for j in range(nblocks):
        last_partial = j == nblocks - 1 and leftover > 0
        bsize = leftover if last_partial else blocksize
        block = data[j * blocksize : j * blocksize + bsize]
        if shuffled:
            block = shuffle_bytes(block, typesize)
        elif bitshuffled:
            block = bitshuffle_bytes(block, typesize)
        nstreams = typesize if (shuffled and not last_partial) else 1
        neblock = bsize // nstreams
        bstarts.append(body_base + len(body))
        for s in range(nstreams):
            stream = block[s * neblock : (s + 1) * neblock]
            comp = _stream_compress(cname, stream)
            if len(comp) >= neblock:  # incompressible: store verbatim
                body += struct.pack("<i", neblock) + stream
            else:
                body += struct.pack("<i", len(comp)) + comp
        # trailing shuffle remainder of a split block rides in the last stream
        rem = bsize - neblock * nstreams
        if rem:
            # only possible when nstreams == 1 (bsize % 1 == 0), so unreachable;
            # kept as a guard for future split-mode changes
            raise AssertionError("blosc stream split left a remainder")
    cbytes = body_base + len(body)
    if cbytes >= nbytes + 16:
        header = struct.pack(
            "<BBBB III", 2, 1, (flags & ~(_DOSHUFFLE | _DOBITSHUFFLE)) | _MEMCPYED, max(typesize, 1), nbytes, blocksize, 16 + nbytes
        )
        return header + data
    header = struct.pack(
        "<BBBB III", 2, 1, flags, max(typesize, 1), nbytes, blocksize, cbytes
    )
    return header + struct.pack(f"<{nblocks}I", *bstarts) + bytes(body)


# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli, reflected poly 0x82F63B78) — the zarr v3
# ``crc32c`` codec used by sharding index chains.
# ---------------------------------------------------------------------------


def _crc32c_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
        table[i] = crc
    return table


_CRC32C_TABLE = _crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc = ~crc & 0xFFFFFFFF
    table = _CRC32C_TABLE
    for b in bytes(data):
        crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
    return ~crc & 0xFFFFFFFF
