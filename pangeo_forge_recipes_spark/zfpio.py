"""zfp lossy floating-point codec (HDF5 filter 32013 — H5Z-ZFP).

Pure-Python implementation of the published zfp compressed-stream
format (Lindstrom, "Fixed-Rate Compressed Floating-Point Arrays", IEEE
TVCG 2014; the algorithm and stream layout documented at
zfp.readthedocs.io): 4^d blocks, block-floating-point with a common
biased exponent per block, the non-orthogonal lifting transform,
total-sequency coefficient ordering, negabinary mapping, and embedded
group-tested bit-plane coding — with the full stream header (magic +
field meta + compression mode) and fixed-rate / fixed-precision /
fixed-accuracy modes, float32/float64, 1-3 dimensions.

Honesty note on pinning: no zfp binary, zfpy wheel, or
zfp-compressed archive exists in this container, so BIT-exact
interoperability with the C implementation cannot be verified here.
What IS verified: exact encode/decode round-trips of the bitstream,
the documented error bounds (fixed-accuracy absolute tolerance,
fixed-rate monotone improvement with rate), the exact invertibility of
the lifting transform pair, header field packing against the
documented layout (48-bit size fields + 2-bit dimensionality + 2-bit
scalar type; 12-bit short mode partition rate/precision/accuracy), and
the all-zero-block 1-bit fast path. The 1D/2D/3D coefficient orders
are verbatim transcriptions of the public static perm tables.
Reversible (lossless) mode is implemented per the documented
algorithm (r12) with bit-exact round trips — its block/mode field
layout is this implementation's own, see the reversible section's
honesty note; expert lossy modes raise named gates. Format anchors:
the reference pipeline reads such files
through HDF5 plugins (reference ``openers.py:40-47`` delegates to
h5py, which loads H5Z-ZFP when installed).

Each compressed HDF5 chunk is a SELF-CONTAINED zfp stream beginning
with the full header (the H5Z-ZFP design — chunks decode without the
dataset's advisory ``cd_values``, which this reader ignores).
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "compress_zfp",
    "decompress_zfp",
    "zfp_read_header",
    "ZfpHeader",
]

ZFP_CODEC_VERSION = 5
ZFP_MIN_BITS = 1
ZFP_MAX_BITS = 16658
ZFP_MAX_PREC = 64
ZFP_MIN_EXP = -1074
_MAGIC_BITS = 32
_META_BITS = 52
_MODE_SHORT_BITS = 12
# short-mode partition: [0,2047] rate, [2048,2175] precision,
# [2176,4093] accuracy; 0xFFF marks a 64-bit (expert/reversible) mode
_MODE_LONG_MARK = (1 << _MODE_SHORT_BITS) - 1

_MASK64 = (1 << 64) - 1


# ===========================================================================
# LSB-first bitstream over little-endian 64-bit words (zfp's bitstream)
# ===========================================================================


class _BitWriter:
    def __init__(self):
        self.words: List[int] = []
        self.acc = 0
        self.n = 0
        self.bits_written = 0

    def write_bits(self, value: int, nbits: int) -> None:
        if nbits <= 0:
            return
        value &= (1 << nbits) - 1
        self.acc |= value << self.n
        self.n += nbits
        self.bits_written += nbits
        while self.n >= 64:
            self.words.append(self.acc & _MASK64)
            self.acc >>= 64
            self.n -= 64

    def write_bit(self, bit: int) -> None:
        self.write_bits(1 if bit else 0, 1)

    def pad(self, nbits: int) -> None:
        self.write_bits(0, nbits)

    def getvalue(self) -> bytes:
        words = list(self.words)
        if self.n:
            words.append(self.acc & _MASK64)
        return b"".join(struct.pack("<Q", w) for w in words)


class _BitReader:
    def __init__(self, buf: bytes):
        pad = (-len(buf)) % 8
        self.buf = buf + b"\x00" * pad
        self.nwords = len(self.buf) // 8
        self.widx = 0
        self.acc = 0
        self.n = 0
        self.bits_read = 0

    def _fill(self) -> None:
        while self.n <= 64 and self.widx < self.nwords:
            (w,) = struct.unpack_from("<Q", self.buf, 8 * self.widx)
            self.acc |= w << self.n
            self.n += 64
            self.widx += 1

    def read_bits(self, nbits: int) -> int:
        if nbits <= 0:
            return 0
        out = 0
        shift = 0
        while nbits:
            if self.n == 0:
                self._fill()
                if self.n == 0:
                    # past the end: zfp streams read zeros
                    self.bits_read += nbits
                    return out
            take = min(nbits, self.n)
            out |= (self.acc & ((1 << take) - 1)) << shift
            self.acc >>= take
            self.n -= take
            shift += take
            nbits -= take
            self.bits_read += take
        return out

    def read_bit(self) -> int:
        return self.read_bits(1)

    def skip(self, nbits: int) -> None:
        self.read_bits(nbits)

    def peek(self, nbits: int) -> int:
        """Up to ``nbits`` upcoming bits as one int (LSB = next bit)
        WITHOUT consuming — the block coders decode from a local
        window (plain int shifts) and then ``skip`` what they used,
        which is ~10x faster than per-bit method calls."""
        out = self.acc & ((1 << self.n) - 1) if self.n else 0
        have = self.n
        widx = self.widx
        while have < nbits and widx < self.nwords:
            (w,) = struct.unpack_from("<Q", self.buf, 8 * widx)
            out |= w << have
            have += 64
            widx += 1
        return out & ((1 << nbits) - 1)


# ===========================================================================
# block transform (the documented non-orthogonal lifting pair)
# ===========================================================================


def _fwd_lift(v: List[int], off: int, s: int) -> None:
    x = v[off]
    y = v[off + s]
    z = v[off + 2 * s]
    w = v[off + 3 * s]
    # 1/16 * ( 4  4  4  4 ; 5  1 -1 -5 ; -4  4  4 -4 ; -2  6 -6  2 )
    x += w; x >>= 1; w -= x
    z += y; z >>= 1; y -= z
    x += z; x >>= 1; z -= x
    w += y; w >>= 1; y -= w
    w += y >> 1; y -= w >> 1
    v[off] = x
    v[off + s] = y
    v[off + 2 * s] = z
    v[off + 3 * s] = w


def _inv_lift(v: List[int], off: int, s: int) -> None:
    x = v[off]
    y = v[off + s]
    z = v[off + 2 * s]
    w = v[off + 3 * s]
    # 1/4 * ( 4  6 -4 -1 ; 4  2  4  5 ; 4 -2  4 -5 ; 4 -6 -4  1 )
    y += w >> 1; w -= y >> 1
    y += w; w <<= 1; w -= y
    z += x; x <<= 1; x -= z
    y += z; z <<= 1; z -= y
    w += x; x <<= 1; x -= w
    v[off] = x
    v[off + s] = y
    v[off + 2 * s] = z
    v[off + 3 * s] = w


def _fwd_xform(v: List[int], ndim: int) -> None:
    """In-place decorrelation; storage is x-fastest (C order reversed:
    linear index = x + 4*y + 16*z)."""
    if ndim == 1:
        _fwd_lift(v, 0, 1)
        return
    if ndim == 2:
        for y in range(4):
            _fwd_lift(v, 4 * y, 1)  # along x
        for x in range(4):
            _fwd_lift(v, x, 4)  # along y
        return
    for z in range(4):  # along x
        for y in range(4):
            _fwd_lift(v, 16 * z + 4 * y, 1)
    for x in range(4):  # along y
        for z in range(4):
            _fwd_lift(v, 16 * z + x, 4)
    for y in range(4):  # along z
        for x in range(4):
            _fwd_lift(v, 4 * y + x, 16)


def _inv_xform(v: List[int], ndim: int) -> None:
    if ndim == 1:
        _inv_lift(v, 0, 1)
        return
    if ndim == 2:
        for x in range(4):
            _inv_lift(v, x, 4)  # along y
        for y in range(4):
            _inv_lift(v, 4 * y, 1)  # along x
        return
    for y in range(4):  # along z
        for x in range(4):
            _inv_lift(v, 4 * y + x, 16)
    for x in range(4):  # along y
        for z in range(4):
            _inv_lift(v, 16 * z + x, 4)
    for z in range(4):  # along x
        for y in range(4):
            _inv_lift(v, 16 * z + 4 * y, 1)


# Coefficient orderings transcribed VERBATIM from zfp's public static
# tables (src/template/codec2.c perm_2 / codec3.c perm_3, with
# index(x,y,z) = x + 4y + 16z). An earlier revision GENERATED these by
# (total degree, sum of squares, higher-x-first) — that rule reproduces
# perm_1/perm_2 exactly but diverges from perm_3 inside the
# equal-(degree, sumsq) groups (e.g. zfp orders the degree-2 mixed
# terms (0,1,1),(1,0,1),(1,1,0) — LOWER x first — while the degree-3
# sumsq-5 group is the hand-tuned (2,1,0),(2,0,1),(0,2,1),(1,2,0),
# (1,0,2),(0,1,2), matching neither ascending nor descending x), and
# every round-trip test passed anyway: the order only matters for
# bit-interop with external streams. Tables are literals so the test
# suite can pin them as literals too.
_PERM_2_XY: List[Tuple[int, int]] = [
    (0, 0),
    (1, 0), (0, 1),
    (1, 1), (2, 0), (0, 2),
    (2, 1), (1, 2), (3, 0), (0, 3),
    (2, 2), (3, 1), (1, 3),
    (3, 2), (2, 3),
    (3, 3),
]

_PERM_3_XYZ: List[Tuple[int, int, int]] = [
    (0, 0, 0),                                                    # degree 0
    (1, 0, 0), (0, 1, 0), (0, 0, 1),                              # degree 1
    (0, 1, 1), (1, 0, 1), (1, 1, 0),                              # degree 2
    (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 1),                                                    # degree 3
    (2, 1, 0), (2, 0, 1), (0, 2, 1), (1, 2, 0), (1, 0, 2), (0, 1, 2),
    (3, 0, 0), (0, 3, 0), (0, 0, 3),
    (2, 1, 1), (1, 2, 1), (1, 1, 2),                              # degree 4
    (0, 2, 2), (2, 0, 2), (2, 2, 0),
    (3, 1, 0), (3, 0, 1), (0, 3, 1), (1, 3, 0), (1, 0, 3), (0, 1, 3),
    (1, 2, 2), (2, 1, 2), (2, 2, 1),                              # degree 5
    (3, 1, 1), (1, 3, 1), (1, 1, 3),
    (3, 2, 0), (3, 0, 2), (0, 3, 2), (2, 3, 0), (2, 0, 3), (0, 2, 3),
    (2, 2, 2),                                                    # degree 6
    (3, 2, 1), (3, 1, 2), (1, 3, 2), (2, 3, 1), (2, 1, 3), (1, 2, 3),
    (0, 3, 3), (3, 0, 3), (3, 3, 0),
    (3, 2, 2), (2, 3, 2), (2, 2, 3),                              # degree 7
    (3, 3, 1), (3, 1, 3), (1, 3, 3),
    (3, 3, 2), (3, 2, 3), (2, 3, 3),                              # degree 8
    (3, 3, 3),                                                    # degree 9
]

_PERM: Dict[int, List[int]] = {
    1: [0, 1, 2, 3],
    2: [x + 4 * y for x, y in _PERM_2_XY],
    3: [x + 4 * y + 16 * z for x, y, z in _PERM_3_XYZ],
}


# ===========================================================================
# embedded bit-plane coding (the published group-tested coder)
# ===========================================================================


def _encode_ints(
    w: _BitWriter, maxbits: int, maxprec: int, ublock: List[int], intprec: int
) -> int:
    size = len(ublock)
    kmin = intprec - maxprec if intprec > maxprec else 0
    bits = maxbits
    n = 0
    # transpose the block into per-plane words once (coefficient i ->
    # bit i of plane k), then code from local ints — no per-bit calls
    planes = [0] * intprec
    for i, u in enumerate(ublock):
        u >>= kmin
        for k in range(kmin, intprec):
            if not u:
                break
            planes[k] |= (u & 1) << i
            u >>= 1
    acc = 0  # pending output bits, LSB first
    pos = 0
    for k in range(intprec - 1, kmin - 1, -1):
        if not bits:
            break
        x = planes[k]
        # verbatim part: bits for the n coefficients already significant
        m = min(n, bits)
        bits -= m
        acc |= (x & ((1 << m) - 1)) << pos
        pos += m
        x >>= m
        # group-tested unary part for the rest
        while n < size and bits:
            bits -= 1
            if x:
                acc |= 1 << pos
                pos += 1
            else:
                pos += 1
                break
            while n < size - 1 and bits:
                bits -= 1
                b = x & 1
                acc |= b << pos
                pos += 1
                if b:
                    break
                x >>= 1
                n += 1
            x >>= 1
            n += 1
    w.write_bits(acc, pos)
    return maxbits - bits


def _decode_ints(
    r: _BitReader, maxbits: int, maxprec: int, size: int, intprec: int
) -> Tuple[List[int], int]:
    data = [0] * size
    kmin = intprec - maxprec if intprec > maxprec else 0
    bits = maxbits
    n = 0
    # decode from a peeked local window: the loop can consume at most
    # one verbatim+unary pass per plane
    win = r.peek(min(maxbits, (intprec - kmin) * (2 * size + 1)))
    pos = 0
    for k in range(intprec - 1, kmin - 1, -1):
        if not bits:
            break
        m = min(n, bits)
        bits -= m
        x = (win >> pos) & ((1 << m) - 1)
        pos += m
        while n < size and bits:
            bits -= 1
            b = (win >> pos) & 1
            pos += 1
            if not b:
                break
            while n < size - 1 and bits:
                bits -= 1
                b = (win >> pos) & 1
                pos += 1
                if b:
                    break
                n += 1
            x += 1 << n
            n += 1
        i = 0
        while x:
            if x & 1:
                data[i] += 1 << k
            i += 1
            x >>= 1
    r.skip(pos)
    return data, maxbits - bits


# ===========================================================================
# float block codec
# ===========================================================================


def _precision(emax: int, maxprec: int, minexp: int, ndim: int) -> int:
    return min(maxprec, max(0, emax - minexp + 2 * (ndim + 1)))


def _exponent(x: float, ebias: int) -> int:
    if x > 0:
        e = math.frexp(x)[1]
        return max(e, 1 - ebias)  # clamp denormals
    return -ebias


def _encode_block_float(
    w: _BitWriter,
    params: dict,
    fblock: np.ndarray,
    ndim: int,
) -> None:
    is64 = fblock.dtype == np.float64
    ebits = 11 if is64 else 8
    ebias = 1023 if is64 else 127
    intprec = 64 if is64 else 32
    nbmask = 0xAAAAAAAAAAAAAAAA if is64 else 0xAAAAAAAA
    wmask = (1 << intprec) - 1
    start = w.bits_written
    amax = float(np.max(np.abs(fblock))) if fblock.size else 0.0
    emax = _exponent(amax, ebias)
    maxprec = _precision(emax, params["maxprec"], params["minexp"], ndim)
    e = (emax + ebias) if maxprec else 0
    if not e:
        w.write_bit(0)  # all-(effectively-)zero block
    else:
        # common exponent; LSB=1 marks a nonzero block
        w.write_bits(2 * e + 1, ebits + 1)
        # block-floating-point: scale by 2^(intprec-2-emax), truncate.
        # ldexp applies the scale to each VALUE (the C formulation):
        # materializing 2^k itself overflows for blocks whose amax sits
        # in the denormal range (k > 1023 for float64)
        k = intprec - 2 - emax
        ints = [int(math.ldexp(float(v), k)) for v in fblock.ravel()]
        _fwd_xform(ints, ndim)
        perm = _PERM[ndim]
        ublock = [
            (((ints[perm[j]] & wmask) + nbmask) & wmask) ^ nbmask
            for j in range(len(ints))
        ]
        budget = params["maxbits"] - (1 + ebits)
        _encode_ints(w, budget, maxprec, ublock, intprec)
    used = w.bits_written - start
    if used < params["minbits"]:
        w.pad(params["minbits"] - used)


def _decode_block_float(
    r: _BitReader,
    params: dict,
    ndim: int,
    is64: bool,
) -> np.ndarray:
    ebits = 11 if is64 else 8
    ebias = 1023 if is64 else 127
    intprec = 64 if is64 else 32
    nbmask = 0xAAAAAAAAAAAAAAAA if is64 else 0xAAAAAAAA
    wmask = (1 << intprec) - 1
    signbit = 1 << (intprec - 1)
    start = r.bits_read
    size = 4**ndim
    if not r.read_bit():
        out = np.zeros(size, dtype=np.float64)
    else:
        e = r.read_bits(ebits)
        emax = e - ebias
        maxprec = _precision(emax, params["maxprec"], params["minexp"], ndim)
        budget = params["maxbits"] - (1 + ebits)
        ublock, _ = _decode_ints(r, budget, maxprec, size, intprec)
        perm = _PERM[ndim]
        ints = [0] * size
        for j in range(size):
            u = ublock[j]
            v = ((u ^ nbmask) - nbmask) & wmask
            if v & signbit:  # two's complement back to Python int
                v -= 1 << intprec
            ints[perm[j]] = v
        _inv_xform(ints, ndim)
        # per-value ldexp (not a materialized 2^k): k < -1022 would
        # underflow the scale to 0.0 and wipe denormal-range blocks
        k = emax + 2 - intprec
        out = np.array(
            [math.ldexp(float(v), k) for v in ints], dtype=np.float64
        )
    consumed = r.bits_read - start
    if consumed < params["minbits"]:
        r.skip(params["minbits"] - consumed)
    return out


# ===========================================================================
# reversible (lossless) mode
# ===========================================================================
# The documented reversible pipeline (zfp docs, "lossless compression"):
# per 4^d block, first ATTEMPT the block-floating-point transform and
# verify bit-exact reconstruction; when that fails (or the block holds
# non-finite values), reinterpret the IEEE bits as two's-complement
# integers instead. Either way, decorrelate with a REVERSIBLE integer
# transform (the second-order Lorenzo / high-order difference lifting,
# exactly invertible in modular arithmetic — unlike the lossy lifting's
# >>1 round-off), reorder with the same perm tables, map to negabinary,
# and code ALL bit planes (no truncation), skipping the trailing
# all-zero low-order planes via an explicit count.
#
# HONESTY (wire pinning): the reversible BLOCK layout below — 1-bit
# zero flag; 1-bit bfp-vs-reinterpret flag; ebits biased exponent (bfp
# only); 5/6-bit trailing-zero-plane count; group-tested planes — and
# the 64-bit long-form mode word in the header follow the documented
# ALGORITHM but their exact field layout is this implementation's own
# (no zfp binary or reversible archive exists in this container to pin
# against, and the r11 lesson says self-round-trips cannot detect such
# divergence). Streams are self-describing and round-trip bit-exactly;
# bit-interop with C-encoded reversible archives is NOT claimed.

ZFP_MIN_EXP_REV = ZFP_MIN_EXP - 1  # reversible marker (minexp < ZFP_MIN_EXP)


def _rev_fwd_lift(v: List[int], off: int, s: int, mask: int, sign: int) -> None:
    """High-order Lorenzo forward transform — w-=z; z-=y; y-=x; w-=z;
    z-=y; w-=z — with two's-complement wraparound at the scalar width
    (the C Int arithmetic), so the inverse is exact in Z/2^p."""
    x = v[off]
    y = v[off + s]
    z = v[off + 2 * s]
    w = v[off + 3 * s]
    w -= z
    z -= y
    y -= x
    w -= z
    z -= y
    w -= z
    v[off + s] = ((y + sign) & mask) - sign
    v[off + 2 * s] = ((z + sign) & mask) - sign
    v[off + 3 * s] = ((w + sign) & mask) - sign


def _rev_inv_lift(v: List[int], off: int, s: int, mask: int, sign: int) -> None:
    x = v[off]
    y = v[off + s]
    z = v[off + 2 * s]
    w = v[off + 3 * s]
    w += z
    z += y
    w += z
    y += x
    z += y
    w += z
    v[off + s] = ((y + sign) & mask) - sign
    v[off + 2 * s] = ((z + sign) & mask) - sign
    v[off + 3 * s] = ((w + sign) & mask) - sign


def _rev_xform(v: List[int], ndim: int, intprec: int, inverse: bool) -> None:
    """Reversible decorrelation along each dimension — same loop
    structure as the lossy pair (x, then y, then z; inverse reversed)."""
    mask = (1 << intprec) - 1
    sign = 1 << (intprec - 1)
    lift = _rev_inv_lift if inverse else _rev_fwd_lift
    passes: List[Tuple[int, Tuple[int, ...]]] = []
    if ndim == 1:
        passes = [(1, (0,))]
    elif ndim == 2:
        passes = [
            (1, tuple(4 * yy for yy in range(4))),
            (4, tuple(range(4))),
        ]
    else:
        passes = [
            (1, tuple(16 * zz + 4 * yy for zz in range(4) for yy in range(4))),
            (4, tuple(16 * zz + xx for xx in range(4) for zz in range(4))),
            (16, tuple(4 * yy + xx for yy in range(4) for xx in range(4))),
        ]
    if inverse:
        passes = passes[::-1]
    for s, offs in passes:
        for off in offs:
            lift(v, off, s, mask, sign)


def _encode_block_rev(
    w: _BitWriter, fblock: np.ndarray, ndim: int
) -> None:
    is64 = fblock.dtype == np.float64
    ebits = 11 if is64 else 8
    ebias = 1023 if is64 else 127
    intprec = 64 if is64 else 32
    nbmask = 0xAAAAAAAAAAAAAAAA if is64 else 0xAAAAAAAA
    wmask = (1 << intprec) - 1
    sign = 1 << (intprec - 1)
    zbits = 6 if is64 else 5  # trailing-zero-plane count, [0, intprec-1]
    flat = fblock.ravel()
    raw = flat.view(np.uint64 if is64 else np.uint32)
    if not raw.any():
        w.write_bit(0)  # all +0.0 — bit-pattern zero, not just value zero
        return
    w.write_bit(1)
    ints: Optional[List[int]] = None
    emax = 0
    if bool(np.isfinite(flat).all()):
        amax = float(np.max(np.abs(flat)))
        emax = _exponent(amax, ebias)
        k = intprec - 2 - emax
        cand = [int(math.ldexp(float(v), k)) for v in flat]
        recon = np.ldexp(
            np.array(cand, dtype=np.float64), emax + 2 - intprec
        ).astype(fblock.dtype)
        if bool(np.array_equal(recon.view(raw.dtype), raw)):
            ints = cand
    if ints is not None:
        w.write_bit(1)  # block-floating-point path
        w.write_bits(emax + ebias, ebits)
    else:
        w.write_bit(0)  # reinterpret path (exact for any bits, NaN/Inf too)
        ints = [((int(u) + sign) & wmask) - sign for u in raw]
    _rev_xform(ints, ndim, intprec, inverse=False)
    perm = _PERM[ndim]
    ublock = [
        (((ints[perm[j]] & wmask) + nbmask) & wmask) ^ nbmask
        for j in range(len(ints))
    ]
    acc = 0
    for u in ublock:
        acc |= u
    z = (acc & -acc).bit_length() - 1  # trailing all-zero planes
    w.write_bits(z, zbits)
    _encode_ints(w, 1 << 30, intprec - z, ublock, intprec)


def _decode_block_rev(
    r: _BitReader, ndim: int, is64: bool
) -> np.ndarray:
    ebits = 11 if is64 else 8
    ebias = 1023 if is64 else 127
    intprec = 64 if is64 else 32
    nbmask = 0xAAAAAAAAAAAAAAAA if is64 else 0xAAAAAAAA
    wmask = (1 << intprec) - 1
    signbit = 1 << (intprec - 1)
    zbits = 6 if is64 else 5
    dtype = np.float64 if is64 else np.float32
    size = 4**ndim
    if not r.read_bit():
        return np.zeros(size, dtype=dtype)
    bfp = r.read_bit()
    emax = (r.read_bits(ebits) - ebias) if bfp else 0
    z = r.read_bits(zbits)
    ublock, _ = _decode_ints(r, 1 << 30, intprec - z, size, intprec)
    perm = _PERM[ndim]
    ints = [0] * size
    for j in range(size):
        v = ((ublock[j] ^ nbmask) - nbmask) & wmask
        if v & signbit:
            v -= 1 << intprec
        ints[perm[j]] = v
    _rev_xform(ints, ndim, intprec, inverse=True)
    if bfp:
        return np.ldexp(
            np.array(ints, dtype=np.float64), emax + 2 - intprec
        ).astype(dtype)
    u = np.array([i & wmask for i in ints], dtype=np.uint64)
    return u.astype(np.uint64 if is64 else np.uint32).view(dtype)


# ===========================================================================
# partial-block gather/scatter (pad_block replication)
# ===========================================================================


def _pad_axis(block: np.ndarray, n: int, axis: int) -> None:
    """zfp pad_block: given n valid samples along axis, fill 4."""
    ix = [slice(None)] * block.ndim

    def seti(dst, src):
        a, b = list(ix), list(ix)
        a[axis], b[axis] = dst, src
        block[tuple(a)] = block[tuple(b)]

    if n == 0:
        ix0 = list(ix)
        ix0[axis] = 0
        block[tuple(ix0)] = 0
        n = 1
    if n == 1:
        seti(1, 0)
        n = 2
    if n == 2:
        seti(2, 1)
        n = 3
    if n == 3:
        seti(3, 0)


def _gather(arr: np.ndarray, origin: Tuple[int, ...]) -> np.ndarray:
    """4^d block at origin (numpy C-order axes, slowest first), padded
    per pad_block along each dimension fastest-first."""
    ndim = arr.ndim
    shape = arr.shape
    valid = [min(4, shape[d] - origin[d]) for d in range(ndim)]
    block = np.zeros((4,) * ndim, dtype=arr.dtype)
    src = tuple(slice(origin[d], origin[d] + valid[d]) for d in range(ndim))
    block[tuple(slice(0, v) for v in valid)] = arr[src]
    # pad fastest axis first (x = last numpy axis), matching
    # gather_partial's x-then-y-then-z fill
    for axis in range(ndim - 1, -1, -1):
        if valid[axis] < 4:
            _pad_axis(block, valid[axis], axis)
    return block


def _scatter(arr: np.ndarray, block: np.ndarray, origin: Tuple[int, ...]) -> None:
    ndim = arr.ndim
    valid = [min(4, arr.shape[d] - origin[d]) for d in range(ndim)]
    dst = tuple(slice(origin[d], origin[d] + valid[d]) for d in range(ndim))
    arr[dst] = block[tuple(slice(0, v) for v in valid)]


# ===========================================================================
# header (magic + field meta + mode)
# ===========================================================================


class ZfpHeader:
    def __init__(self, dtype, shape, minbits, maxbits, maxprec, minexp):
        self.dtype = np.dtype(dtype)
        self.shape = tuple(shape)  # numpy C-order (slowest first)
        self.minbits = minbits
        self.maxbits = maxbits
        self.maxprec = maxprec
        self.minexp = minexp

    @property
    def params(self) -> dict:
        return {
            "minbits": self.minbits,
            "maxbits": self.maxbits,
            "maxprec": self.maxprec,
            "minexp": self.minexp,
        }

    @property
    def reversible(self) -> bool:
        """minexp below the representable floor marks reversible mode
        (the zfp convention: set_reversible stores ZFP_MIN_EXP - 1)."""
        return self.minexp < ZFP_MIN_EXP


def _mode_params(
    rate: Optional[float],
    precision: Optional[int],
    tolerance: Optional[float],
    ndim: int,
    dtype: np.dtype,
) -> Tuple[int, int, int, int]:
    given = sum(p is not None for p in (rate, precision, tolerance))
    if given != 1:
        raise ValueError("give exactly one of rate=, precision=, tolerance=")
    if rate is not None:
        n = 4**ndim
        bits = int(math.floor(n * float(rate) + 0.5))
        floor_bits = (1 + 11) if dtype == np.float64 else (1 + 8)
        if bits < floor_bits:
            # real zfp clamps only to ZFP_MIN_BITS=1 and truncates the
            # exponent field mid-write; this encoder always emits the
            # full 1+ebits exponent, so silently rounding the rate up
            # (as an earlier revision did) would produce a stream whose
            # header mode value AND size differ from real zfp's for the
            # same parameters — refuse instead
            raise NotImplementedError(
                f"zfp fixed rate {rate} gives {bits} bits/block — below "
                f"the {floor_bits}-bit zero-flag+exponent floor this "
                "encoder can honor (real zfp truncates the exponent "
                "field for such rates); use a rate of at least "
                f"{floor_bits / n:.3f} bits/value"
            )
        if bits > 2048:
            # real zfp would emit an expert-mode (long-form) header
            # here; degrading the requested fidelity silently would be
            # worse than refusing
            raise NotImplementedError(
                f"zfp fixed rate {rate} needs {bits} bits/block — beyond "
                "the 2048-bit short-mode header (expert mode unsupported); "
                "use precision= or tolerance= instead"
            )
        return bits, bits, ZFP_MAX_PREC, ZFP_MIN_EXP
    if precision is not None:
        prec = int(precision)
        if not 1 <= prec <= 64:
            raise ValueError("precision must be in [1, 64]")
        return ZFP_MIN_BITS, ZFP_MAX_BITS, prec, ZFP_MIN_EXP
    tol = float(tolerance)
    emin = ZFP_MIN_EXP
    if tol > 0:
        emin = math.frexp(tol)[1] - 1  # 2^emin <= tol < 2^(emin+1)
    emin = max(emin, ZFP_MIN_EXP)
    return ZFP_MIN_BITS, ZFP_MAX_BITS, ZFP_MAX_PREC, emin


def _mode_to_short(minbits, maxbits, maxprec, minexp) -> int:
    if minbits == maxbits and maxprec == ZFP_MAX_PREC and minexp == ZFP_MIN_EXP:
        if maxbits <= 2048:
            return maxbits - 1  # fixed rate: [0, 2047]
    if minbits == ZFP_MIN_BITS and maxbits == ZFP_MAX_BITS and minexp == ZFP_MIN_EXP:
        if maxprec <= 128:
            return 2048 + maxprec - 1  # fixed precision: [2048, 2175]
    if minbits == ZFP_MIN_BITS and maxbits == ZFP_MAX_BITS and maxprec == ZFP_MAX_PREC:
        return 2048 + 128 + (minexp - ZFP_MIN_EXP)  # fixed accuracy
    raise NotImplementedError(
        "zfp expert-mode parameter sets are not supported (fixed-rate/"
        "precision/accuracy only)"
    )


def _mode_long_pack(minbits, maxbits, maxprec, minexp) -> int:
    """64-bit long-form mode word for parameter sets the 12-bit short
    partition cannot express (here: reversible). Field layout (this
    implementation's own — see the reversible honesty note):
    bits 0-15 minbits-1 | 16-31 maxbits-1 | 32-38 maxprec-1 |
    39-51 minexp - ZFP_MIN_EXP_REV."""
    return (
        (minbits - 1)
        | ((maxbits - 1) << 16)
        | ((maxprec - 1) << 32)
        | ((minexp - ZFP_MIN_EXP_REV) << 39)
    )


def _mode_long_unpack(word: int) -> Tuple[int, int, int, int]:
    return (
        (word & 0xFFFF) + 1,
        ((word >> 16) & 0xFFFF) + 1,
        ((word >> 32) & 0x7F) + 1,
        ((word >> 39) & 0x1FFF) + ZFP_MIN_EXP_REV,
    )


def _mode_from_short(mode: int) -> Tuple[int, int, int, int]:
    if mode < 2048:
        bits = mode + 1
        return bits, bits, ZFP_MAX_PREC, ZFP_MIN_EXP
    if mode < 2048 + 128:
        return ZFP_MIN_BITS, ZFP_MAX_BITS, mode - 2048 + 1, ZFP_MIN_EXP
    return (
        ZFP_MIN_BITS,
        ZFP_MAX_BITS,
        ZFP_MAX_PREC,
        mode - (2048 + 128) + ZFP_MIN_EXP,
    )


_TYPE_CODE = {np.dtype("float32"): 3, np.dtype("float64"): 4}  # zfp_type - 1 fields
_CODE_TYPE = {2: np.dtype("float32"), 3: np.dtype("float64")}


def _write_header(w: _BitWriter, hdr: ZfpHeader) -> None:
    for ch in b"zfp":
        w.write_bits(ch, 8)
    w.write_bits(ZFP_CODEC_VERSION, 8)
    # meta: low 2 bits type-1, next 2 bits dims-1, then sizes-1
    # x-fastest (nx lowest)
    ndim = len(hdr.shape)
    sizes = list(reversed(hdr.shape))  # nx, ny, nz
    field_bits = 48 // ndim
    meta = 0
    for s in reversed(sizes):  # nz first so nx lands lowest
        if (s - 1) >> field_bits:
            raise ValueError(f"zfp: dimension size {s} too large for {ndim}D")
        meta = (meta << field_bits) + (s - 1)
    meta = (meta << 2) + (ndim - 1)
    meta = (meta << 2) + (_TYPE_CODE[hdr.dtype] - 1)
    w.write_bits(meta, _META_BITS)
    if hdr.minexp < ZFP_MIN_EXP:  # reversible: long-form mode
        w.write_bits(_MODE_LONG_MARK, _MODE_SHORT_BITS)
        w.write_bits(
            _mode_long_pack(
                hdr.minbits, hdr.maxbits, hdr.maxprec, hdr.minexp
            ),
            64,
        )
        return
    mode = _mode_to_short(hdr.minbits, hdr.maxbits, hdr.maxprec, hdr.minexp)
    if mode >= _MODE_LONG_MARK:
        raise NotImplementedError("zfp long (expert) mode header")
    w.write_bits(mode, _MODE_SHORT_BITS)


def _read_header(r: _BitReader) -> ZfpHeader:
    magic = bytes(r.read_bits(8) for _ in range(3))
    if magic != b"zfp":
        raise ValueError(f"not a zfp stream (magic {magic!r})")
    version = r.read_bits(8)
    if version != ZFP_CODEC_VERSION:
        raise NotImplementedError(f"zfp codec version {version} unsupported")
    meta = r.read_bits(_META_BITS)
    tcode = meta & 3
    meta >>= 2
    ndim = (meta & 3) + 1
    meta >>= 2
    if tcode + 1 not in (3, 4):
        raise NotImplementedError(
            f"zfp scalar type code {tcode} unsupported (float32/float64 only)"
        )
    dtype = _CODE_TYPE[tcode]
    if ndim > 3:
        raise NotImplementedError("zfp 4D streams unsupported")
    field_bits = 48 // ndim
    sizes = []
    for _ in range(ndim):  # nx first (lowest bits)
        sizes.append((meta & ((1 << field_bits) - 1)) + 1)
        meta >>= field_bits
    shape = tuple(reversed(sizes))  # back to numpy order
    mode = r.read_bits(_MODE_SHORT_BITS)
    if mode >= _MODE_LONG_MARK:
        minbits, maxbits, maxprec, minexp = _mode_long_unpack(
            r.read_bits(64)
        )
        if minexp >= ZFP_MIN_EXP:
            raise NotImplementedError(
                "zfp expert-mode (long-form, non-reversible) parameter "
                "sets are unsupported"
            )
        return ZfpHeader(dtype, shape, minbits, maxbits, maxprec, minexp)
    minbits, maxbits, maxprec, minexp = _mode_from_short(mode)
    return ZfpHeader(dtype, shape, minbits, maxbits, maxprec, minexp)


def zfp_read_header(buf: bytes) -> ZfpHeader:
    """Parse the stream header only (shape, dtype, mode parameters)."""
    return _read_header(_BitReader(buf))


# ===========================================================================
# top level
# ===========================================================================


def _block_origins(shape: Tuple[int, ...]):
    import itertools

    return itertools.product(*(range(0, s, 4) for s in shape))


def compress_zfp(
    arr: np.ndarray,
    rate: Optional[float] = None,
    precision: Optional[int] = None,
    tolerance: Optional[float] = None,
    reversible: bool = False,
) -> bytes:
    """Compress a 1-3D float32/float64 array into a self-contained zfp
    stream (full header + blocks, flushed to a 64-bit word boundary).
    Exactly one of ``rate`` (bits/value), ``precision`` (bit planes),
    ``tolerance`` (absolute error bound), or ``reversible=True``
    (bit-exact lossless, NaN/Inf allowed) selects the mode."""
    arr = np.asarray(arr)
    if arr.dtype not in (np.dtype("float32"), np.dtype("float64")):
        raise NotImplementedError(
            f"zfp: dtype {arr.dtype} unsupported (float32/float64 only)"
        )
    if not 1 <= arr.ndim <= 3:
        raise NotImplementedError("zfp: 1-3 dimensional arrays only")
    if reversible:
        if rate is not None or precision is not None or tolerance is not None:
            raise ValueError(
                "reversible=True excludes rate=/precision=/tolerance="
            )
        if not arr.flags.c_contiguous:
            arr = np.ascontiguousarray(arr)
        hdr = ZfpHeader(
            arr.dtype, arr.shape, ZFP_MIN_BITS, ZFP_MAX_BITS,
            ZFP_MAX_PREC, ZFP_MIN_EXP_REV,
        )
        w = _BitWriter()
        _write_header(w, hdr)
        for origin in _block_origins(arr.shape):
            _encode_block_rev(w, _gather(arr, origin), arr.ndim)
        return w.getvalue()
    if not np.isfinite(arr).all():
        # zfp documents NaN/Inf as unsupported in the LOSSY modes;
        # encoding one silently zeroes every finite neighbor in its 4^d
        # block (the common NaN-fill pattern in geoscience data would
        # corrupt wholesale). Reversible mode handles them exactly.
        raise ValueError(
            "zfp lossy modes cannot encode NaN/Inf values — use "
            "reversible=True, or replace fills with a finite sentinel "
            "(and a fill_value attribute) before compressing"
        )
    if not arr.flags.c_contiguous:
        arr = np.ascontiguousarray(arr)
    minbits, maxbits, maxprec, minexp = _mode_params(
        rate, precision, tolerance, arr.ndim, arr.dtype
    )
    hdr = ZfpHeader(arr.dtype, arr.shape, minbits, maxbits, maxprec, minexp)
    w = _BitWriter()
    _write_header(w, hdr)
    params = hdr.params
    for origin in _block_origins(arr.shape):
        _encode_block_float(w, params, _gather(arr, origin), arr.ndim)
    return w.getvalue()


def decompress_zfp(buf: bytes) -> np.ndarray:
    """Decompress a self-contained zfp stream to its numpy array."""
    r = _BitReader(buf)
    hdr = _read_header(r)
    is64 = hdr.dtype == np.dtype("float64")
    if hdr.reversible:
        out = np.zeros(hdr.shape, dtype=hdr.dtype)
        ndim = len(hdr.shape)
        for origin in _block_origins(hdr.shape):
            block = _decode_block_rev(r, ndim, is64).reshape((4,) * ndim)
            _scatter(out, block, origin)
        return out
    floor_bits = 1 + (11 if is64 else 8)
    if hdr.maxbits < floor_bits:
        raise NotImplementedError(
            f"zfp stream with maxbits={hdr.maxbits} < {floor_bits}: "
            "truncated-exponent (sub-minimal fixed-rate) blocks are "
            "unsupported"
        )
    # allocate in the header dtype: per-block values are cast on
    # scatter-assignment (same round-to-nearest as a whole-array astype
    # would apply), halving peak memory for float32 — the dominant
    # dtype in zfp-compressed geoscience archives
    out = np.zeros(hdr.shape, dtype=hdr.dtype)
    params = hdr.params
    ndim = len(hdr.shape)
    for origin in _block_origins(hdr.shape):
        block = _decode_block_float(r, params, ndim, is64).reshape((4,) * ndim)
        _scatter(out, block, origin)
    return out
