"""zfp codec (HDF5 filter 32013): the published block-transform /
negabinary / embedded-coding algorithm, stream header packing, and the
three public modes. Honesty: no zfp binary exists in this container, so
these tests pin SELF-consistency plus every property the public spec
states (error bounds, exact rate arithmetic, header field layout,
zero-block fast path) — not bit-exact C interop (documented in
zfpio.py's module docstring and SURVEY)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pangeo_forge_recipes_spark.zfpio import (
    ZFP_MAX_PREC,
    ZFP_MIN_EXP,
    _PERM,
    _fwd_lift,
    _inv_lift,
    compress_zfp,
    decompress_zfp,
    zfp_read_header,
)


# ---------------------------------------------------------------------------
# transform + ordering
# ---------------------------------------------------------------------------


def test_lift_matches_documented_matrix():
    """The forward lifting steps implement the spec's non-orthogonal
    matrix 1/16 * [[4,4,4,4],[5,1,-1,-5],[-4,4,4,-4],[-2,6,-6,2]] up to
    the right-shift round-off the lifting introduces."""
    M = np.array(
        [[4, 4, 4, 4], [5, 1, -1, -5], [-4, 4, 4, -4], [-2, 6, -6, 2]]
    ) / 16.0
    rng = np.random.default_rng(3)
    for _ in range(200):
        v = [int(x) for x in rng.integers(-(2**20), 2**20, 4)]
        w = list(v)
        _fwd_lift(w, 0, 1)
        np.testing.assert_allclose(w, M @ np.array(v), atol=4)


@given(st.lists(st.integers(-(2**30), 2**30), min_size=4, max_size=4))
@settings(max_examples=300, deadline=None)
def test_lift_pair_near_inverse(v):
    """inv(fwd(v)) reconstructs within the small additive round-off of
    the >>1 lifting steps (zfp's transform is deliberately NOT lossless
    — that is what reversible mode exists for)."""
    w = list(v)
    _fwd_lift(w, 0, 1)
    _inv_lift(w, 0, 1)
    assert max(abs(a - b) for a, b in zip(v, w)) <= 4


def test_perm_tables_pin_published_literals():
    """The coefficient orders are transcriptions of zfp's public static
    tables (codec2.c perm_2 / codec3.c perm_3) — pin them as LITERALS,
    not via any generating rule (round-11 lesson: the (degree, sumsq,
    higher-x) rule reproduced perm_2 exactly yet silently diverged from
    perm_3 inside the tie groups while every round-trip test passed)."""
    assert _PERM[1] == [0, 1, 2, 3]
    published_2 = [
        (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (2, 1), (1, 2),
        (3, 0), (0, 3), (2, 2), (3, 1), (1, 3), (3, 2), (2, 3), (3, 3),
    ]
    assert _PERM[2] == [x + 4 * y for x, y in published_2]
    # zfp codec3.c perm_3, all 64 entries, index(x,y,z) = x + 4y + 16z
    published_3 = [
        (0, 0, 0),
        (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (0, 1, 1), (1, 0, 1), (1, 1, 0),
        (2, 0, 0), (0, 2, 0), (0, 0, 2),
        (1, 1, 1),
        (2, 1, 0), (2, 0, 1), (0, 2, 1), (1, 2, 0), (1, 0, 2), (0, 1, 2),
        (3, 0, 0), (0, 3, 0), (0, 0, 3),
        (2, 1, 1), (1, 2, 1), (1, 1, 2),
        (0, 2, 2), (2, 0, 2), (2, 2, 0),
        (3, 1, 0), (3, 0, 1), (0, 3, 1), (1, 3, 0), (1, 0, 3), (0, 1, 3),
        (1, 2, 2), (2, 1, 2), (2, 2, 1),
        (3, 1, 1), (1, 3, 1), (1, 1, 3),
        (3, 2, 0), (3, 0, 2), (0, 3, 2), (2, 3, 0), (2, 0, 3), (0, 2, 3),
        (2, 2, 2),
        (3, 2, 1), (3, 1, 2), (1, 3, 2), (2, 3, 1), (2, 1, 3), (1, 2, 3),
        (0, 3, 3), (3, 0, 3), (3, 3, 0),
        (3, 2, 2), (2, 3, 2), (2, 2, 3),
        (3, 3, 1), (3, 1, 3), (1, 3, 3),
        (3, 3, 2), (3, 2, 3), (2, 3, 3),
        (3, 3, 3),
    ]
    assert _PERM[3] == [x + 4 * y + 16 * z for x, y, z in published_3]
    # structural sanity: each is a valid permutation with non-decreasing
    # total degree
    for ndim in (1, 2, 3):
        p = _PERM[ndim]
        assert sorted(p) == list(range(4**ndim))

        def total(i, nd=ndim):
            t = 0
            for _ in range(nd):
                t += i % 4
                i //= 4
            return t

        totals = [total(i) for i in p]
        assert totals == sorted(totals)


# ---------------------------------------------------------------------------
# stream header
# ---------------------------------------------------------------------------


def test_header_layout_and_fields():
    a = np.zeros((6, 10), dtype="float32")
    buf = compress_zfp(a, precision=24)
    # magic: 'z' 'f' 'p' codec-version, one byte each, LSB-first words
    assert buf[:3] == b"zfp" and buf[3] == 5
    h = zfp_read_header(buf)
    assert h.dtype == np.dtype("float32") and h.shape == (6, 10)
    assert h.maxprec == 24 and h.minexp == ZFP_MIN_EXP
    # meta bit packing: type-1 (2 bits) | dims-1 (2) | nx-1 | ny-1
    (word,) = struct.unpack_from("<Q", buf, 0)
    meta = (word >> 32) | ((struct.unpack_from("<Q", buf, 8)[0] & 0xFFFFF) << 32)
    assert meta & 3 == 3 - 1  # zfp_type_float(3) - 1 ... stored as code 2
    assert (meta >> 2) & 3 == 2 - 1  # dimensionality 2
    assert ((meta >> 4) & 0xFFFFFF) == 10 - 1  # nx = fastest = numpy last
    assert ((meta >> 28) & 0xFFFFFF) == 6 - 1  # ny
    # rate mode header: minbits == maxbits == rate * 16
    h2 = zfp_read_header(compress_zfp(a, rate=8))
    assert h2.minbits == h2.maxbits == 8 * 16
    assert h2.maxprec == ZFP_MAX_PREC and h2.minexp == ZFP_MIN_EXP
    # accuracy mode header: minexp = floor(log2(tol))
    h3 = zfp_read_header(compress_zfp(a.astype("f8"), tolerance=0.25))
    assert h3.minexp == -2
    with pytest.raises(ValueError, match="not a zfp stream"):
        zfp_read_header(b"nope" + bytes(12))


def test_fixed_rate_size_is_exact():
    """Fixed-rate streams have a closed-form size: 96 header bits +
    n_blocks * rate * 4^d, flushed to a 64-bit word."""
    a = np.random.default_rng(0).normal(size=(17, 23))
    for rate in (4, 8, 16):
        nblocks = math.ceil(17 / 4) * math.ceil(23 / 4)
        bits = 96 + nblocks * rate * 16
        want = math.ceil(bits / 64) * 8
        assert len(compress_zfp(a, rate=rate)) == want


# ---------------------------------------------------------------------------
# modes + error bounds
# ---------------------------------------------------------------------------


def test_accuracy_mode_bounds_absolute_error():
    rng = np.random.default_rng(42)
    a = rng.normal(size=(33, 19)).astype("float64") * 1000
    for tol in (1.0, 1e-3, 1e-7):
        back = decompress_zfp(compress_zfp(a, tolerance=tol))
        assert float(np.max(np.abs(back - a))) <= tol


def test_rate_mode_error_monotone():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(32, 32))
    errs = [
        float(np.max(np.abs(decompress_zfp(compress_zfp(a, rate=r)) - a)))
        for r in (4, 8, 16, 32)
    ]
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < 1e-6


def test_precision_mode_and_dims():
    rng = np.random.default_rng(2)
    for shape in ((63,), (9, 14), (5, 6, 7)):
        a = rng.normal(size=shape)
        back = decompress_zfp(compress_zfp(a, precision=48))
        assert back.shape == a.shape
        assert float(np.max(np.abs(back - a))) < 1e-9


def test_zero_blocks_one_bit():
    """All-zero blocks cost one bit each in variable-rate modes."""
    z = np.zeros((64, 64))
    buf = compress_zfp(z, tolerance=1e-12)
    # 96 header bits + 256 one-bit blocks = 352 bits -> 6 words
    assert len(buf) == 48
    assert np.all(decompress_zfp(buf) == 0)


def test_values_below_tolerance_flush_to_zero():
    a = np.full((8, 8), 1e-9)
    back = decompress_zfp(compress_zfp(a, tolerance=1e-3))
    assert np.all(back == 0)


def test_float32_roundtrip_and_dtype():
    rng = np.random.default_rng(5)
    a = (rng.normal(size=(11, 13)) * 50).astype("float32")
    back = decompress_zfp(compress_zfp(a, tolerance=1e-3))
    assert back.dtype == np.dtype("float32")
    assert float(np.max(np.abs(back.astype("f8") - a.astype("f8")))) <= 1e-3


def test_partial_block_padding_no_bleed():
    """Edge blocks pad by the spec's replication rule; padding must not
    corrupt the valid region on the way back."""
    a = np.arange(5 * 7, dtype="float64").reshape(5, 7)
    back = decompress_zfp(compress_zfp(a, tolerance=1e-9))
    np.testing.assert_allclose(back, a, atol=1e-9)


@given(
    st.integers(1, 3),
    st.integers(0, 2**32 - 1),
    st.sampled_from(["float32", "float64"]),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(ndim, seed, dtype):
    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in rng.integers(1, 11, ndim))
    scale = float(rng.choice([1e-6, 1.0, 1e6]))
    a = (rng.normal(size=shape) * scale).astype(dtype)
    tol = scale * 1e-3
    back = decompress_zfp(compress_zfp(a, tolerance=tol))
    assert back.shape == a.shape and back.dtype == a.dtype
    assert float(np.max(np.abs(back.astype("f8") - a.astype("f8")))) <= tol


def test_gates_are_named():
    with pytest.raises(NotImplementedError, match="float32/float64"):
        compress_zfp(np.zeros((4, 4), dtype="int32"), rate=8)
    with pytest.raises(NotImplementedError, match="1-3 dimensional"):
        compress_zfp(np.zeros((2, 2, 2, 2)), rate=8)
    with pytest.raises(ValueError, match="exactly one"):
        compress_zfp(np.zeros((4, 4)), rate=8, precision=10)


def test_nan_inf_refused_loudly():
    """A NaN anywhere in a 4^d block would silently zero every finite
    neighbor (the geoscience NaN-fill pattern corrupting wholesale);
    Inf would crash mid-encode. Both are refused with the remedy
    named (r11 review finding)."""
    a = np.arange(64, dtype="float64").reshape(8, 8)
    a[0, 0] = np.nan
    with pytest.raises(ValueError, match="NaN/Inf"):
        compress_zfp(a, tolerance=1e-9)
    a[0, 0] = np.inf
    with pytest.raises(ValueError, match="NaN/Inf"):
        compress_zfp(a, rate=8)


def test_rate_beyond_short_header_refused():
    """A fixed rate needing >2048 bits/block (expert-mode territory)
    raises instead of silently degrading the requested fidelity
    (r11 review finding)."""
    a = np.zeros((4, 4, 4), dtype="float64")
    assert len(compress_zfp(a, rate=32)) > 0  # 2048 exactly: fine
    with pytest.raises(NotImplementedError, match="expert"):
        compress_zfp(a, rate=48)


# ---------------------------------------------------------------------------
# reversible (lossless) mode — r11 verdict ask #4
# ---------------------------------------------------------------------------


def _bits(a: np.ndarray) -> np.ndarray:
    return a.view(np.uint64 if a.dtype == np.float64 else np.uint32)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize(
    "shape", [(7,), (4,), (6, 5), (4, 4), (3, 5, 7), (4, 4, 4)]
)
def test_reversible_bit_exact_roundtrip(dtype, shape):
    """Bit-pattern equality (not just value equality) across dtypes and
    1-3D shapes, including partial edge blocks."""
    rng = np.random.default_rng(hash((dtype, shape)) % 2**31)
    a = (rng.normal(size=shape) * 10.0 ** rng.integers(-3, 4, size=shape)).astype(dtype)
    buf = compress_zfp(a, reversible=True)
    b = decompress_zfp(buf)
    assert b.dtype == a.dtype and b.shape == a.shape
    np.testing.assert_array_equal(_bits(b), _bits(a))
    h = zfp_read_header(buf)
    assert h.reversible and h.minexp == ZFP_MIN_EXP - 1


def test_reversible_hostile_bit_patterns():
    """Values that defeat the block-floating-point attempt (mixed
    magnitudes whose small members lose bits under a shared exponent),
    subnormals, negative zero, NaN payloads and infinities — all must
    reproduce exactly through the reinterpret fallback."""
    cases = [
        np.array([1e300, 1e-300, -1.0, 3.14], dtype="float64"),
        np.array([6.5e-10, 1.0, -2.0**-149, 2.0**-127], dtype="float32"),
        np.array([-0.0, 0.0, -0.0, 0.0], dtype="float64"),
        np.frombuffer(
            np.array([0x7FF8000000000001, 0xFFF0000000000000,
                      0x7FF0000000000000, 0x0000000000000001],
                     dtype=np.uint64).tobytes(), dtype="float64",
        ),  # NaN w/ payload, -Inf, +Inf, smallest subnormal
        np.linspace(-1, 1, 17, dtype="float32"),  # BFP-friendly + edge block
    ]
    for a in cases:
        b = decompress_zfp(compress_zfp(a, reversible=True))
        np.testing.assert_array_equal(_bits(b), _bits(a))


def test_reversible_all_zero_and_negzero_blocks():
    z = np.zeros((8, 8), dtype="float32")
    buf = compress_zfp(z, reversible=True)
    np.testing.assert_array_equal(_bits(decompress_zfp(buf)), _bits(z))
    # a +0.0 array compresses to ~1 bit/block
    assert len(buf) <= 8 * 4  # header + 4 blocks x 1 bit, word-padded
    nz = z.copy()
    nz[3, 3] = -0.0  # bit pattern nonzero: must NOT take the zero path
    np.testing.assert_array_equal(
        _bits(decompress_zfp(compress_zfp(nz, reversible=True))), _bits(nz)
    )


def test_reversible_compresses_smooth_data():
    """Smooth integer-valued fields take the lossless BFP path and the
    Lorenzo+plane coder actually compresses them (trailing-zero-plane
    skip doing its job)."""
    a = np.add.outer(np.arange(16.0), np.arange(16.0))
    buf = compress_zfp(a, reversible=True)
    assert len(buf) < a.nbytes / 2
    np.testing.assert_array_equal(decompress_zfp(buf), a)


def test_reversible_header_fuzz():
    """Truncations and corruptions of a reversible stream raise (or
    return wrong-but-bounded data) — never hang or over-read."""
    a = np.arange(48, dtype="float32").reshape(6, 8) / 7.0
    buf = compress_zfp(a, reversible=True)
    for cut in (0, 3, 7, 11, 15, len(buf) // 2):
        try:
            decompress_zfp(buf[:cut])
        except (ValueError, NotImplementedError):
            pass
    bad = bytearray(buf)
    bad[0] ^= 0xFF  # magic
    with pytest.raises(ValueError, match="magic"):
        decompress_zfp(bytes(bad))
    # a long-form mode word that is NOT reversible gates by name: the
    # minexp field starts at bit 39 of the long word = stream bit 135
    # (header is 96 bits + 39); setting it to 1 decodes as the lossy
    # expert minexp == ZFP_MIN_EXP
    lossy = bytearray(buf)
    lossy[135 // 8] ^= 1 << (135 % 8)
    with pytest.raises(NotImplementedError, match="expert-mode"):
        decompress_zfp(bytes(lossy))


def test_reversible_excludes_lossy_params():
    with pytest.raises(ValueError, match="excludes"):
        compress_zfp(np.zeros(4), reversible=True, rate=8.0)


@given(
    st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=20),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_reversible_any_bit_pattern_roundtrips(words, is64):
    """EVERY bit pattern — including NaN payloads, infinities,
    subnormals and trap representations — must survive reversible
    compression exactly (the property that defines the mode)."""
    if is64:
        a = np.array(words, dtype=np.uint64).view(np.float64)
    else:
        a = np.array(
            [w & 0xFFFFFFFF for w in words], dtype=np.uint32
        ).view(np.float32)
    b = decompress_zfp(compress_zfp(a, reversible=True))
    np.testing.assert_array_equal(_bits(b), _bits(a))
