"""JPEG2000 codec (jp2kio) tests: MQ coder, 5/3 DWT, tag trees, full
codestream round-trips, and the GRIB2 5.40 integration."""

from __future__ import annotations

import numpy as np
import pytest

from pangeo_forge_recipes_spark import jp2kio as J


# ---------------------------------------------------------------------------
# MQ coder
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mq_roundtrip_random(seed):
    rng = np.random.RandomState(seed)
    n = 5000
    ctxs = rng.randint(0, J.N_CTX, size=n)
    # biased bits exercise both MPS and LPS paths
    bits = (rng.rand(n) < 0.2).astype(int)
    enc = J.MQEncoder()
    for b, cx in zip(bits, ctxs):
        enc.encode(int(b), int(cx))
    data = enc.flush()
    dec = J.MQDecoder(data)
    out = [dec.decode(int(cx)) for cx in ctxs]
    assert out == list(bits)


def test_mq_roundtrip_constant_and_alternating():
    for pattern in ([0] * 200, [1] * 200, [0, 1] * 100):
        enc = J.MQEncoder()
        for b in pattern:
            enc.encode(b, 0)
        dec = J.MQDecoder(enc.flush())
        assert [dec.decode(0) for _ in pattern] == pattern


def test_mq_table_invariants():
    assert len(J._MQ_TABLE) == 47
    for i, (qe, nmps, nlps, switch) in enumerate(J._MQ_TABLE):
        assert 0 < qe <= 0x5601
        assert 0 <= nmps < 47 and 0 <= nlps < 47
        assert switch in (0, 1)
    # switch only on the four entry states of each chain
    assert [i for i, r in enumerate(J._MQ_TABLE) if r[3]] == [0, 6, 14]


# ---------------------------------------------------------------------------
# 5/3 DWT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", list(range(1, 18)) + [33, 64, 65])
def test_dwt53_1d_perfect_reconstruction(n):
    rng = np.random.RandomState(n)
    x = rng.randint(-1000, 1000, size=n).astype(np.int64)
    lo, hi = J._fwd53_1d(x, 0)
    assert lo.shape[0] == (n + 1) // 2 and hi.shape[0] == n // 2
    back = J._inv53_1d(lo, hi, 0)
    np.testing.assert_array_equal(back, x)


def test_dwt53_known_values():
    # constant signal: high band exactly zero, low band equals signal
    x = np.full(10, 7, dtype=np.int64)
    lo, hi = J._fwd53_1d(x, 0)
    np.testing.assert_array_equal(hi, 0)
    np.testing.assert_array_equal(lo, 7)
    # linear ramp: 5/3 high-pass annihilates linears (interior)
    x = np.arange(0, 40, 2, dtype=np.int64)
    lo, hi = J._fwd53_1d(x, 0)
    np.testing.assert_array_equal(hi[:-1], 0)


@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (7, 1), (5, 6), (16, 16), (13, 17)])
def test_dwt53_2d_perfect_reconstruction(shape):
    rng = np.random.RandomState(shape[0] * 100 + shape[1])
    x = rng.randint(-5000, 5000, size=shape).astype(np.int64)
    ll, hl, lh, hh = J._fwd53_2d(x)
    back = J._inv53_2d(ll, hl, lh, hh)
    np.testing.assert_array_equal(back, x)


# ---------------------------------------------------------------------------
# tag trees
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h,seed", [(1, 1, 0), (3, 2, 1), (4, 4, 2), (7, 5, 3)])
def test_tagtree_roundtrip(w, h, seed):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 6, size=(h, w))
    enc = J._TagTree(w, h)
    enc.set_values(vals)
    bw = J._HdrWriter()
    # encode each leaf fully (thresholds up to value+1, like the zero-
    # bitplane tree in a packet header)
    for i in range(h):
        for j in range(w):
            enc.encode(bw, i, j, int(vals[i, j]) + 1)
    data = bw.flush()
    dec = J._TagTree(w, h)
    br = J._HdrReader(data, 0)
    for i in range(h):
        for j in range(w):
            t = 1
            while True:
                got = dec.decode(br, i, j, t)
                if got is not None:
                    break
                t += 1
            assert got == vals[i, j]


def test_hdr_bit_stuffing():
    # a run of 1-bits creating 0xFF bytes must round-trip through the
    # 7-bit post-FF rule
    bits = [1] * 30 + [0, 1, 0] + [1] * 16
    bw = J._HdrWriter()
    for b in bits:
        bw.bit(b)
    data = bw.flush()
    assert 0xFF in data  # the stuffing path actually triggered
    br = J._HdrReader(data, 0)
    assert [br.bit() for _ in bits] == bits


# ---------------------------------------------------------------------------
# full codestream round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,depth,levels",
    [
        ((8, 8), 8, 1),
        ((16, 16), 8, 2),
        ((13, 17), 10, 3),
        ((1, 40), 8, 2),
        ((40, 1), 8, 2),
        ((5, 5), 4, 0),
        ((70, 70), 12, 5),
        ((3, 3), 16, 1),
    ],
)
def test_j2k_roundtrip_random(shape, depth, levels):
    rng = np.random.RandomState(depth * 100 + shape[0])
    img = rng.randint(0, 1 << depth, size=shape).astype(np.int64)
    data = J.encode_j2k(img, depth=depth, levels=levels)
    assert data[:2] == b"\xff\x4f" and data[-2:] == b"\xff\xd9"
    out, d, signed = J.decode_j2k(data)
    assert d == depth and not signed
    np.testing.assert_array_equal(out, img)


def test_j2k_roundtrip_smooth_field():
    # NWP-like smooth field: compresses well and must stay bit-exact
    y, x = np.mgrid[0:50, 0:60]
    img = (1000 + 400 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.int64)
    data = J.encode_j2k(img, depth=11, levels=4)
    out, _, _ = J.decode_j2k(data)
    np.testing.assert_array_equal(out, img)
    assert len(data) < img.size * 2  # actually compresses vs 11-bit raw


def test_j2k_roundtrip_constant_and_zero():
    img = np.zeros((20, 20), dtype=np.int64)
    out, _, _ = J.decode_j2k(J.encode_j2k(img, depth=8, levels=2))
    np.testing.assert_array_equal(out, img)
    img = np.full((20, 20), 255, dtype=np.int64)
    out, _, _ = J.decode_j2k(J.encode_j2k(img, depth=8, levels=2))
    np.testing.assert_array_equal(out, img)


def test_j2k_multiple_codeblocks():
    # force several code-blocks per subband with a small cblk size
    rng = np.random.RandomState(4)
    img = rng.randint(0, 4096, size=(70, 90)).astype(np.int64)
    data = J.encode_j2k(img, depth=12, levels=2, cblk_exp=4)
    out, _, _ = J.decode_j2k(data)
    np.testing.assert_array_equal(out, img)


def test_j2k_rejects_unsupported():
    with pytest.raises(ValueError, match="SOC"):
        J.decode_j2k(b"\x00\x01\x02\x03")


def test_multimodal_decode_image_j2k(spark):
    """decode_image sniffs raw J2K codestreams and really decodes them."""
    from pangeo_forge_recipes_spark.jp2kio import encode_j2k
    from pangeo_forge_recipes_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(8)
    imgs = {i: rng.randint(0, 256, size=(6, 5)).astype(np.int64) for i in range(3)}
    rows = [(i, bytearray(encode_j2k(im, depth=8, levels=1))) for i, im in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r["pixels"] for r in decode_image(df).collect()}
    for i, im in imgs.items():
        np.testing.assert_allclose(
            np.array(out[i]), im.ravel() / 255.0, atol=1e-6
        )


def test_jp2_container_unwrap():
    """decode_j2k accepts JP2 box containers (signature + ftyp + jp2h +
    jp2c) as well as raw codestreams."""
    import struct as _struct

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, size=(9, 7)).astype(np.int64)
    stream = J.encode_j2k(img, depth=8, levels=1)

    def box(btype: bytes, payload: bytes) -> bytes:
        return _struct.pack(">I", 8 + len(payload)) + btype + payload

    jp2 = (
        b"\x00\x00\x00\x0cjP  \r\n\x87\n"
        + box(b"ftyp", b"jp2 \x00\x00\x00\x00jp2 ")
        + box(b"jp2h", box(b"ihdr", b"\x00" * 14))
        + box(b"jp2c", stream)
    )
    out, depth, signed = J.decode_j2k(jp2)
    assert depth == 8 and not signed
    np.testing.assert_array_equal(out, img)
    # container with no codestream box
    with pytest.raises(ValueError, match="jp2c"):
        J.decode_j2k(b"\x00\x00\x00\x0cjP  \r\n\x87\n" + box(b"ftyp", b"x"))


# ---------------------------------------------------------------------------
# 9/7 irreversible (lossy) path
# ---------------------------------------------------------------------------

# ITU-T T.800 Table F.4 normative 9/7 analysis filter taps — the ground
# truth that pins the lifting constants AND the scaling convention
# (lowpass x 1/K, highpass x K) independently of the implementation.
_T800_LO = {0: 0.602949018236, 1: 0.266864118443, 2: -0.078223266529,
            3: -0.016864118443, 4: 0.026748757411}
_T800_HI = {0: 1.115087052457, 1: -0.591271763114, 2: -0.057543526229,
            3: 0.091271763114}


def _sym(x, i):
    n = len(x)
    while i < 0 or i >= n:
        if i < 0:
            i = -i
        if i >= n:
            i = 2 * (n - 1) - i
    return x[i]


@pytest.mark.parametrize("n", [2, 3, 7, 16, 33])
def test_97_lifting_matches_published_taps(n):
    rng = np.random.RandomState(n)
    x = rng.standard_normal(n)
    conv_lo = np.array(
        [sum(_T800_LO[abs(k)] * _sym(x, 2 * m + k) for k in range(-4, 5))
         for m in range((n + 1) // 2)])
    conv_hi = np.array(
        [sum(_T800_HI[abs(k)] * _sym(x, 2 * m + 1 + k) for k in range(-3, 4))
         for m in range(n // 2)])
    lo, hi = J._fwd97_1d(x, 0)
    np.testing.assert_allclose(lo, conv_lo, atol=1e-10)
    np.testing.assert_allclose(hi, conv_hi, atol=1e-10)
    np.testing.assert_allclose(J._inv97_1d(lo, hi, 0), x, atol=1e-10)


def _smooth_img(shape, depth, seed):
    rng = np.random.RandomState(seed)
    img = np.cumsum(np.cumsum(rng.randint(-2, 3, shape), 0), 1)
    return (img + (1 << (depth - 1))).clip(0, (1 << depth) - 1).astype(np.int64)


def test_lossy_round_trip_fine_step():
    img = _smooth_img((37, 53), 10, 2)
    enc = J.encode_j2k(img, depth=10, levels=3, irreversible=True, qstep=1 / 512)
    dec, depth, signed = J.decode_j2k(enc)
    assert depth == 10 and not signed
    assert np.abs(dec - img).max() <= 1  # within quantization tolerance


def test_lossy_round_trip_coarse_step_compresses():
    img = _smooth_img((64, 64), 10, 3)
    fine = J.encode_j2k(img, depth=10, levels=3, irreversible=True, qstep=1 / 512)
    coarse = J.encode_j2k(img, depth=10, levels=3, irreversible=True, qstep=0.5)
    dec, _, _ = J.decode_j2k(coarse)
    assert np.abs(dec - img).max() <= 4
    assert len(coarse) < 0.6 * len(fine)  # coarser step buys real size


def test_lossy_signed_component():
    img = _smooth_img((20, 31), 9, 4) - 256
    enc = J.encode_j2k(img, depth=9, levels=2, signed=True,
                       irreversible=True, qstep=1 / 256)
    dec, depth, signed = J.decode_j2k(enc)
    assert signed
    assert np.abs(dec - img).max() <= 1


def test_qcd_derived_style_decodes():
    """Scalar-derived quantization (QCD style 1): single (ε0, μ0) entry,
    per-band ε derived via T.800 Eq E-5.  Built by encoding with the
    derived ε pattern forced per band, then splicing the QCD marker down
    to its single-entry style-1 form — decode must be identical."""
    import struct as _struct

    img = _smooth_img((24, 24), 8, 5)
    levels = 2
    # derived pattern: ε_b = ε0 − NL + n_b, μ identical
    eps0, mant0 = 13, 512
    order = []  # encode-time iteration order: r asc, bands in band order
    for r in range(levels + 1):
        nb = levels if r == 0 else levels - r + 1
        nbands = 1 if r == 0 else 3
        order += [(eps0 - levels + nb, mant0)] * nbands
    seq = iter(order)
    real = J._step_to_eps_mant
    try:
        J._step_to_eps_mant = lambda step, depth, band: next(seq)
        enc = J.encode_j2k(img, depth=8, levels=levels, irreversible=True)
    finally:
        J._step_to_eps_mant = real
    base, _, _ = J.decode_j2k(enc)

    # splice: replace the expounded QCD with a style-1 single entry
    qcd_at = enc.find(b"\xff\x5c")
    assert qcd_at > 0
    (ln,) = _struct.unpack(">H", enc[qcd_at + 2 : qcd_at + 4])
    sqcd = enc[qcd_at + 4]
    guard = sqcd >> 5
    new_qcd = (
        b"\xff\x5c"
        + _struct.pack(">H", 2 + 1 + 2)
        + bytes([(guard << 5) | 0x01])
        + _struct.pack(">H", (eps0 << 11) | mant0)
    )
    spliced = enc[:qcd_at] + new_qcd + enc[qcd_at + 2 + ln :]
    derived, depth, signed = J.decode_j2k(spliced)
    np.testing.assert_array_equal(derived, base)


def test_lossless_path_unchanged_by_lossy_support():
    img = _smooth_img((18, 25), 12, 6)
    enc = J.encode_j2k(img, depth=12, levels=2)
    dec, _, _ = J.decode_j2k(enc)
    np.testing.assert_array_equal(dec, img)


# ---------------------------------------------------------------------------
# multi-tile codestreams
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("tile", [(16, 32), (13, 17), (45, 61)])
def test_tiled_lossless_round_trip(tile):
    img = _smooth_img((45, 61), 10, 7)
    enc = J.encode_j2k(img, depth=10, levels=3, tile_size=tile)
    dec, depth, signed = J.decode_j2k(enc)
    np.testing.assert_array_equal(dec, img)
    # the SIZ really declares the tile grid: SOC(2) + marker(2) + Lsiz(2)
    # + Rsiz(2) + Xsiz/Ysiz/XOsiz/YOsiz(16) -> XTsiz at byte 24
    import struct as _struct
    xt, yt = _struct.unpack(">II", enc[24:32])
    assert (yt, xt) == tile


def test_tiled_lossy_round_trip():
    img = _smooth_img((40, 40), 10, 8)
    enc = J.encode_j2k(img, depth=10, levels=2, irreversible=True,
                       qstep=1 / 512, tile_size=(20, 20))
    dec, _, _ = J.decode_j2k(enc)
    assert np.abs(dec - img).max() <= 1


def test_tiled_stream_missing_tile_raises():
    img = _smooth_img((32, 32), 8, 9)
    enc = J.encode_j2k(img, depth=8, levels=1, tile_size=(16, 16))
    # truncate after the second tile's body: drop the last SOT onward
    import struct as _struct
    pos = len(enc)
    # find the last SOT marker
    last_sot = enc.rfind(b"\xff\x90")
    trunc = enc[:last_sot] + _struct.pack(">H", 0xFFD9)
    with pytest.raises(ValueError):
        J.decode_j2k(trunc)


def test_lossy_decode_clamps_to_sample_range():
    """Quantization error on hard edges can overshoot the sample range;
    the decoder must clamp (conformant-codec behavior)."""
    rng = np.random.RandomState(0)
    img = (rng.randint(0, 2, (16, 16)) * 255).astype(np.int64)
    enc = J.encode_j2k(img, depth=8, levels=2, irreversible=True, qstep=2.0)
    dec, _, _ = J.decode_j2k(enc)
    assert dec.min() >= 0 and dec.max() <= 255
    simg = img - 128
    encs = J.encode_j2k(simg, depth=8, levels=2, signed=True,
                        irreversible=True, qstep=2.0)
    decs, _, signed = J.decode_j2k(encs)
    assert signed and decs.min() >= -128 and decs.max() <= 127
