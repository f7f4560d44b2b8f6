"""Baseline JPEG codec: vectorized IDCT cross-checked against a
spec-literal scalar cosine sum (T.81 A.3.3), encoder output verified
structurally (markers, stuffing, restart cadence) and numerically
(round-trip error bounded by the quantization step)."""

from __future__ import annotations

import numpy as np
import pytest

from pangeo_forge_recipes_spark import jpegio as J
from pangeo_forge_recipes_spark.jpegio import (
    ZIGZAG,
    _M,
    decode_jpeg,
    encode_jpeg,
    fdct_8x8,
    idct_8x8,
)


def _idct_spec_literal(F: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 verbatim: f(x,y) = 1/4 ΣΣ C(u)C(v) F(u,v) cos·cos."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def test_idct_matches_spec_literal():
    rng = np.random.RandomState(0)
    F = rng.uniform(-500, 500, (8, 8))
    np.testing.assert_allclose(idct_8x8(F), _idct_spec_literal(F), atol=1e-9)


def test_dct_orthonormal_and_inverse():
    assert np.allclose(_M @ _M.T, np.eye(8), atol=1e-12)
    rng = np.random.RandomState(1)
    f = rng.uniform(-128, 127, (8, 8))
    np.testing.assert_allclose(idct_8x8(fdct_8x8(f)), f, atol=1e-9)


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-checks: first diagonal and last entries
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_uniform_image_exact():
    for val in (0, 1, 127, 128, 254, 255):
        img = np.full((8, 8), val, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(out.astype(int) - val).max() <= 1


def test_gray_roundtrip_psnr():
    y, x = np.mgrid[0:40, 0:56]
    img = (128 + 100 * np.sin(x / 5.0) * np.cos(y / 7.0)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 40


@pytest.mark.parametrize("subsample", [False, True])
def test_rgb_roundtrip(subsample):
    y, x = np.mgrid[0:24, 0:33]  # non-multiple-of-16 dims
    rgb = np.stack(
        [
            128 + 60 * np.sin(x / 6.0),
            128 + 60 * np.cos(y / 8.0),
            128 + 50 * np.sin((x + y) / 9.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=subsample))
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.mean() < 3.0
    assert err.max() <= 16


def test_restart_intervals():
    y, x = np.mgrid[0:32, 0:48]
    img = ((x * 3 + y * 5) % 200 + 20).astype(np.uint8)
    blob = encode_jpeg(img, quality=92, restart_interval=3)
    # DRI segment present and RST markers on the wire
    assert b"\xff\xdd\x00\x04\x00\x03" in blob
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    out = decode_jpeg(blob)
    base = decode_jpeg(encode_jpeg(img, quality=92))
    np.testing.assert_array_equal(out, base)


def test_byte_stuffing_roundtrip():
    # high-entropy image makes 0xFF bytes in the entropy stream likely
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    blob = encode_jpeg(img, quality=50)
    out = decode_jpeg(blob)
    assert out.shape == img.shape  # lossy, but structurally sound
    # re-encode of decode stays close (codec is stable)
    out2 = decode_jpeg(encode_jpeg(out, quality=50))
    assert np.abs(out2.astype(int) - out.astype(int)).mean() < 20


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_decodes_identically_to_baseline(subsample):
    """The strongest entropy-layer check: a progressive encoding of the
    same coefficients must decode bit-identically to the baseline one —
    any DC/AC first-pass, refinement, EOB-run, or ZRL bug breaks it."""
    rng = np.random.RandomState(3)
    y, x = np.mgrid[0:40, 0:56]
    rgb = np.stack(
        [
            128 + 60 * np.sin(x / 6.0),
            128 + 60 * np.cos(y / 8.0),
            rng.randint(0, 256, (40, 56)),  # noisy channel → dense AC
        ],
        axis=-1,
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(rgb, quality=85, subsample=subsample))
    prog = decode_jpeg(encode_jpeg(rgb, quality=85, subsample=subsample, progressive=True))
    np.testing.assert_array_equal(base, prog)


def test_progressive_structure():
    blob = encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8), progressive=True)
    assert b"\xff\xc2" in blob  # SOF2
    assert blob.count(b"\xff\xda") == 4  # DC first + DC refine + AC first + AC refine
    assert b"\xff\xc0" not in blob


def test_progressive_noise_and_odd_sizes():
    rng = np.random.RandomState(9)
    for shape in [(8, 8), (17, 13), (24, 33)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        b = decode_jpeg(encode_jpeg(img, quality=50))
        p = decode_jpeg(encode_jpeg(img, quality=50, progressive=True))
        np.testing.assert_array_equal(b, p)


def test_gates():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # hierarchical (SOF5): splice the marker into a valid stream
    # (SOF3 lossless, formerly the example here, now decodes natively)
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="SOF5"):
        decode_jpeg(bytes(blob))


def test_odd_sizes():
    for shape in [(1, 1), (7, 9), (17, 13), (8, 1)]:
        img = np.arange(np.prod(shape), dtype=np.uint8).reshape(shape) % 200
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == shape


# ---------------------------------------------------------------------------
# 12-bit precision + lossless (SOF3)
# ---------------------------------------------------------------------------


def test_12bit_sequential_round_trip():
    rng = np.random.RandomState(0)
    img = (np.cumsum(np.cumsum(rng.randint(-9, 10, (33, 41)), 0), 1) + 2048
           ).clip(0, 4095).astype(np.uint16)
    enc = J.encode_jpeg(img, quality=95, precision=12)
    dec = J.decode_jpeg(enc)
    assert dec.dtype == np.uint16 and dec.shape == img.shape
    # quantization-bounded error, scaled like the 8-bit case
    assert np.abs(dec.astype(int) - img.astype(int)).max() < 64
    # the stream is extended-sequential SOF1
    assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc


def test_12bit_progressive_equals_sequential():
    rng = np.random.RandomState(1)
    img = (np.cumsum(rng.randint(-5, 6, (16, 24)), 1) + 2048
           ).clip(0, 4095).astype(np.uint16)
    seq = J.decode_jpeg(J.encode_jpeg(img, quality=90, precision=12))
    prog = J.decode_jpeg(
        J.encode_jpeg(img, quality=90, precision=12, progressive=True)
    )
    np.testing.assert_array_equal(seq, prog)


def test_12bit_color_round_trip():
    rng = np.random.RandomState(2)
    base = (np.cumsum(rng.randint(-4, 5, (20, 20)), 0) + 2048
            ).clip(0, 4095).astype(np.uint16)
    rgb = np.stack([base, 4095 - base, base // 2], axis=-1).astype(np.uint16)
    dec = J.decode_jpeg(J.encode_jpeg(rgb, quality=95, precision=12))
    assert dec.dtype == np.uint16 and dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 64


def test_baseline_rejects_12bit():
    with pytest.raises(ValueError, match="12-bit|uint16"):
        J.encode_jpeg(np.zeros((8, 8), np.uint8), precision=12)


@pytest.mark.parametrize("pred", list(range(1, 8)))
def test_lossless_every_predictor_exact(pred):
    rng = np.random.RandomState(pred)
    img = rng.randint(0, 256, (21, 17), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_lossless(img, predictor=pred))
    np.testing.assert_array_equal(dec, img)


def test_lossless_16bit_and_12bit():
    rng = np.random.RandomState(9)
    img16 = rng.randint(0, 65536, (15, 23), dtype=np.uint16)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(img16, predictor=4)), img16
    )
    img12 = rng.randint(0, 4096, (9, 9)).astype(np.uint16)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(img12, precision=12, predictor=7)),
        img12,
    )


def test_lossless_multi_component_and_point_transform():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (11, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(rgb)), rgb
    )
    img = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_lossless(img, point_transform=2))
    np.testing.assert_array_equal(dec, (img >> 2) << 2)


def test_lossless_hand_built_stream():
    """Hand-assembled SOF3 stream (T.81 Annex H semantics, independent
    of the encoder): 2x2 8-bit plane, predictor 1, Huffman DC table with
    1-bit code for category 0 and 2-bit codes up to category 2.

    Samples [[130, 131], [128, 130]]:
      (0,0): default pred 128, diff +2  -> cat 2, bits '10'
      (0,1): first line, pred Ra=130, diff +1 -> cat 1, bit '1'
      (1,0): first column, pred Rb=130, diff -2 -> cat 2, bits '01'
      (1,1): pred Ra=128, diff +2 -> cat 2, bits '10'
    """
    import struct as _struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(payload) + 2) + payload

    # canonical table: bits=[1,2,0,...] huffval=[0,1,2]
    # -> cat0='0', cat1='10', cat2='11'
    dht = bytes([0x00]) + bytes([1, 2] + [0] * 14) + bytes([0, 1, 2])
    sof = _struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 1, 0, 0])  # 1 comp, predictor 1, pt 0
    # entropy bits: cat2 '11' + '10', cat1 '10' + '1', cat2 '11'+'01',
    # cat2 '11'+'10' -> 1110 1011 1011 110(pad 1)
    entropy = bytes([0b11101011, 0b10111101])
    stream = (
        b"\xff\xd8" + seg(0xC3, sof) + seg(0xC4, dht) + seg(0xDA, sos)
        + entropy + b"\xff\xd9"
    )
    dec = J.decode_jpeg(stream)
    np.testing.assert_array_equal(
        dec, np.array([[130, 131], [128, 130]], dtype=np.uint8)
    )
