"""Baseline JPEG codec: vectorized IDCT cross-checked against a
spec-literal scalar cosine sum (T.81 A.3.3), encoder output verified
structurally (markers, stuffing, restart cadence) and numerically
(round-trip error bounded by the quantization step)."""

from __future__ import annotations

import numpy as np
import pytest

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
    # lossless (SOF3): splice the marker into a valid stream
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(blob))


def test_odd_sizes():
    for shape in [(1, 1), (7, 9), (17, 13), (8, 1)]:
        img = np.arange(np.prod(shape), dtype=np.uint8).reshape(shape) % 200
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == shape
