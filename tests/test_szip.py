"""szip codec (CCSDS 121.0-B extended Rice — the HDF5 szip filter).

Hand-built vectors are derived from the public format description
(option-ID table, fundamental-sequence codewords, zero-block/ROS,
second-extension pairing, NN predictor + standard mapper), independent
of the Python implementation.
"""

from __future__ import annotations

import numpy as np
import pytest

from pangeo_forge_recipes_spark import szip as S

EC = S.SZ_EC_OPTION_MASK | S.SZ_LSB_OPTION_MASK
NN = S.SZ_NN_OPTION_MASK | S.SZ_LSB_OPTION_MASK


def test_hand_vectors_8bit():
    # all-zero block: id 000, zero-block bit 0, FS(0)='1' -> 00001... = 0x08
    assert S.szip_compress(bytes(8), EC, 8, 8, 8) == bytes([0x08])
    # k=0 fundamental sequence: id 001, FS(3,0,1,2) -> 0x23 0x48
    assert S.szip_compress(bytes([3, 0, 1, 2]), EC, 8, 4, 4) == bytes(
        [0x23, 0x48]
    )
    # second extension: id 000, SE bit 1, gammas FS(1)FS(0) -> 0x16
    assert S.szip_compress(bytes([1, 0, 0, 0]), EC, 8, 4, 4) == bytes([0x16])
    # uncompressed: id 111 then raw 8-bit samples
    assert S.szip_compress(bytes([255, 0, 255, 0]), EC, 8, 4, 4) == bytes(
        [0xFF, 0xE0, 0x1F, 0xE0, 0x00]
    )
    # zero-run to end of a 10-block segment: ROS codeword FS(4)
    assert S.szip_compress(bytes(20), EC, 8, 2, 20) == bytes([0x00, 0x80])


def test_hand_vector_nn_reference():
    # constant scanline [5,5,5,5]: raw reference 5 then mapped zeros;
    # k=0: id 001, FS(5,0,0,0) -> 0x20 0xF0
    assert S.szip_compress(bytes([5] * 4), NN, 8, 4, 4) == bytes([0x20, 0xF0])


def test_hand_vector_16bit_id_width():
    # 16-bit samples use a 4-bit option ID: id 0001, FS(1)FS(0) -> 0x16
    data = np.array([1, 0], dtype="<u2").tobytes()
    assert S.szip_compress(data, EC, 16, 2, 2) == bytes([0x16])


def test_decode_matches_hand_streams():
    # decode the hand-built streams back (independent direction)
    assert S.szip_decompress(bytes([0x08]), 8, EC, 8, 8, 8) == bytes(8)
    assert S.szip_decompress(bytes([0x23, 0x48]), 4, EC, 8, 4, 4) == bytes(
        [3, 0, 1, 2]
    )
    assert S.szip_decompress(bytes([0x16]), 4, EC, 8, 4, 4) == bytes(
        [1, 0, 0, 0]
    )
    assert S.szip_decompress(bytes([0x20, 0xF0]), 4, NN, 8, 4, 4) == bytes(
        [5] * 4
    )
    assert S.szip_decompress(bytes([0x00, 0x80]), 20, EC, 8, 2, 20) == bytes(20)


@pytest.mark.parametrize("bpp,dt", [(8, "u1"), (16, "<u2"), (32, "<u4")])
@pytest.mark.parametrize(
    "mask", [EC, NN, NN | S.SZ_ALLOW_K13_OPTION_MASK]
)
def test_round_trip_random(bpp, dt, mask):
    rng = np.random.RandomState(bpp + mask)
    data = rng.randint(0, 1 << min(bpp, 31), 997).astype(dt).tobytes()
    enc = S.szip_compress(data, mask, bpp, 16, 64)
    assert S.szip_decompress(enc, 997, mask, bpp, 16, 64) == data


def test_round_trip_msb_order():
    rng = np.random.RandomState(3)
    data = rng.randint(0, 1 << 16, 500).astype(">u2").tobytes()
    mask = S.SZ_NN_OPTION_MASK | S.SZ_MSB_OPTION_MASK
    enc = S.szip_compress(data, mask, 16, 8, 32)
    assert S.szip_decompress(enc, 500, mask, 16, 8, 32) == data


def test_smooth_data_compresses():
    rng = np.random.RandomState(7)
    smooth = (np.cumsum(rng.randint(-3, 4, 5000)) + 5000).astype("<u2")
    enc = S.szip_compress(smooth.tobytes(), NN, 16, 16, 128)
    assert len(enc) < 0.4 * smooth.nbytes  # NN + Rice beats raw by >2.5x
    assert S.szip_decompress(enc, 5000, NN, 16, 16, 128) == smooth.tobytes()


def test_partial_scanline_and_block():
    # 23 samples, scanline 10, block 4: two full scanlines (blocks of
    # 4,4,2->padded) plus a 3-sample final scanline
    data = bytes(range(23))
    enc = S.szip_compress(data, NN, 8, 4, 10)
    assert S.szip_decompress(enc, 23, NN, 8, 4, 10) == data


def test_64bit_gate():
    with pytest.raises(NotImplementedError, match="32"):
        S.szip_compress(bytes(16), EC, 64, 8, 8)


def test_hdf5_szip_round_trip(tmp_path):
    """write_hdf5(compress='szip') produces a filter-4 pipeline that the
    scanner + virtual-store decode reads back exactly."""
    from pangeo_forge_recipes_spark.hdf5io import read_hdf5, write_hdf5
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable, assert_equal

    rng = np.random.RandomState(5)
    smooth = np.cumsum(rng.randint(-2, 3, (6, 40)), axis=1).astype("int32")
    ds = NDDataset(
        {"v": Variable(("t", "x"), smooth)},
        {"t": Variable(("t",), np.arange(6, dtype="int32")),
         "x": Variable(("x",), np.arange(40, dtype="int32"))},
        {"title": "szip fixture"},
        {"t": 6, "x": 40},
    )
    path = str(tmp_path / "sz.h5")
    write_hdf5(path, ds, chunks={"t": 3}, compress="szip")
    got = read_hdf5(path)
    assert_equal(got, ds)


def test_hdf5_szip_float32(tmp_path):
    from pangeo_forge_recipes_spark.hdf5io import read_hdf5, write_hdf5
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable, assert_equal

    rng = np.random.RandomState(9)
    vals = rng.standard_normal((4, 16)).astype("float32")
    ds = NDDataset(
        {"f": Variable(("a", "b"), vals)},
        {},
        {},
        {"a": 4, "b": 16},
    )
    path = str(tmp_path / "szf.h5")
    write_hdf5(path, ds, chunks={"a": 2}, compress="szip")
    got = read_hdf5(path)
    assert_equal(got, ds)


def test_hdf5_szip_scalar_and_tiny_vars_fall_back(tmp_path):
    """szip cannot code fewer points than one block; scalar / tiny
    variables must fall back to contiguous storage instead of crashing
    (and the encoded-scalar chunk grid must stay valid — a 0-d variable
    stores as shape (1,))."""
    from pangeo_forge_recipes_spark.hdf5io import read_hdf5, write_hdf5
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable

    ds = NDDataset(
        {
            "v": Variable(("x",), np.cumsum(np.arange(40)).astype("int32")),
            "tiny": Variable(("y",), np.arange(3, dtype="int32")),
            "s": Variable((), np.int32(7)),
        },
        {},
        {},
        {"x": 40, "y": 3},
    )
    for comp in (False, True, "lzf", "szip"):
        path = str(tmp_path / f"sc_{comp}.h5")
        write_hdf5(path, ds, compress=comp)
        got = read_hdf5(path)
        np.testing.assert_array_equal(
            got.data_vars["v"].data, ds.data_vars["v"].data
        )
        np.testing.assert_array_equal(got.data_vars["tiny"].data, [0, 1, 2])
        assert int(np.ravel(got.data_vars["s"].data)[0]) == 7


def test_hdf5_szip_64bit_vars_fall_back(tmp_path):
    """szip tops out at 32 bits per pixel (H5Zszip's can_apply); a
    typical dataset — float64 variable + int64 coord (the engine's
    default dtypes and CF-encoded datetimes) — must write via fallback
    storage instead of raising."""
    from pangeo_forge_recipes_spark.hdf5io import read_hdf5, write_hdf5
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable, assert_equal

    rng = np.random.RandomState(3)
    ds = NDDataset(
        {"v": Variable(("t", "x"), rng.standard_normal((6, 40)))},  # f8
        {"t": Variable(("t",), np.arange(6, dtype="int64")),
         "x": Variable(("x",), np.arange(40, dtype="int64"))},
        {},
        {"t": 6, "x": 40},
    )
    path = str(tmp_path / "sz64.h5")
    write_hdf5(path, ds, chunks={"t": 3}, compress="szip")
    got = read_hdf5(path)
    assert_equal(got, ds)
    # 32-bit data in the same file still szip-compresses (filter id 4)
    ds32 = NDDataset(
        {"w": Variable(("x",), np.cumsum(np.arange(64)).astype("int32"))},
        {},
        {},
        {"x": 64},
    )
    p32 = str(tmp_path / "sz32.h5")
    write_hdf5(p32, ds32, compress="szip")
    np.testing.assert_array_equal(
        read_hdf5(p32).data_vars["w"].data, ds32.data_vars["w"].data
    )
