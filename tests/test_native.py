"""Native host-ops: build, bindings, and parity with the Python fallbacks."""

import zlib

import numpy as np
import pytest

from paradis_tpu.data import native, zarrlite


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native host-ops unavailable (no g++/zlib)")
    return l


def test_build_produces_library(lib):
    assert native._LIB_PATH.exists()


def test_zlib_decode_many_parity(lib):
    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=(4, 6)).astype(np.float32) for _ in range(5)]
    blobs = [zlib.compress(c.tobytes(), 1) for c in chunks]
    blobs[2] = None  # missing chunk stays zero (pre-filled)
    out = native.zlib_decode_many(blobs, chunks[0].nbytes)
    got = out.view(np.float32).reshape(5, 4, 6)
    for i, c in enumerate(chunks):
        if i == 2:
            np.testing.assert_array_equal(got[i], 0.0)
        else:
            np.testing.assert_array_equal(got[i], c)


def test_zlib_decode_corrupt_raises(lib):
    with pytest.raises(ValueError):
        native.zlib_decode_many([b"not zlib data"], 16)


def test_zscore_parity(lib):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(7, 9, 12)).astype(np.float32)
    ref = data.copy()
    idx = np.asarray([0, 3, 11], np.int64)
    mean = np.asarray([1.0, -2.0, 0.5], np.float32)
    std = np.asarray([2.0, 0.5, 3.0], np.float32)
    assert native.zscore_normalize_inplace(data, idx, mean, std)
    ref[..., idx] = (ref[..., idx] - mean) / std
    np.testing.assert_allclose(data, ref, atol=1e-6)


def test_bitround_parity(lib):
    rng = np.random.default_rng(2)
    data = rng.normal(size=(64,)).astype(np.float32)
    ref = zarrlite._bitround(data.copy(), 8)
    nat = data.copy()
    assert native.bitround_inplace(nat, 8)
    np.testing.assert_array_equal(nat, ref)


def test_batched_store_read_uses_native(lib, tmp_path):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(6, 3, 4, 5)).astype(np.float32)
    arr = zarrlite.create_array(tmp_path / "a", shape=data.shape,
                                chunks=(1, 3, 4, 5), dtype=np.float32,
                                compressor={"id": "zlib", "level": 1}, data=data)
    got = arr.read_first_axis_batch(1, 5)
    np.testing.assert_array_equal(got, data[1:5])
    # uncompressed path too
    arr2 = zarrlite.create_array(tmp_path / "b", shape=data.shape,
                                 chunks=(1, 3, 4, 5), dtype=np.float32, data=data)
    np.testing.assert_array_equal(arr2.read_first_axis_batch(0, 6), data)
