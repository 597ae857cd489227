import json

import numpy as np
import pytest

from paradis_tpu.data import zarrlite


def test_array_roundtrip_zlib(tmp_path):
    data = np.random.default_rng(0).normal(size=(7, 5, 6)).astype(np.float32)
    arr = zarrlite.create_array(tmp_path / "a", shape=data.shape, chunks=(2, 5, 3),
                                dtype=np.float32, compressor={"id": "zlib", "level": 1},
                                data=data)
    got = zarrlite.Array(tmp_path / "a")[...]
    np.testing.assert_array_equal(got, data)


def test_array_partial_reads_and_writes(tmp_path):
    arr = zarrlite.create_array(tmp_path / "a", shape=(10, 8), chunks=(3, 4),
                                dtype=np.float64)
    arr[2:7, 1:6] = 5.0
    np.testing.assert_array_equal(arr[2:7, 1:6], 5.0)
    np.testing.assert_array_equal(arr[0:2], 0.0)  # fill value
    arr[9] = np.arange(8)
    np.testing.assert_array_equal(arr[9], np.arange(8))
    # int indexing squeezes
    assert arr[9, 3] == 3.0


def test_region_write_edge_chunks(tmp_path):
    """Shapes not divisible by chunks: edge chunks pad with fill."""
    arr = zarrlite.create_array(tmp_path / "a", shape=(5, 5), chunks=(2, 2),
                                dtype=np.int32)
    arr[...] = np.arange(25).reshape(5, 5)
    np.testing.assert_array_equal(arr[...], np.arange(25).reshape(5, 5))
    np.testing.assert_array_equal(arr[4, 3:], [23, 24])


def test_datetime_and_string_dtypes(tmp_path):
    t = np.datetime64("2020-01-01") + np.arange(5) * np.timedelta64(6, "h")
    arr = zarrlite.create_array(tmp_path / "t", shape=t.shape, dtype=t.dtype, data=t)
    np.testing.assert_array_equal(arr[...], t)
    names = np.array(["geopotential_h500", "t2m"])
    arr2 = zarrlite.create_array(tmp_path / "f", shape=names.shape, dtype=names.dtype,
                                 data=names)
    assert list(arr2[...]) == list(names)


def test_bitround_filter_lossy(tmp_path):
    data = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)
    arr = zarrlite.create_array(tmp_path / "b", shape=data.shape, dtype=np.float32,
                                compressor={"id": "zlib", "level": 1},
                                filters=[{"id": "bitround", "keepbits": 8}], data=data)
    got = arr[...]
    assert not np.array_equal(got, data)           # lossy
    np.testing.assert_allclose(got, data, rtol=3e-2)  # but close


def test_group_tree_and_attrs(tmp_path):
    g = zarrlite.create_group(tmp_path / "root")
    sub = g.create_group("stats")
    sub.create_array("mean", shape=(3,), dtype=np.float32, data=np.ones(3))
    g.attrs["hello"] = 1
    g.attrs.save()
    g.consolidate()

    g2 = zarrlite.open_store(tmp_path / "root")
    assert g2.attrs["hello"] == 1
    assert "stats" in g2
    np.testing.assert_array_equal(g2["stats"]["mean"][...], 1.0)
    meta = json.loads((tmp_path / "root" / ".zmetadata").read_text())
    assert meta["zarr_consolidated_format"] == 1
    assert "stats/mean/.zarray" in meta["metadata"]


def test_real_zarr_interop_if_available(tmp_path):
    """Stores we write should open with zarr-python when it exists."""
    zarr = pytest.importorskip("zarr")
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    zarrlite.create_array(tmp_path / "x", shape=data.shape, chunks=(2, 2),
                          dtype=np.float32, compressor={"id": "zlib", "level": 1},
                          data=data)
    z = zarr.open(str(tmp_path / "x"), mode="r")
    np.testing.assert_array_equal(np.asarray(z), data)


def test_array_dims_attr(tmp_path):
    arr = zarrlite.create_array(tmp_path / "d", shape=(2, 3), dtype=np.float32,
                                dims=("latitude", "longitude"))
    assert zarrlite.Array(tmp_path / "d").attrs["_ARRAY_DIMENSIONS"] == [
        "latitude", "longitude"]


def test_lq_codec_roundtrip_error_bound(tmp_path):
    """lq (LayerQuantizer equivalent): per-layer quantization error is
    bounded by half a quantization step of each layer's own range
    (reference codec: scripts/preprocess_dataset.py:11-15)."""
    rng = np.random.default_rng(1)
    # layers with wildly different scales — per-layer scaling must hold
    data = np.stack([
        rng.normal(0.0, 1.0, (8, 12)),
        rng.normal(5e4, 3e3, (8, 12)),
        rng.normal(-7e-3, 1e-4, (8, 12)),
    ]).astype(np.float32)[None]  # [1, F, H, W] like a training chunk
    for bits in (8, 16):
        comp = {"id": "lq", "bits": bits, "cname": "zstd", "clevel": 5,
                "shuffle": 1}
        arr = zarrlite.create_array(tmp_path / f"a{bits}", shape=data.shape,
                                    chunks=data.shape, dtype=np.float32,
                                    compressor=comp, data=data)
        got = zarrlite.Array(tmp_path / f"a{bits}")[...]
        step = (data.max(axis=(2, 3)) - data.min(axis=(2, 3))) / (2**bits - 1)
        # + fp32 reconstruction ulp: q*scale + lo rounds at ulp(|value|)
        ulp = np.spacing(np.abs(data).max(axis=(2, 3)).astype(np.float32))
        err = np.abs(got - data).max(axis=(2, 3))
        assert np.all(err <= step * 0.5 + 4 * ulp), (bits, err / step)


def test_lq_codec_constant_layer_and_size(tmp_path):
    data = np.concatenate([
        np.full((1, 16, 16), 3.25, np.float32),           # constant layer
        np.random.default_rng(2).normal(size=(4, 16, 16)).astype(np.float32),
    ])
    arr = zarrlite.create_array(tmp_path / "a", shape=data.shape,
                                chunks=data.shape, dtype=np.float32,
                                compressor={"id": "lq", "bits": 16}, data=data)
    got = zarrlite.Array(tmp_path / "a")[...]
    np.testing.assert_array_equal(got[0], data[0])  # scale=0 layer exact
    chunk = tmp_path / "a" / "0.0.0"
    assert chunk.stat().st_size < data.nbytes * 0.6  # lossy => smaller store


def test_lq_codec_rejects_nonfinite(tmp_path):
    bad = np.array([[1.0, np.nan], [0.0, 2.0]], np.float32)
    arr = zarrlite.create_array(tmp_path / "a", shape=bad.shape,
                                chunks=bad.shape, dtype=np.float32,
                                compressor={"id": "lq", "bits": 16})
    with pytest.raises(ValueError, match="finite"):
        arr[...] = bad
