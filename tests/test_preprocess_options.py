"""Preprocessor pole-removal and regridding options."""

import numpy as np
import pytest

from paradis_tpu.data import zarrlite
from paradis_tpu.data.preprocess import (
    _regrid_matrix,
    _regrid_matrix_periodic,
    preprocess,
)
from paradis_tpu.data.synthetic import build_raw_store


@pytest.fixture(scope="module")
def raw_with_poles(tmp_path_factory):
    """A raw store whose latitudes include the poles."""
    base = tmp_path_factory.mktemp("poles")
    out = base / "raw"
    build_raw_store(str(out), nlat=9, nlon=16, n_times=6, levels=(500, 1000))
    # overwrite latitude with a pole-inclusive ladder
    lat = np.linspace(-90.0, 90.0, 9)
    zarrlite.create_array(out / "latitude", shape=lat.shape, dtype=np.float64,
                          data=lat, dims=("latitude",), overwrite=True)
    return out


def test_remove_poles(raw_with_poles, tmp_path_factory):
    store = tmp_path_factory.mktemp("np_store")
    preprocess(str(raw_with_poles), str(store), remove_poles=True,
               toa_time_stride=6)
    g = zarrlite.open_store(store / "2000")
    lat = np.asarray(g["latitude"][...])
    assert len(lat) == 7
    assert -90.0 not in lat and 90.0 not in lat
    assert g["data"].shape[2] == 7


def test_interp_deg_regrids(raw_with_poles, tmp_path_factory):
    store = tmp_path_factory.mktemp("re_store")
    preprocess(str(raw_with_poles), str(store), interp_deg=45.0,
               toa_time_stride=6)
    g = zarrlite.open_store(store / "2000")
    lat = np.asarray(g["latitude"][...])
    lon = np.asarray(g["longitude"][...])
    np.testing.assert_allclose(lat, np.arange(-90, 91, 45.0))
    np.testing.assert_allclose(lon, np.arange(0, 360, 45.0))
    assert np.isfinite(np.asarray(g["data"][0])).all()


def test_regrid_matrix_interpolates_linearly():
    src = np.array([0.0, 10.0, 20.0])
    dst = np.array([5.0, 10.0, 15.0])
    m = _regrid_matrix(src, dst)
    vals = m @ np.array([0.0, 1.0, 4.0])
    np.testing.assert_allclose(vals, [0.5, 1.0, 2.5])


def test_periodic_regrid_wraps():
    src = np.arange(0, 360, 90.0)  # 0, 90, 180, 270
    dst = np.array([315.0])        # halfway between 270 and 0(=360)
    m = _regrid_matrix_periodic(src, dst)
    vals = m @ np.array([10.0, 0.0, 0.0, 20.0])
    np.testing.assert_allclose(vals, [15.0])


def test_13_level_preset_selects_subset(tmp_path):
    """--levels 13 picks the reference's 13-level preset out of a store
    holding a superset (reference preprocess_dataset.py:172-181)."""
    from paradis_tpu.data import zarrlite
    from paradis_tpu.data.preprocess import LEVELS_13, preprocess
    from paradis_tpu.data.synthetic import build_raw_store

    extra = sorted(set(LEVELS_13) | {775, 875})   # superset of the preset
    build_raw_store(str(tmp_path / "raw"), nlat=8, nlon=16, n_times=4,
                    levels=tuple(extra))
    preprocess(str(tmp_path / "raw"), str(tmp_path / "out"), levels=13,
               toa_time_stride=2)
    g = zarrlite.open_store(tmp_path / "out" / "2000")
    feats = [str(f) for f in g["features"][...]]
    geos = sorted(int(f.rsplit("_h", 1)[1]) for f in feats
                  if f.startswith("geopotential_h"))
    assert geos == sorted(LEVELS_13)
    assert not any(f.endswith("_h775") or f.endswith("_h875") for f in feats)


def test_lq16_codec_store_matches_lossless(tmp_path):
    """--codec lq16 (LayerQuantizer equivalent, reference
    scripts/preprocess_dataset.py:11-15): the lossy training store matches
    the lossless one to the per-layer quantization bound and is smaller."""
    from paradis_tpu.data.synthetic import build_raw_store

    build_raw_store(str(tmp_path / "raw"), nlat=8, nlon=16, n_times=4,
                    levels=(500, 1000))
    preprocess(str(tmp_path / "raw"), str(tmp_path / "lossless"),
               toa_time_stride=2)
    preprocess(str(tmp_path / "raw"), str(tmp_path / "lossy"),
               toa_time_stride=2, codec="lq16")
    exact = zarrlite.open_store(tmp_path / "lossless" / "2000")["data"][...]
    lossy = zarrlite.open_store(tmp_path / "lossy" / "2000")["data"][...]
    step = (exact.max(axis=(2, 3)) - exact.min(axis=(2, 3))) / (2**16 - 1)
    # + fp32 reconstruction ulp (large-offset fields, e.g. geopotential)
    ulp = np.spacing(np.abs(exact).max(axis=(2, 3)))
    err = np.abs(lossy - exact).max(axis=(2, 3))
    assert np.all(err <= step * 0.5 + 4 * ulp)

    def store_bytes(root):
        return sum(p.stat().st_size
                   for p in (root / "2000" / "data").rglob("*") if p.is_file())

    assert store_bytes(tmp_path / "lossy") < store_bytes(tmp_path / "lossless")
