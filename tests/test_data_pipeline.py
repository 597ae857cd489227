"""End-to-end data tests: synthetic raw store → preprocess → dataset → batches."""

import numpy as np
import pytest

from paradis_tpu.data import zarrlite
from paradis_tpu.data.dataset import ERA5Dataset
from paradis_tpu.data.forcings import time_forcings, toa_radiation
from paradis_tpu.data.pipeline import BatchLoader

from fixtures import TOY_LEVELS, TOY_NLAT, TOY_NLON, TOY_TIMES, build_toy_store, toy_config


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("toy"))


@pytest.fixture(scope="module")
def cfg(store):
    return toy_config(store)


def test_preprocess_layout(store):
    g = zarrlite.open_store(store / "2000")
    data = g["data"]
    feats = [str(f) for f in g["features"][...]]
    # 9 atmo vars × 3 levels + 11 surface-ish vars actually present
    assert data.shape[1] == len(feats)
    assert data.shape[2:] == (TOY_NLAT, TOY_NLON)
    assert "geopotential_h500" in feats
    assert "wind_x_h850" in feats and "wind_z_10m" in feats
    stats = zarrlite.open_store(store / "stats")
    assert stats["mean"].shape[0] == len(feats)
    assert stats.attrs["toa_radiation_std"] > 0
    consts = zarrlite.open_store(store / "constants")
    assert "land_sea_mask" in consts.arrays()
    assert consts["geopotential_at_surface"].attrs["std"] > 0
    tend = zarrlite.open_store(store / "tendency_stats_6h")
    assert tend["tendency_std"].shape[0] == len(feats)


def test_cartesian_wind_roundtrip(store):
    """Preprocessed cartesian winds must invert back to spherical winds."""
    from paradis_tpu.utils.postprocessing import spherical_wind_3d

    g = zarrlite.open_store(store / "2000")
    feats = [str(f) for f in g["features"][...]]
    frame = np.asarray(g["data"][0])
    lat = np.asarray(g["latitude"][...])
    lon = np.asarray(g["longitude"][...])
    latg, long_ = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")

    def get(name):
        return frame[feats.index(name)]

    for lvl in TOY_LEVELS:
        u, v, w = spherical_wind_3d(
            get(f"wind_x_h{lvl}"), get(f"wind_y_h{lvl}"), get(f"wind_z_h{lvl}"),
            get(f"temperature_h{lvl}"), float(lvl) * 100.0, latg, long_,
        )
        np.testing.assert_allclose(u, get(f"u_component_of_wind_h{lvl}"),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(v, get(f"v_component_of_wind_h{lvl}"),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(w, get(f"vertical_velocity_h{lvl}"),
                                   atol=2e-3, rtol=2e-2)


def test_dataset_shapes_and_counts(store, cfg):
    ds = ERA5Dataset(str(store), "2000-01-01", "2000-01-05", forecast_steps=2, cfg=cfg)
    # 7 output atmo × 3 levels + 6 surface = 27 outputs; inputs 6×3+5 = 23 common
    assert ds.num_out_features == 7 * 3 + 6
    assert ds.num_common_features == 6 * 3 + 5
    assert ds.num_in_dyn_features == 2 * (6 * 3 + 5) + 2 * 5
    assert ds.num_in_static_features == 10
    x, y, forcings, consts = ds[0]
    assert x.shape == (TOY_NLAT, TOY_NLON, ds.num_common_features * 2)
    assert y.shape == (2, TOY_NLAT, TOY_NLON, ds.num_out_features)
    assert forcings.shape == (2, TOY_NLAT, TOY_NLON, 10)
    assert consts.shape == (TOY_NLAT, TOY_NLON, 10)
    for arr in (x, y, forcings, consts):
        assert np.isfinite(arr).all()


def test_dataset_normalization_magnitudes(store, cfg):
    ds = ERA5Dataset(str(store), "2000-01-01", "2000-01-05", forecast_steps=1, cfg=cfg)
    x, y, _, _ = ds[0]
    # z-scored channels should be O(1)
    assert np.abs(x).mean() < 5.0
    assert np.abs(y).mean() < 5.0


def test_dataset_autoregression_consistency(store, cfg):
    """Target of sample i at step 0 == input block t_n of sample i+shifted."""
    ds = ERA5Dataset(str(store), "2000-01-01", "2000-01-05", forecast_steps=1, cfg=cfg)
    x0, y0, _, _ = ds[0]
    x1, _, _, _ = ds[1]
    c = ds.num_common_features
    # sample 1's newest input block = sample 0's first target (common features)
    np.testing.assert_allclose(x1[..., c:], y0[0][..., :c], atol=1e-5)


def test_dataset_prediction_mode(store, cfg):
    cfg2 = toy_config(store)
    ds = ERA5Dataset(str(store), "2000-01-05", None, forecast_steps=4, cfg=cfg2,
                     prediction_stage=True)
    idx, x, forcings, consts = ds[0]
    assert idx == 0
    assert forcings.shape[0] == 4
    assert str(ds.sample_time(0)).startswith("2000-01-05")


def test_dataset_interval_sampling(store, cfg):
    ds6 = ERA5Dataset(str(store), "2000-01-01", "2000-01-05", forecast_steps=1,
                      cfg=cfg, time_interval="6h")
    ds12 = ERA5Dataset(str(store), "2000-01-01", "2000-01-05", forecast_steps=1,
                       cfg=cfg, time_interval="12h")
    assert len(ds12) <= (len(ds6) + 1) // 2 + 1
    t0 = ds12.sample_time(0)
    t1 = ds12.sample_time(1)
    assert (t1 - t0) == np.timedelta64(12, "h")


def test_batch_loader(store, cfg):
    ds = ERA5Dataset(str(store), "2000-01-01", "2000-01-05", forecast_steps=1, cfg=cfg)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=0, device_put=False)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["input"].shape[0] == 2
    assert b["target"].ndim == 5
    # second epoch reshuffles but yields the same count
    assert len(list(loader)) == len(batches)


def test_batch_loader_order_and_determinism(store, cfg):
    """The two-stage prefetch pipeline (assemble ∥ place threads) must
    preserve epoch order and seeded-shuffle reproducibility."""
    ds = ERA5Dataset(str(store), "2000-01-01", "2000-01-05", forecast_steps=1,
                     cfg=cfg)
    unshuffled = BatchLoader(ds, batch_size=1, shuffle=False, device_put=False)
    inputs = [b["input"][0] for b in unshuffled]
    # unshuffled order is the dataset's sample order
    for i, x in enumerate(inputs):
        np.testing.assert_array_equal(x, ds[i][0])
    # same seed → same shuffled order across fresh loaders
    a = [b["input"][0, 0, 0, 0] for b in
         BatchLoader(ds, batch_size=1, shuffle=True, seed=3, device_put=False)]
    b = [b["input"][0, 0, 0, 0] for b in
         BatchLoader(ds, batch_size=1, shuffle=True, seed=3, device_put=False)]
    np.testing.assert_array_equal(a, b)


def test_toa_radiation_physical_bounds():
    times = np.array(["2000-06-21T12:00"], dtype="datetime64[s]")
    lat = np.linspace(-87, 87, 16)
    lon = np.arange(0, 360, 22.5)
    rad = toa_radiation(times, lat, lon)
    assert rad.min() >= 0.0
    # solstice: north pole illuminated, south pole dark
    assert rad[0, -1].max() > 0
    assert rad[0, 0].max() == 0.0
    # hourly integral bounded by solar constant × 3600s
    assert rad.max() < 1440.0 * 3600


def test_toa_radiation_cache_matches_direct():
    """ToaRadiationCache must be a pure memo: bitwise-equal to the direct
    quadrature (normalized), on both the miss and the hit path, including
    overlapping stamp windows (the stride-1 sample pattern it exists for)."""
    from paradis_tpu.data.forcings import ToaRadiationCache

    lat = np.linspace(-80, 80, 8)
    lon = np.arange(0, 360, 45.0)
    mean, std = 500e3, 400e3
    cache = ToaRadiationCache(lat, lon, mean, std, capacity=4)
    t0 = np.datetime64("2010-03-01T00:00", "us")
    win1 = t0 + np.arange(3) * np.timedelta64(1, "h")
    win2 = t0 + (1 + np.arange(3)) * np.timedelta64(1, "h")  # overlaps by 2

    direct1 = (toa_radiation(win1, lat, lon) - mean) / std
    direct2 = (toa_radiation(win2, lat, lon) - mean) / std
    np.testing.assert_array_equal(cache(win1), direct1.astype(np.float32))
    np.testing.assert_array_equal(cache(win2), direct2.astype(np.float32))
    # second pass: all hits, still identical, and capacity was respected
    np.testing.assert_array_equal(cache(win2), direct2.astype(np.float32))
    assert len(cache._store) <= 4


def test_time_forcings_ranges():
    times = np.datetime64("2001-01-01") + np.arange(8) * np.timedelta64(6, "h")
    tf = time_forcings(times)
    for k, v in tf.items():
        assert (np.abs(v) <= 1.0).all()
    np.testing.assert_allclose(tf["sin_time_of_day"][0], 0.0, atol=1e-12)
    np.testing.assert_allclose(tf["cos_time_of_day"][2], -1.0, atol=1e-12)
