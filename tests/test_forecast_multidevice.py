"""Multi-device forecast: dp-sharded rollout writes the same store as 1-device."""

import numpy as np
import pytest

from fixtures import build_toy_store, toy_config


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("fcmd"))


def test_sharded_forecast_matches_single_device(store, tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from paradis_tpu.data import zarrlite
    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.data.pipeline import BatchLoader
    from paradis_tpu.distributed import create_mesh
    from paradis_tpu.forecast.rollout import run_forecast
    from paradis_tpu.forecast.writer import ZarrForecastWriter
    from paradis_tpu.model.paradis import Paradis

    cfg = toy_config(store, **{"model.forecast_steps": 2, "forecast.enable": True})
    ds = ERA5Dataset(str(store), "2000-01-03", "2000-01-04T12:00:00",
                     forecast_steps=2, cfg=cfg, prediction_stage=True)
    # an odd sample count exercises the ragged-final-batch padding
    assert len(ds) % 4 != 0

    model = Paradis.from_config(cfg, input_dim=ds.num_in_features,
                                output_dim=ds.num_out_features,
                                lat_deg=ds.lat, lon_deg=ds.lon, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, ds.lat_size, ds.lon_size, ds.num_in_features)))

    out1 = tmp_path_factory.mktemp("f1") / "a.zarr"
    cfg.forecast.output_file = str(out1)
    run_forecast(model, params, ds, cfg, ZarrForecastWriter(cfg, ds),
                 BatchLoader(ds, 2, shuffle=False, drop_last=False,
                             device_put=False))

    out2 = tmp_path_factory.mktemp("f2") / "b.zarr"
    cfg.forecast.output_file = str(out2)
    mesh = create_mesh(data=4, space=2)
    run_forecast(model, params, ds, cfg, ZarrForecastWriter(cfg, ds),
                 BatchLoader(ds, 4, shuffle=False, drop_last=False,
                             device_put=False), mesh=mesh)

    g1, g2 = zarrlite.open_store(out1), zarrlite.open_store(out2)
    for var in ("geopotential", "2m_temperature", "u_component_of_wind"):
        a, b = g1[var][...], g2[var][...]
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-4, equal_nan=True)
