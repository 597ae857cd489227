"""Diagnostics: deep grad stats, evaluation scoring, checkpoint surgery."""

import numpy as np
import pytest

from fixtures import build_toy_store, toy_config


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("obs"))


@pytest.mark.slow
def test_log_additional_stats(store, tmp_path_factory):
    from paradis_tpu.train.loop import Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 2,
        "training.optimizer.name": "normuon",
        "training.log_additional_stats": True,
    })
    log_dir = tmp_path_factory.mktemp("dlogs")
    t = Trainer(cfg, log_dir=str(log_dir))
    t.fit()
    text = (log_dir / "metrics.csv").read_text()
    assert "grad/total" in text
    assert "gradratio/" in text
    assert "grad_alignment/" in text or "pnorm/" in text
    assert "train_loss_channel_weighted/geopotential_h500" in text


def test_amse_training_decreases_loss(store, tmp_path_factory):
    """Training with the spectral AMSE loss runs end-to-end AND learns.

    Reference treats AMSE as a first-class training mode
    (utils/amse_loss.py:13-208, training.loss_function); a few optimizer
    steps on the toy store must drive the spectral loss down (VERDICT r2
    weak #4).
    """
    from paradis_tpu.train.loop import Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 8,
        "training.optimizer.name": "adamw",
        "training.loss_function.type": "amse",
    })
    log_dir = tmp_path_factory.mktemp("amse_logs")
    t = Trainer(cfg, log_dir=str(log_dir))
    res = t.fit()
    assert np.isfinite(res["val_loss"])

    losses = []
    for line in (log_dir / "metrics.csv").read_text().splitlines()[1:]:
        step, name, value = line.split(",")[:3]
        if name == "train_loss":
            losses.append(float(value))
    assert len(losses) >= 8
    assert min(losses[-3:]) < losses[0], losses


def test_evaluate_forecast_store(store, tmp_path_factory):
    """Perfect-forecast store scores ~0 RMSE; biased forecast scores the bias."""
    import jax.numpy as jnp

    from paradis_tpu.data import zarrlite
    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.forecast.evaluate import evaluate_store
    from paradis_tpu.forecast.writer import ZarrForecastWriter

    cfg = toy_config(store, **{
        "model.forecast_steps": 2,
        "forecast.enable": True,
    })
    out = tmp_path_factory.mktemp("ev") / "fc.zarr"
    cfg.forecast.output_file = str(out)

    ds = ERA5Dataset(str(store), "2000-01-02", "2000-01-04", forecast_steps=2,
                     cfg=cfg, prediction_stage=True)
    writer = ZarrForecastWriter(cfg, ds)
    writer.init_store(ds)

    # build a "perfect" forecast: write the normalized truth as the prediction
    truth_norm = ERA5Dataset(str(store), "2000-01-02", "2000-01-05",
                             forecast_steps=2, cfg=cfg)
    for i in range(len(ds)):
        _, y, _, _ = truth_norm[i]  # [S, H, W, C] normalized targets
        fc = np.moveaxis(y, -1, 1)[None]  # [1, S, C, H, W]
        writer.write_forecast_chunk(fc, np.asarray([i]), 0, ds)

    res = evaluate_store(str(out), str(store),
                         [("geopotential", 500), ("2m_temperature", None)],
                         lead_hours=[6, 12])
    assert res["geopotential_h500@6h"] < 1.0   # float32 + bitround noise only
    assert res["2m_temperature@12h"] < 0.1

    # a constant-bias forecast scores ≈ the bias
    g = zarrlite.open_store(out)
    arr = g["2m_temperature"]
    arr[...] = np.asarray(arr[...]) + 2.0
    res2 = evaluate_store(str(out), str(store), [("2m_temperature", None)], [6])
    assert abs(res2["2m_temperature@6h"] - 2.0) < 0.05


def test_evaluate_acc_external_climatology(store, tmp_path_factory):
    """ACC with the preprocessor's climatology group vs the in-window mean.

    WB2 convention: anomalies against a training-period climatology
    (VERDICT r2 missing #3).  A perfect forecast scores ACC≈1 under either
    convention; a biased forecast's ACC must CHANGE when the climatology
    does, and omitting --climatology must warn loudly.
    """
    import warnings

    from paradis_tpu.data import zarrlite
    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.forecast.evaluate import evaluate_store
    from paradis_tpu.forecast.writer import ZarrForecastWriter

    cfg = toy_config(store, **{
        "model.forecast_steps": 2,
        "forecast.enable": True,
    })
    out = tmp_path_factory.mktemp("evacc") / "fc.zarr"
    cfg.forecast.output_file = str(out)

    ds = ERA5Dataset(str(store), "2000-01-02", "2000-01-04", forecast_steps=2,
                     cfg=cfg, prediction_stage=True)
    writer = ZarrForecastWriter(cfg, ds)
    writer.init_store(ds)
    truth_norm = ERA5Dataset(str(store), "2000-01-02", "2000-01-05",
                             forecast_steps=2, cfg=cfg)
    for i in range(len(ds)):
        _, y, _, _ = truth_norm[i]
        writer.write_forecast_chunk(np.moveaxis(y, -1, 1)[None],
                                    np.asarray([i]), 0, ds)

    clim = str(store / "climatology")
    var = [("2m_temperature", None)]

    # no climatology → loud in-sample warning
    with pytest.warns(UserWarning, match="NOT WB2-comparable"):
        res_inwin = evaluate_store(str(out), str(store), var, [6])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # external climatology: no warning
        res_ext = evaluate_store(str(out), str(store), var, [6],
                                 climatology=clim)
    # perfect forecast: ACC ≈ 1 under either convention
    assert res_inwin["2m_temperature@6h:acc"] > 0.99
    assert res_ext["2m_temperature@6h:acc"] > 0.99

    # biased forecast: the two conventions disagree (different anomalies)
    g = zarrlite.open_store(out)
    arr = g["2m_temperature"]
    arr[...] = np.asarray(arr[...]) + 2.0
    acc_inwin = evaluate_store(str(out), str(store), var, [6]
                               )["2m_temperature@6h:acc"]
    acc_ext = evaluate_store(str(out), str(store), var, [6],
                             climatology=clim)["2m_temperature@6h:acc"]
    assert abs(acc_inwin - acc_ext) > 1e-4, (acc_inwin, acc_ext)


@pytest.mark.slow
def test_resolution_transfer_interpolates_bias_factors(tmp_path):
    """GlobalBias U/V factors re-interpolate across grid sizes on load."""
    import jax
    import jax.numpy as jnp

    from paradis_tpu.model.paradis import Paradis
    from paradis_tpu.sphere.geometry import equiangular_lat_lon
    from paradis_tpu.train.checkpoint import load_params, save_params

    def build(nlat, nlon):
        lat, lon = equiangular_lat_lon(nlat, nlon, include_poles=False)
        m = Paradis(input_dim=16, output_dim=8, n_static=5,
                    lat_deg=tuple(lat), lon_deg=tuple(lon),
                    hidden_dim=8, num_vels=2, num_layers=1,
                    velocity_hidden=4, reaction_hidden=4, output_hidden=4,
                    bias_channels=2, bias_rank=3)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, nlat, nlon, 16)))
        return m, p

    _, p_small = build(8, 16)
    _, p_big = build(16, 32)
    save_params(str(tmp_path / "small"), p_small)
    loaded = load_params(str(tmp_path / "small"), p_big)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(loaded)[0],
        jax.tree_util.tree_flatten_with_path(p_big)[0],
    ):
        assert np.shape(a) == np.shape(b), jax.tree_util.keystr(path)
    # every U/V factor really was interpolated (align-corners endpoints match)
    small_map = {jax.tree_util.keystr(k): np.asarray(v)
                 for k, v in jax.tree_util.tree_flatten_with_path(p_small)[0]}
    checked = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(loaded)[0]:
        ks = jax.tree_util.keystr(path)
        if ks.endswith("['U']") or ks.endswith("['V']"):
            small = small_map[ks]
            leaf = np.asarray(leaf)
            np.testing.assert_allclose(leaf[..., 0], small[..., 0], atol=1e-6)
            np.testing.assert_allclose(leaf[..., -1], small[..., -1], atol=1e-6)
            checked += 1
    assert checked >= 4
