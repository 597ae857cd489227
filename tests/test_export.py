"""Serving-artifact export (paradis_tpu.forecast.export + cli.export).

The artifact must reproduce the exporting model bit-for-bit (same StableHLO,
same platform) and carry everything a model-code-free serving loop needs to
autoregress (manifest n_common/n_time + the exported single step).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import build_toy_store, toy_config

from paradis_tpu.data.dataset import ERA5Dataset
from paradis_tpu.forecast.export import (
    _flatten_params,
    _unflatten_params,
    load_artifact,
    save_artifact,
)
from paradis_tpu.model.paradis import Paradis


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("export"))


@pytest.fixture(scope="module")
def built(store):
    cfg = toy_config(store)
    ds = ERA5Dataset(cfg.dataset.root_dir, "2000-01-01", "2000-01-05",
                     forecast_steps=1, cfg=cfg)
    model = Paradis.from_config(
        cfg, input_dim=ds.num_in_features, output_dim=ds.num_out_features,
        lat_deg=ds.lat, lon_deg=ds.lon, dtype=jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, ds.lat_size, ds.lon_size, ds.num_in_features)),
    )
    return cfg, ds, model, params


def test_params_flatten_roundtrip(built):
    _, _, _, params = built
    restored = _unflatten_params(_flatten_params(params))
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(restored)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_artifact_reproduces_model(built, tmp_path):
    cfg, ds, model, params = built
    art = save_artifact(
        tmp_path / "art", model, params, cfg, batch_size=1,
        nlat=ds.lat_size, nlon=ds.lon_size,
        input_dim=ds.num_in_features, output_dim=ds.num_out_features,
        n_common=ds.num_common_features,
        feature_names=list(ds.dyn_output_features),
    )
    serving = load_artifact(art)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, ds.lat_size, ds.lon_size, ds.num_in_features)), jnp.float32)
    got = np.asarray(serving(x))
    want = np.asarray(model.apply(params, x))
    # same StableHLO, but the deserialized program is recompiled (AOT load
    # path) — identical up to fp32 reassociation (~2e-7 measured)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    m = serving.manifest
    assert m["format"] == "paradis_tpu.export.v1"
    assert m["input_shape"] == [1, ds.lat_size, ds.lon_size, ds.num_in_features]
    assert m["output_shape"] == [1, ds.lat_size, ds.lon_size, ds.num_out_features]
    assert m["n_common"] == ds.num_common_features
    assert m["n_time"] == int(cfg.dataset.n_time_inputs)
    assert m["feature_names"] == list(ds.dyn_output_features)
    assert "model:" in m["config_yaml"] or "model" in m["config_yaml"]


def test_artifact_autoregresses_like_rollout(built, tmp_path):
    """Model-code-free serving loop == the in-process jitted rollout."""
    from paradis_tpu.forecast.rollout import make_forecast_rollout
    from paradis_tpu.train.step import autoregress_next_input

    cfg, ds, model, params = built
    cfg = toy_config(ds.root_dir)
    cfg.model.forecast_steps = 3
    cfg.forecast.output_frequency = 1

    art = save_artifact(
        tmp_path / "art2", model, params, cfg, batch_size=1,
        nlat=ds.lat_size, nlon=ds.lon_size,
        input_dim=ds.num_in_features, output_dim=ds.num_out_features,
        n_common=ds.num_common_features,
    )
    serving = load_artifact(art)

    rng = np.random.default_rng(1)
    H, Wd = ds.lat_size, ds.lon_size
    n_common = ds.num_common_features
    n_time = int(cfg.dataset.n_time_inputs)
    n_forcing_ch = len(cfg.features.input.forcings) * n_time
    n_const_ch = ds.num_in_features - n_common * n_time - n_forcing_ch
    batch = {
        "input": jnp.asarray(rng.normal(
            size=(1, H, Wd, n_common * n_time)), jnp.float32),
        "forcings": jnp.asarray(rng.normal(
            size=(1, 3, H, Wd, n_forcing_ch)), jnp.float32),
        "constants": jnp.asarray(rng.normal(
            size=(1, H, Wd, n_const_ch)), jnp.float32),
    }

    rollout = make_forecast_rollout(model, cfg)
    want = np.asarray(rollout(params, batch, ds.num_common_features))

    # serving loop: concat dyn+forcing+constants, step, lag-shift
    n_common = serving.manifest["n_common"]
    n_time = serving.manifest["n_time"]
    dyn = batch["input"]
    outs = []
    for s in range(3):
        model_in = jnp.concatenate(
            [dyn, batch["forcings"][:, s],
             jnp.broadcast_to(batch["constants"],
                              (1,) + batch["constants"].shape[1:])], axis=-1)
        out = serving(model_in)
        outs.append(np.asarray(out))
        dyn = autoregress_next_input(dyn, out, n_common, n_time)
    got = np.stack(outs, axis=1).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_cli_export(store, tmp_path):
    from paradis_tpu.cli.export import main as export_main
    from paradis_tpu.train.checkpoint import save_params

    cfg = toy_config(store)
    ds = ERA5Dataset(cfg.dataset.root_dir, "2000-01-01", "2000-01-05",
                     forecast_steps=1, cfg=cfg)
    model = Paradis.from_config(
        cfg, input_dim=ds.num_in_features, output_dim=ds.num_out_features,
        lat_deg=ds.lat, lon_deg=ds.lon, dtype=jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, ds.lat_size, ds.lon_size, ds.num_in_features)),
    )
    ckpt = tmp_path / "ckpt"
    save_params(str(ckpt), params)

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg.to_yaml())
    art_dir = tmp_path / "artifact"
    export_main([
        "--config", str(cfg_path),
        "--checkpoint-path", str(ckpt),
        "--output-dir", str(art_dir),
    ])
    assert (art_dir / "forward.shlo").exists()
    assert (art_dir / "params.npz").exists()
    manifest = json.loads((art_dir / "manifest.json").read_text())
    assert manifest["n_common"] == ds.num_common_features

    serving = load_artifact(art_dir)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, ds.lat_size, ds.lon_size, ds.num_in_features)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(serving(x)), np.asarray(model.apply(params, x)),
        rtol=1e-5, atol=1e-5)


def test_rollout_export_matches_inprocess(built, tmp_path):
    """rollout.shlo (one-dispatch scanned rollout) == make_forecast_rollout."""
    from paradis_tpu.forecast.rollout import make_forecast_rollout

    cfg, ds, model, params = built
    cfg = toy_config(ds.root_dir)
    cfg.model.forecast_steps = 4
    cfg.forecast.output_frequency = 2

    art = save_artifact(
        tmp_path / "art3", model, params, cfg, batch_size=1,
        nlat=ds.lat_size, nlon=ds.lon_size,
        input_dim=ds.num_in_features, output_dim=ds.num_out_features,
        n_common=ds.num_common_features,
    )
    assert (art / "rollout.shlo").exists()
    serving = load_artifact(art)
    assert serving.has_rollout
    mr = serving.manifest["rollout"]
    assert mr["forecast_steps"] == 4 and mr["output_frequency"] == 2
    assert "rollout.shlo" in serving.manifest["serving_note"]

    rng = np.random.default_rng(9)
    shapes = mr["input_shapes"]
    batch = {k: jnp.asarray(rng.normal(size=shapes[k]), jnp.float32)
             for k in ("input", "forcings", "constants")}
    want = np.asarray(make_forecast_rollout(model, cfg)(
        params, batch, ds.num_common_features))
    got = np.asarray(serving.rollout(batch["input"], batch["forcings"],
                                     batch["constants"]))
    assert got.shape == tuple(mr["output_shape"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
