"""Codec convergence A/B: lossless Blosc-LZ4 vs lossy lq16 training stores.

The reference's preprocessed archives are lossy-quantized by default (its
LayerQuantizer, reference ``scripts/preprocess_dataset.py:11-15``); our
training stores default to lossless Blosc-LZ4.  This trains the same tiny
model from the same seed on the same synthetic data preprocessed both ways
and compares the loss trajectories step by step (VERDICT r3 next #7) — if
the 16-bit per-layer quantization noise doesn't move the trajectory, lq16
is safe to recommend for large archives (it roughly halves store size).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/lq_convergence.py
       [--steps 300] [--codec-b lq16]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _train(store: Path, steps: int, seed: int = 0) -> np.ndarray:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from paradis_tpu.config import default_config
    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.data.pipeline import BatchLoader
    from paradis_tpu.model.paradis import Paradis
    from paradis_tpu.train.loss import WeightedLoss
    from paradis_tpu.train.optim import build_optimizer
    from paradis_tpu.train.step import create_train_state, make_train_step

    cfg = default_config().resolved()
    cfg.features.pressure_levels = [500, 850, 1000]
    cfg.model.latent_size = 32
    cfg.model.velocity_vectors = 8
    cfg.model.num_layers = 2
    cfg.model.physblock.velocity_net.hidden_dim = 16
    cfg.model.physblock.reaction.hidden_dim = 16
    cfg.model.physblock.output_proj.hidden_dim = 16
    cfg.model.bias_channels = 2
    cfg.model.bias_rank = 4
    cfg.training.optimizer.name = "adamw"
    cfg.training.optimizer.lr = 1e-3

    ds = ERA5Dataset(str(store), "2000-01-01", None, forecast_steps=1, cfg=cfg)
    loader = BatchLoader(ds, batch_size=1, shuffle=True, seed=seed,
                         device_put=False)
    model = Paradis.from_config(
        cfg, input_dim=ds.num_in_features,
        output_dim=ds.num_out_features, lat_deg=ds.lat, lon_deg=ds.lon,
        dtype=jnp.float32, training=True)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, ds.lat_size, ds.lon_size, ds.num_in_features)))
    opt = build_optimizer(cfg, params)
    loss_fn = WeightedLoss(
        kind="mse", feature_weights=np.ones(ds.num_out_features, np.float32))
    step, _ = make_train_step(model, loss_fn, cfg, opt, donate=False)
    state = create_train_state(params, opt)

    losses = []
    it = iter(loader)
    for _ in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, m = step(state, batch, ds.num_dyn_inputs_single)
        losses.append(float(m["loss"]))
    return np.asarray(losses)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--codec-b", default="lq16")
    args = p.parse_args()

    from paradis_tpu.config import default_config
    from paradis_tpu.data.preprocess import preprocess
    from paradis_tpu.data.synthetic import build_raw_store

    cfg = default_config().resolved()
    tmp = Path(tempfile.mkdtemp(prefix="lq_ab_"))
    build_raw_store(str(tmp / "raw"), nlat=8, nlon=16, n_times=80,
                    levels=(500, 850, 1000))
    preprocess(str(tmp / "raw"), str(tmp / "store_a"), toa_time_stride=20,
               codec="lz4")
    preprocess(str(tmp / "raw"), str(tmp / "store_b"), toa_time_stride=20,
               codec=args.codec_b)

    la = _train(tmp / "store_a", args.steps)
    lb = _train(tmp / "store_b", args.steps)

    d = np.abs(la - lb)
    rel = d / np.maximum(np.abs(la), 1e-9)
    tail = slice(args.steps // 2, None)
    print(json.dumps({
        "codec_a": "lz4", "codec_b": args.codec_b, "steps": args.steps,
        "final_loss_a": round(float(la[-1]), 6),
        "final_loss_b": round(float(lb[-1]), 6),
        "max_abs_diff": round(float(d.max()), 6),
        "max_rel_diff": round(float(rel.max()), 6),
        "tail_mean_a": round(float(la[tail].mean()), 6),
        "tail_mean_b": round(float(lb[tail].mean()), 6),
    }))


if __name__ == "__main__":
    main()
