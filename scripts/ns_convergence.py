"""NorMuon Newton–Schulz step-count convergence A/B (5 vs 3 iterations).

NorMuon is the only remaining multi-ms step component at the flagship size
(~9 ms, 82% of its 5-step FLOP floor — BASELINE.md roofline ledger).  A
3-step quintic NS would cut ~2/5 of that FLOP, but changes optimizer
semantics vs the reference's dion default of 5 (reference
``trainer.py:337-364``), so it is convergence-gated (VERDICT r3 next #9):
train the same tiny model from the same seed with both settings and compare
loss trajectories.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ns_convergence.py
       [--steps 300] [--seeds 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _train(store: Path, steps: int, ns_steps: int, seed: int = 0) -> np.ndarray:
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
    cfg.training.optimizer.name = "normuon"
    cfg.training.optimizer.lr = 5e-4
    cfg.training.optimizer.ns_steps = ns_steps

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
    p.add_argument("--seeds", type=int, default=2)
    args = p.parse_args()

    from paradis_tpu.data.preprocess import preprocess
    from paradis_tpu.data.synthetic import build_raw_store

    tmp = Path(tempfile.mkdtemp(prefix="ns_ab_"))
    build_raw_store(str(tmp / "raw"), nlat=8, nlon=16, n_times=80,
                    levels=(500, 850, 1000))
    preprocess(str(tmp / "raw"), str(tmp / "store"), toa_time_stride=20)

    out = []
    for seed in range(args.seeds):
        l5 = _train(tmp / "store", args.steps, ns_steps=5, seed=seed)
        l3 = _train(tmp / "store", args.steps, ns_steps=3, seed=seed)
        tail = slice(args.steps // 2, None)
        out.append({
            "seed": seed,
            "final_5": round(float(l5[-1]), 6),
            "final_3": round(float(l3[-1]), 6),
            "tail_mean_5": round(float(l5[tail].mean()), 6),
            "tail_mean_3": round(float(l3[tail].mean()), 6),
            "tail_rel_gap": round(
                float((l3[tail].mean() - l5[tail].mean())
                      / max(abs(l5[tail].mean()), 1e-9)), 6),
        })
        print(json.dumps(out[-1]), flush=True)
    gaps = [o["tail_rel_gap"] for o in out]
    print(json.dumps({"mean_tail_rel_gap": round(float(np.mean(gaps)), 6)}))


if __name__ == "__main__":
    main()
