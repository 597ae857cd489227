"""Measured reference-throughput baseline (VERDICT r1 missing #4).

Times a full training step (forward + loss + backward + AdamW update) of the
ACTUAL PyTorch reference model (imported from /root/reference as an oracle —
never copied) against this rebuild's JAX model on the SAME hardware (CPU,
this host) at the flagship workload size (BASELINE.md: 32x64 grid, 186-in /
97-out, latent 1024 x 8 layers x 768 velocity vectors, bicubic advection,
batch 1).

The reference trainer itself cannot run here (lightning/hydra/xarray are not
installed), so the comparison is the model compute path — which is where all
the time goes at batch 1.  Both sides use AdamW (dion is not installed for
the reference; Muon would only add equal work to both).  fp32 on both sides
(torch CPU has no bf16 fast path).

Prints one JSON line:
  {"reference_cpu_s_per_step": ..., "ours_cpu_s_per_step": ..., "ratio": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

H, W = 32, 64
N_COMMON, N_TIME, N_FORCINGS, N_STATIC = 83, 2, 5, 10
IN_DIM = N_COMMON * N_TIME + N_FORCINGS * N_TIME + N_STATIC  # 186
OUT_DIM = 97
STEPS = 3


def _flagship_cfg():
    from paradis_tpu.config import default_config

    cfg = default_config().resolved()
    cfg.compute.use_amp = False
    return cfg


def bench_reference() -> float:
    import torch

    sys.path.insert(0, "/root/reference")
    from model.paradis import Paradis as RefParadis

    class _DS:
        num_in_dyn_features = N_COMMON * N_TIME + N_FORCINGS * N_TIME
        num_in_static_features = N_STATIC

    class _DM:
        dataset = _DS()
        num_common_features = N_COMMON
        num_out_features = OUT_DIM

    cfg = _flagship_cfg()
    lat = np.linspace(90, -90, H + 2)[1:-1]
    lon = np.arange(W) * (360.0 / W)
    latg, long_ = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")
    model = RefParadis(_DM(), cfg, torch.tensor(latg, dtype=torch.float32),
                       torch.tensor(long_, dtype=torch.float32))
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)

    x = torch.randn(1, IN_DIM, H, W)
    y = torch.randn(1, OUT_DIM, H, W)

    def step():
        opt.zero_grad(set_to_none=True)
        out = model(x)
        loss = torch.nn.functional.mse_loss(out, y)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_ours() -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from paradis_tpu.train.loss import WeightedLoss
    from paradis_tpu.train.optim import build_optimizer
    from paradis_tpu.train.step import create_train_state, make_train_step

    cfg, model, d = _flagship(tiny=False)
    cfg.compute.use_amp = False
    cfg.training.optimizer.name = "adamw"

    import paradis_tpu.model.paradis as mp

    model = mp.Paradis.from_config(
        cfg, input_dim=d["input_dim"], output_dim=d["output_dim"],
        lat_deg=np.linspace(90, -90, H + 2)[1:-1],
        lon_deg=np.arange(W) * (360.0 / W), dtype=jnp.float32,
    )

    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(
            size=(1, H, W, d["n_common"] * d["n_time"])), jnp.float32),
        "target": jnp.asarray(rng.normal(
            size=(1, 1, H, W, d["output_dim"])), jnp.float32),
        "forcings": jnp.asarray(rng.normal(
            size=(1, 1, H, W, d["n_forcings"] * d["n_time"])), jnp.float32),
        "constants": jnp.asarray(rng.normal(
            size=(1, H, W, d["n_const"])), jnp.float32),
    }
    loss_fn = WeightedLoss(kind="mse",
                           feature_weights=np.ones(d["output_dim"], np.float32),
                           lat_weights=None)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
    optimizer = build_optimizer(cfg, params)
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer, donate=True)
    state = create_train_state(params, optimizer)

    state, m = train_step(state, batch, d["n_common"])  # compile + warmup
    float(m["loss"])
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        state, m = train_step(state, batch, d["n_common"])
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["reference", "ours", "both"], default="both")
    args = ap.parse_args()
    out = {}
    if args.side in ("reference", "both"):
        out["reference_cpu_s_per_step"] = bench_reference()
        print(f"reference (torch, CPU): {out['reference_cpu_s_per_step']:.3f} s/step",
              file=sys.stderr, flush=True)
    if args.side in ("ours", "both"):
        out["ours_cpu_s_per_step"] = bench_ours()
        print(f"ours (jax, CPU): {out['ours_cpu_s_per_step']:.3f} s/step",
              file=sys.stderr, flush=True)
    if len(out) == 2:
        out["ratio_ours_over_reference"] = (
            out["reference_cpu_s_per_step"] / out["ours_cpu_s_per_step"]
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
