"""Isolate the per-step host-RSS growth seen on the tunnel (soak finding).

The 20k-step soak measured ~2.1 MB/step of host RSS growth at batch 4
through the axon TPU tunnel, while the identical loop on the CPU backend is
flat — so the growth lives in the device-client path.  This probe runs N
steps of each ingredient separately and reports the RSS slope:

  * step-only    — jitted donated train step re-using resident device
                   batches (dispatch + donation churn, no transfers),
  * put-only     — device_put of a fresh ~12 MB host batch per step
                   (transfer buffers, no compute),
  * step+put     — both (the live-loop shape),
  * step+put+lr  — plus the per-step ``set_learning_rate`` scalar transfer.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_rss.py [--steps 400]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from paradis_tpu.train.loss import WeightedLoss
    from paradis_tpu.train.optim import (
        build_optimizer,
        set_learning_rate,
    )
    from paradis_tpu.train.step import create_train_state, make_train_step

    cfg, model, d = _flagship(tiny=False, training=True)
    cfg.training.optimizer.name = "normuon"
    B = args.batch
    H, W = d["nlat"], d["nlon"]
    rng = np.random.default_rng(0)

    def host_batch():
        return {
            "input": rng.normal(size=(B, H, W, d["n_common"] * d["n_time"])).astype(np.float32),
            "target": rng.normal(size=(B, 1, H, W, d["output_dim"])).astype(np.float32),
            "forcings": rng.normal(size=(B, 1, H, W, d["n_forcings"] * d["n_time"])).astype(np.float32),
            "constants": rng.normal(size=(B, H, W, d["n_const"])).astype(np.float32),
        }

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
    optimizer = build_optimizer(cfg, params)
    loss_fn = WeightedLoss(
        kind="reversed_huber",
        feature_weights=np.ones(d["output_dim"], np.float32),
        lat_weights=None)
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer,
                                    donate=True)

    results = {}

    def slope(label, fn, n):
        # warmup
        fn(0)
        r0 = rss_mb()
        t0 = time.perf_counter()
        for i in range(1, n):
            fn(i)
        dt = time.perf_counter() - t0
        growth = rss_mb() - r0
        results[label] = {
            "mb_total": round(growth, 1),
            "mb_per_step": round(growth / max(1, n - 1), 3),
            "ms_per_step": round(dt / max(1, n - 1) * 1e3, 1),
        }
        print(label, results[label], flush=True)

    # resident device batch for step-only
    dev_batch = {k: jax.device_put(v) for k, v in host_batch().items()}
    state = create_train_state(params, optimizer)

    def step_only(i):
        nonlocal state
        state, m = train_step(state, dev_batch, d["n_common"])
        if i % 40 == 0:
            float(m["loss"])

    slope("step_only", step_only, args.steps)

    def put_only(i):
        b = {k: jax.device_put(v) for k, v in host_batch().items()}
        if i % 40 == 0:
            jax.block_until_ready(b["input"])

    slope("put_only", put_only, args.steps)

    def step_put(i):
        nonlocal state
        b = {k: jax.device_put(v) for k, v in host_batch().items()}
        state, m = train_step(state, b, d["n_common"])
        if i % 40 == 0:
            float(m["loss"])

    slope("step_put", step_put, args.steps)

    def step_put_lr(i):
        nonlocal state
        b = {k: jax.device_put(v) for k, v in host_batch().items()}
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 5e-4))
        state, m = train_step(state, b, d["n_common"])
        if i % 40 == 0:
            float(m["loss"])

    slope("step_put_lr", step_put_lr, args.steps)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
