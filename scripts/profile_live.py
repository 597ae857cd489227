"""Host-timeline attribution of the live training loop (VERDICT r4 #7).

The device-only rate at batch 4 is ~34 samples/s; the live `cli.train` loop
measures 26–27 on this host.  This script runs the REAL pipeline components
(ERA5Dataset with preload → BatchLoader's two-stage prefetch → jitted
train_step) for a few hundred steps and splits every host-side phase:

  * assemble  — per-sample dataset assembly (thread 1, overlapped),
  * place     — host→device transfer per batch (thread 2, overlapped),
  * wait      — main-loop starvation: time blocked on the batch queue,
  * dispatch  — time to enqueue the jitted step (async; sub-ms when the
                device pipeline is healthy),
  * fetch     — loss scalar round-trips at the sync cadence (~33 ms RPC
                through the axon tunnel).

The main-loop wall clock is exactly wait + dispatch + fetch + loop
overhead; whichever phase holds the residual is the live-loop bound.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_live.py \
         --store /root/soak/prep [--steps 200] [--batch 4] [--sync 40]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class _TimedDataset:
    """Forwarding proxy that records per-sample assembly seconds."""

    def __init__(self, ds, sink: list):
        self._ds = ds
        self._sink = sink

    def __getitem__(self, i):
        t0 = time.perf_counter()
        out = self._ds[i]
        self._sink.append(time.perf_counter() - t0)
        return out

    def __len__(self):
        return len(self._ds)

    def __getattr__(self, name):
        return getattr(self._ds, name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sync", type=int, default=40)
    ap.add_argument("--preload", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    from paradis_tpu.config import default_config
    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.data.pipeline import BatchLoader
    from paradis_tpu.model.paradis import Paradis
    from paradis_tpu.train.loss import WeightedLoss
    from paradis_tpu.train.optim import build_optimizer
    from paradis_tpu.train.step import create_train_state, make_train_step
    import jax.numpy as jnp

    cfg = default_config().resolved()
    cfg.dataset.root_dir = args.store
    cfg.training.dataset.preload = bool(args.preload)
    ds = ERA5Dataset(args.store, "2000-01-01", "2000-12-31",
                     forecast_steps=1, cfg=cfg,
                     preload=bool(args.preload))
    model = Paradis.from_config(cfg, input_dim=ds.num_in_features,
                                output_dim=ds.num_out_features,
                                lat_deg=ds.lat, lon_deg=ds.lon,
                                dtype=jnp.bfloat16, training=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, ds.lat_size, ds.lon_size,
                                   ds.num_in_features)))
    optimizer = build_optimizer(cfg, params)
    loss_fn = WeightedLoss(
        kind="reversed_huber",
        feature_weights=np.ones(ds.num_out_features, np.float32),
        lat_weights=None)
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer,
                                    donate=True)
    state = create_train_state(params, optimizer)

    assemble_times: list = []
    place_times: list = []

    loader = BatchLoader(_TimedDataset(ds, assemble_times), args.batch,
                         shuffle=True, prefetch=2)
    orig_place = loader._place

    def timed_place(batch):
        t0 = time.perf_counter()
        out = orig_place(batch)
        place_times.append(time.perf_counter() - t0)
        return out

    loader._place = timed_place

    wait = dispatch = fetch = 0.0
    n = 0
    m = None
    t_loop0 = None
    it = iter(loader)
    while n < args.steps:
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        t1 = time.perf_counter()
        state, m = train_step(state, batch, ds.num_common_features)
        t2 = time.perf_counter()
        if n == 0:
            float(m["loss"])  # compile barrier; start clock after
            t_loop0 = time.perf_counter()
            n += 1
            continue
        wait += t1 - t0
        dispatch += t2 - t1
        if n % args.sync == 0:
            t3 = time.perf_counter()
            float(m["loss"])
            fetch += time.perf_counter() - t3
        n += 1
    t4 = time.perf_counter()
    float(m["loss"])
    fetch += time.perf_counter() - t4
    wall = time.perf_counter() - t_loop0
    steps = n - 1

    a = np.asarray(assemble_times[args.batch:])  # drop warmup batch
    p = np.asarray(place_times[1:])
    print(json.dumps({
        "steps": steps, "batch": args.batch,
        "samples_per_sec": round(steps * args.batch / wall, 2),
        "wall_ms_per_step": round(wall / steps * 1e3, 2),
        "main_loop_ms_per_step": {
            "queue_wait": round(wait / steps * 1e3, 2),
            "dispatch": round(dispatch / steps * 1e3, 2),
            "metric_fetch": round(fetch / steps * 1e3, 2),
            "other": round((wall - wait - dispatch - fetch) / steps * 1e3, 2),
        },
        "overlapped_threads_ms": {
            "assemble_per_sample": round(float(a.mean()) * 1e3, 2) if len(a) else None,
            "assemble_per_step": round(float(a.mean()) * args.batch * 1e3, 2) if len(a) else None,
            "device_put_per_step": round(float(p.mean()) * 1e3, 2) if len(p) else None,
        },
    }))


if __name__ == "__main__":
    main()
