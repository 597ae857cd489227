"""Benchmark: training throughput of the baseline workload on one chip.

Workload (BASELINE.md): ERA5 5.625° (32x64 grid), 13 levels, 186-in/97-out
features, latent 1024 x 8 layers x 768 velocity vectors, bicubic advection,
bf16 compute, batch 1/device, NorMuon + weighted reversed-Huber, single-step
rollout — the reference's default training configuration.

Measures full train-step throughput (forward + backward + Newton–Schulz
optimizer) with device-resident data, i.e. the model/step compute path that
the host pipeline feeds.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against ``baseline_samples_per_sec`` in BASELINE.json when present, else 1.0.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import os

# batch 1/device is the reference's training configuration (BASELINE.md);
# PARADIS_BENCH_BATCH overrides for batch-scaling measurements
BATCH = int(os.environ.get("PARADIS_BENCH_BATCH", "1"))
# PARADIS_BENCH_STATS=1 turns on training.log_additional_stats (per-channel
# diagnostics + grad-tree metrics) to measure the deep-stats step cost
# PARADIS_BENCH_LOSS=amse measures the spectral-loss training mode
# (reference utils/amse_loss.py:13-208, config training.loss_function.type)
LOSS_KIND = os.environ.get("PARADIS_BENCH_LOSS", "reversed_huber")
WARMUP_STEPS = 2
# The axon TPU tunnel adds a ~33 ms RPC round-trip to every host-visible
# result fetch, so wall-clock over a fixed chain would be latency-dominated.
# We time two chain lengths and take the slope: per-step time free of the
# constant fetch overhead (validated against a calibration matmul that then
# reaches ~94% of v5e bf16 peak).
CHAIN_SHORT = 4
CHAIN_LONG = 24


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from paradis_tpu.train.loss import WeightedLoss
    from paradis_tpu.train.optim import build_optimizer
    from paradis_tpu.train.step import create_train_state, make_train_step
    from paradis_tpu.sphere.geometry import latitude_weights, equiangular_lat_lon
    from paradis_tpu.train.loss import pressure_weights

    cfg, model, d = _flagship(tiny=False, training=True)
    cfg.training.optimizer.name = "normuon"
    if os.environ.get("PARADIS_BENCH_STATS"):
        cfg.training.log_additional_stats = True

    H, W = d["nlat"], d["nlon"]
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(
            size=(BATCH, H, W, d["n_common"] * d["n_time"])), jnp.float32),
        "target": jnp.asarray(rng.normal(
            size=(BATCH, 1, H, W, d["output_dim"])), jnp.float32),
        "forcings": jnp.asarray(rng.normal(
            size=(BATCH, 1, H, W, d["n_forcings"] * d["n_time"])), jnp.float32),
        "constants": jnp.asarray(rng.normal(
            size=(BATCH, H, W, d["n_const"])), jnp.float32),
    }

    lat, _ = equiangular_lat_lon(H, W, include_poles=False)
    n_levels = len(cfg.features.pressure_levels)
    fw = np.ones(d["output_dim"], np.float32)
    pw = pressure_weights(np.asarray(cfg.features.pressure_levels))
    n_atmo = len(cfg.features.output.atmospheric) * n_levels
    for i in range(0, n_atmo, n_levels):
        fw[i : i + n_levels] = pw
    if LOSS_KIND == "amse":
        from paradis_tpu.train.amse import AMSELoss

        loss_fn = WeightedLoss(
            kind="amse", feature_weights=fw,
            amse=AMSELoss(nlat=H, nlon=W, includes_poles=False))
    else:
        loss_fn = WeightedLoss(kind=LOSS_KIND, feature_weights=fw,
                               lat_weights=latitude_weights(lat).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
    optimizer = build_optimizer(cfg, params)
    # donate=False: we time repeated steps on the same state snapshot safely
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer, donate=True)
    state = create_train_state(params, optimizer)

    for _ in range(WARMUP_STEPS):
        state, metrics = train_step(state, batch, d["n_common"])
    float(metrics["loss"])  # force completion through the tunnel

    def timed_chain(k: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(k):
            state, metrics = train_step(state, batch, d["n_common"])
        float(metrics["loss"])  # value fetch = real synchronization
        return time.perf_counter() - t0

    # Median-of-5 slope: the shared tunnel's load varies run-to-run, and a
    # min-of-N statistic selects optimistic windows (round-3 lesson: the
    # driver's 32.54 landed in a band every quiet A/B leg discarded as
    # variance).  The median is the reproducible number; the spread keys
    # expose how (un)quiet this run's windows were.
    slopes = []
    for _ in range(5):
        t_short = timed_chain(CHAIN_SHORT)
        t_long = timed_chain(CHAIN_LONG)
        slopes.append((t_long - t_short) / (CHAIN_LONG - CHAIN_SHORT))
    rates = sorted(BATCH / s for s in slopes)
    samples_per_sec = float(np.median(rates))

    baseline = None
    baseline_path = Path(__file__).parent / "BASELINE.json"
    if baseline_path.exists():
        meta = json.loads(baseline_path.read_text())
        baseline = meta.get("published", {}).get("train_samples_per_sec_per_chip")
        if baseline is None:
            # no published reference numbers exist; fall back to our own
            # measured run of the reference torch model's training step on
            # this host's CPU (scripts/bench_reference.py; BASELINE.md)
            baseline = meta.get("measured", {}).get(
                "reference_model_cpu_samples_per_sec")

    vs = samples_per_sec / baseline if baseline else 1.0
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 4),
        "unit": "samples/s",
        "vs_baseline": round(vs, 4),
        "spread_min": round(rates[0], 4),
        "spread_max": round(rates[-1], 4),
    }))


if __name__ == "__main__":
    main()
