"""Inference throughput: flagship autoregressive forecast rollout on the chip.

The serving-side headline: model steps/s (6 h of simulated weather per step)
for the jitted ``lax.scan`` rollout at the baseline 5.625° workload, i.e. how
fast one chip advances the atmosphere. Uses the two-chain-length slope like
bench.py (the axon tunnel adds a ~33 ms constant fetch cost).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_forecast.py
       [--nlat 128 --nlon 256]   (1.40625° serving throughput)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STEPS = 40       # the reference forecast protocol: 40 x 6 h = 10 days
CHAIN_SHORT, CHAIN_LONG = 2, 10


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--nlat", type=int, default=None)
    ap.add_argument("--nlon", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as _np

    from __graft_entry__ import _flagship
    from paradis_tpu.forecast.rollout import make_forecast_rollout

    cfg, model, d = _flagship(tiny=False)
    cfg.model.forecast_steps = STEPS
    cfg.forecast.output_frequency = 1

    H, W = d["nlat"], d["nlon"]
    if args.nlat:
        # rebuild the model on the requested grid (e.g. 1.40625° = 128x256)
        from paradis_tpu.model.paradis import Paradis

        H, W = args.nlat, args.nlon
        lat = _np.linspace(90, -90, H + 2)[1:-1]
        lon = _np.arange(W) * (360.0 / W)
        model = Paradis.from_config(cfg, input_dim=d["input_dim"],
                                    output_dim=d["output_dim"],
                                    lat_deg=lat, lon_deg=lon,
                                    dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(
            size=(1, H, W, d["n_common"] * d["n_time"])), jnp.float32),
        "forcings": jnp.asarray(rng.normal(
            size=(1, STEPS, H, W, d["n_forcings"] * d["n_time"])), jnp.float32),
        "constants": jnp.asarray(rng.normal(
            size=(1, H, W, d["n_const"])), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
    rollout = make_forecast_rollout(model, cfg)

    t0 = time.perf_counter()
    out = rollout(params, batch, d["n_common"])
    float(out[0, 0, 0, 0, 0])
    print(f"compile+first rollout: {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    def chain(k):
        o = None
        t0 = time.perf_counter()
        for _ in range(k):
            o = rollout(params, batch, d["n_common"])
        float(o[0, 0, 0, 0, 0])
        return time.perf_counter() - t0

    best = min((chain(CHAIN_LONG) - chain(CHAIN_SHORT))
               / (CHAIN_LONG - CHAIN_SHORT) for _ in range(3))
    per_step_ms = best * 1e3 / STEPS
    print(json.dumps({
        "forecast_steps_per_sec": round(STEPS / best, 2),
        "ms_per_model_step": round(per_step_ms, 3),
        "ten_day_forecast_sec": round(best, 3),
        "simulated_days_per_sec": round((STEPS * 0.25) / best, 1),
    }))


if __name__ == "__main__":
    main()
