"""Model-level fwd / fwd+bwd timings per advection backend (chain-slope).

Isolates where the full train step spends time: model forward, model
forward+backward (grad wrt params), each with the advection interpolation
forced to xla or pallas.  Complements bench_interp.py (op level) and bench.py
(full step incl. optimizer).

Usage: python scripts/bench_model.py [--impls xla,pallas] [--what fwd,bwd]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_SHORT, N_LONG = 4, 20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--what", default="fwd,bwd")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from paradis_tpu.model.paradis import Paradis
    from paradis_tpu.sphere.geometry import equiangular_lat_lon

    cfg, _, d = _flagship(tiny=False)
    lat, lon = equiangular_lat_lon(32, 64, include_poles=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, d["input_dim"])), jnp.float32)

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    for impl in args.impls.split(","):
        cfg.compute.advection_impl = impl
        model = Paradis.from_config(cfg, input_dim=d["input_dim"],
                                    output_dim=d["output_dim"],
                                    lat_deg=lat, lon_deg=lon, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def fwd(carry, params, x):
            o = model.apply(params, x + carry * 1e-30)
            return jnp.sum(o.astype(jnp.float32)) * 1e-30

        def loss(params, x):
            return jnp.sum(model.apply(params, x).astype(jnp.float32))

        gradfn = jax.grad(loss)

        @jax.jit
        def bwd(carry, params, x):
            g = gradfn(params, x + carry * 1e-30)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g)) * 1e-30

        for what in args.what.split(","):
            fn = fwd if what == "fwd" else bwd

            def chain(n):
                c = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(n):
                    c = fn(c, params, x)
                float(c)
                return time.perf_counter() - t0

            t0 = time.perf_counter()
            chain(1)
            compile_s = time.perf_counter() - t0
            best = min((chain(N_LONG) - chain(N_SHORT)) / (N_LONG - N_SHORT)
                       for _ in range(3))
            results[f"{impl}_{what}"] = best * 1e3
            print(f"{impl}_{what:4s} {best * 1e3:8.3f} ms  (compile {compile_s:.0f}s)",
                  flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
