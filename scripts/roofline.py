"""Roofline ledger for the flagship train step (VERDICT r2 #3).

For every attributed class of the 34.6 ms batch-1 step (device-trace
attribution, scripts/profile_step.py), this script computes an *analytic*
work inventory — MXU FLOPs, VPU elementwise ops, HBM bytes — from the
flagship shapes, divides by the v5e peaks, and prints achieved-vs-peak with
a verdict.  With ``--cost`` it additionally compiles the full train step on
the current backend and cross-checks the whole-step totals against XLA's
``compiled.cost_analysis()`` so the "tail" (everything outside the named
kernels) is accounted in bytes and FLOPs, not asserted.

Peaks used (v5e, public spec):
  * MXU bf16: 197 TFLOP/s (4×128×128 MACs/cycle ≈ 1.5 GHz)
  * VPU fp32: 8 sublanes × 128 lanes × 4 ALUs ≈ 4096 ops/cycle ≈ 6.1 Tops/s
    (an op = one elementwise ALU issue; FMA would double the FLOP count but
    the hot weight-gen path is compare/select, not FMA)
  * HBM: 819 GB/s

Measured step attribution (batch 1, quiet tunnel, Aug 18-19 device trace):
  advection Pallas bwd 8×1.02 ms, fwd 8×0.44 ms, NorMuon ≈9 ms,
  departure-point trig ≈2.1 ms, remainder ≈11.8 ms flat tail.

Reference analogue: the reference has no such ledger (it publishes no
numbers at all, BASELINE.md); the hot ops correspond to
``model/advection.py:74-98,161-167`` (departure points + grid_sample) and
``trainer.py:337-364`` (optimizer step).
"""

from __future__ import annotations

import argparse

# ---------------------------------------------------------------- peaks
MXU_BF16 = 197e12          # FLOP/s
VPU_OPS = 6.1e12           # elementwise ALU ops/s (fp32)
HBM_BW = 819e9             # bytes/s

# ------------------------------------------------- flagship shapes (BASELINE.md)
B, H, W = 1, 32, 64
P = H * W                  # positions per layer
V = 768                    # velocity vectors (each with its own departure point)
PAD = 2                    # bicubic halo
R, C = H + 2 * PAD, W + 2 * PAD
L = 8                      # physics layers
LATENT = 1024

# ------------------------------------------------- measured (device trace)
MEAS = {
    "advection fwd (8x Pallas)": 8 * 0.44e-3,
    "advection bwd (8x Pallas)": 8 * 1.02e-3,
    "NorMuon update": 8.98e-3,
    "departure trig (8x fwd+bwd)": 2.1e-3,
}
STEP = 34.6e-3
MEAS["tail (everything else)"] = STEP - sum(MEAS.values())

# VPU op costs per element, counted from the source:
# _weights_T bicubic expand (ops/interp_pallas.py:74-118): iota-add + sub
# (2), four compares + two combines for inb (6), four selects + zero mask
# (5) ~= 13 ops per [support, P] element; derivative=True shares all
# comparisons between K and K' so the pair costs ~20, not 26.
OPS_GEN = 13
OPS_GEN_D = 20
# XLA op expansion of fp32 transcendentals on TPU (range reduction +
# polynomial; estimates from XLA's generic lowerings): sin/cos ~30, asin
# ~25 (rsqrt+atan2 form), atan2 ~40, remainder ~6.
OPS_SINCOS, OPS_ASIN, OPS_ATAN2, OPS_REM = 30, 25, 40, 6


def fmt(seconds: float) -> str:
    return f"{seconds * 1e3:7.2f} ms"


def row(name, measured, floor, driver, verdict):
    pct = 100.0 * floor / measured if measured else 0.0
    print(f"| {name:<28} | {fmt(measured)} | {fmt(floor)} | {pct:5.1f}% "
          f"| {driver:<11} | {verdict} |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cost", action="store_true",
                    help="compile the train step and cross-check totals "
                         "against XLA cost_analysis")
    args = ap.parse_args()

    # ---------------------------------------------------------- advection fwd
    mxu_fwd = 2 * V * R * C * P                     # f @ wxT per layer
    vpu_fwd = (V * (R + C) * P * OPS_GEN            # weight generation
               + V * C * P                          # bf16 cast of wxT
               + 2 * V * R * P)                     # sum(wyT * t)
    # HBM per layer: field bf16 in, py/px fp32 in, out fp32
    hbm_fwd = 2 * V * R * C + 2 * 4 * V * P + 4 * V * P
    floor_fwd = L * max(mxu_fwd / MXU_BF16,
                        vpu_fwd / VPU_OPS,
                        hbm_fwd / HBM_BW)

    # ---------------------------------------------------------- advection bwd
    mxu_bwd = 3 * mxu_fwd                           # tt (2P wide) + partial
    vpu_bwd = (V * (R + C) * P * OPS_GEN_D          # K and K' both axes
               + V * 2 * C * P                      # bf16 cast of wx2
               + 2 * (2 * V * R * P + V * P)        # dpy, dpx reduces
               + 3 * V * R * P                      # wyg mul + cast
               + 2 * V * R * C)                     # d_field accumulate (2 p-blocks)
    hbm_bwd = (2 * V * R * C + 3 * 4 * V * P        # field, py/px/g in
               + 4 * V * R * C + 2 * 4 * V * P)     # d_field, dpy/dpx out
    floor_bwd = L * max(mxu_bwd / MXU_BF16,
                        vpu_bwd / VPU_OPS,
                        hbm_bwd / HBM_BW)

    # ---------------------------------------------------------- NorMuon
    # 1.46 TFLOP per update over 59.6 M muon params (BASELINE.md: quintic
    # Newton-Schulz, bucketed batched GEMMs in native orientation)
    NORMUON_FLOP = 1.46e12
    floor_norm = NORMUON_FLOP / MXU_BF16

    # ---------------------------------------------------------- departure trig
    E = B * H * W * V                               # elements per layer
    ops_fwd = (2 * OPS_SINCOS * 2                   # sin+cos of lat', lon'
               + OPS_ASIN + OPS_ATAN2 + OPS_REM + 15)
    ops_bwd = ops_fwd                               # AD pass ~ same weight
    vpu_trig = L * E * (ops_fwd + ops_bwd)
    floor_trig = vpu_trig / VPU_OPS
    # fast-trig path: the four displacement sin/cos become degree-7/8
    # polynomials (~8 ops each) + clips; grid trig is constant-folded
    ops_fwd_fast = 4 * 8 + 4 + OPS_ASIN + OPS_ATAN2 + OPS_REM + 15
    floor_trig_fast = L * E * 2 * ops_fwd_fast / VPU_OPS

    print("## Roofline ledger — flagship train step, batch 1, v5e")
    print()
    print(f"step measured: {fmt(STEP)}  "
          f"(29.0 samples/s; trace attribution below)")
    print()
    print("| component | measured | floor | ach. floor/meas | bound by | verdict |")
    print("|---|---|---|---|---|---|")
    row("advection fwd (8x Pallas)", MEAS["advection fwd (8x Pallas)"],
        floor_fwd, "VPU gen",
        f"{vpu_fwd * L / 1e9:.1f}G VPU ops, {mxu_fwd * L / 1e9:.0f}G MXU FLOP")
    row("advection bwd (8x Pallas)", MEAS["advection bwd (8x Pallas)"],
        floor_bwd, "VPU gen",
        f"{vpu_bwd * L / 1e9:.1f}G VPU ops, {mxu_bwd * L / 1e9:.0f}G MXU FLOP")
    row("NorMuon update", MEAS["NorMuon update"], floor_norm, "MXU",
        "1.46 TFLOP quintic NS, 82% of bf16 peak — at roofline")
    row("departure trig", MEAS["departure trig (8x fwd+bwd)"], floor_trig,
        "VPU transc.",
        f"exact path; fast-trig floor {fmt(floor_trig_fast)}")
    print()

    if not args.cost:
        print(f"tail residual: {fmt(MEAS['tail (everything else)'])} "
              "(run with --cost to account it in bytes/FLOPs)")
        return

    # ------------------------------------------------- whole-step cost analysis
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from paradis_tpu.sphere.geometry import equiangular_lat_lon, latitude_weights
    from paradis_tpu.train.loss import WeightedLoss, pressure_weights
    from paradis_tpu.train.optim import build_optimizer
    from paradis_tpu.train.step import create_train_state, make_train_step

    cfg, model, d = _flagship(tiny=False, training=True)
    cfg.training.optimizer.name = "normuon"
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(
            size=(B, H, W, d["n_common"] * d["n_time"])), jnp.float32),
        "target": jnp.asarray(rng.normal(
            size=(B, 1, H, W, d["output_dim"])), jnp.float32),
        "forcings": jnp.asarray(rng.normal(
            size=(B, 1, H, W, d["n_forcings"] * d["n_time"])), jnp.float32),
        "constants": jnp.asarray(rng.normal(
            size=(B, H, W, d["n_const"])), jnp.float32),
    }
    lat, _ = equiangular_lat_lon(H, W, include_poles=False)
    n_levels = len(cfg.features.pressure_levels)
    fw = np.ones(d["output_dim"], np.float32)
    pw = pressure_weights(np.asarray(cfg.features.pressure_levels))
    n_atmo = len(cfg.features.output.atmospheric) * n_levels
    for i in range(0, n_atmo, n_levels):
        fw[i: i + n_levels] = pw
    loss_fn = WeightedLoss(kind="reversed_huber", feature_weights=fw,
                           lat_weights=latitude_weights(lat).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
    optimizer = build_optimizer(cfg, params)
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer,
                                    donate=False)
    state = create_train_state(params, optimizer)
    compiled = (jax.jit(train_step, static_argnums=2)
                .lower(state, batch, d["n_common"]).compile())
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    transc = ca.get("transcendentals", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    print("### whole-step XLA cost analysis (optimized HLO; Pallas custom")
    print("### calls are opaque to it — their analytic inventory is above)")
    print(f"flops:            {flops / 1e9:10.1f} G   "
          f"-> {fmt(flops / MXU_BF16)} at bf16 peak")
    print(f"transcendentals:  {transc / 1e6:10.1f} M")
    print(f"bytes accessed:   {byts / 2**30:10.2f} GiB "
          f"-> {fmt(byts / HBM_BW)} at HBM peak")
    tail_meas = MEAS["tail (everything else)"]
    tail_flops = flops - NORMUON_FLOP
    # bytes: NorMuon's NS iterates on ~59.6M params in VMEM-resident GEMM
    # tiles; charge it 3 passes over fp32 params as a generous estimate
    tail_bytes = byts - 3 * 59.6e6 * 4
    tail_floor = max(tail_flops / MXU_BF16, tail_bytes / HBM_BW)
    print()
    row("tail (step - named kernels)", tail_meas, tail_floor,
        "HBM" if tail_bytes / HBM_BW > tail_flops / MXU_BF16 else "MXU",
        f"{tail_flops / 1e9:.0f}G FLOP, {tail_bytes / 2**30:.2f} GiB moved")


if __name__ == "__main__":
    main()
