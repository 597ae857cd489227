"""Microbenchmarks for the advection interpolation backends on the TPU chip.

Times each variant with the chain-slope method (the axon tunnel adds ~33 ms
per host-visible fetch and block_until_ready does not synchronize through
it): every variant is a jitted step threading a tiny scalar carry through
its inputs (defeats CSE / caching), run as a python chain of async
dispatches; per-op time = slope between two chain lengths.

Usage: python scripts/bench_interp.py [--variants a,b,c]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B, H, W, V = 1, 32, 64, 768
PAD = 2
R, C = H + 2 * PAD, W + 2 * PAD
MODE = "bicubic"
N_SHORT, N_LONG = 6, 30


def _inputs(dtype):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.normal(size=(B, R, C, V)), dtype)
    # in-bounds positions of the padded grid (like advection: pix + pad)
    py = jnp.asarray(rng.uniform(PAD, H - 1 + PAD, size=(B, H, W, V)), jnp.float32)
    px = jnp.asarray(rng.uniform(PAD, W - 1 + PAD, size=(B, H, W, V)), jnp.float32)
    return field, py, px


def chain_time(fn, args, n):
    """fn(carry, *args) -> carry; returns wall time of an n-chain."""
    carry = args[0]
    t0 = time.perf_counter()
    for _ in range(n):
        carry = fn(carry, *args[1:])
    float(carry)  # tunnel-synchronizing fetch
    return time.perf_counter() - t0


def slope_ms(fn, args, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        ts = chain_time(fn, args, N_SHORT)
        tl = chain_time(fn, args, N_LONG)
        best = min(best, (tl - ts) / (N_LONG - N_SHORT))
    return best * 1e3


def make_variants():
    import jax
    import jax.numpy as jnp

    from paradis_tpu.ops.interp import grid_sample_interp_dense
    from paradis_tpu.ops.interp_pallas import grid_sample_interp_pallas

    field, py, px = _inputs(jnp.bfloat16)
    out = {}

    def wrap_fwd(interp):
        @jax.jit
        def step(carry, field, py, px):
            o = interp(field, py + carry * 1e-30, px)
            return jnp.sum(o.astype(jnp.float32)) * 1e-30

        return step, (jnp.float32(0.0), field, py, px)

    def wrap_fwdbwd(interp):
        def loss(field, py, px):
            return jnp.sum(interp(field, py, px).astype(jnp.float32))

        g = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def step(carry, field, py, px):
            gf, gy, gx = g(field, py + carry * 1e-30, px)
            return (jnp.sum(gf.astype(jnp.float32)) + jnp.sum(gy) + jnp.sum(gx)) * 1e-30

        return step, (jnp.float32(0.0), field, py, px)

    xla = lambda f, y, x: grid_sample_interp_dense(f, y, x, MODE)
    pal = lambda f, y, x: grid_sample_interp_pallas(f, y, x, MODE)

    out["xla_fwd"] = wrap_fwd(xla)
    out["xla_fwdbwd"] = wrap_fwdbwd(xla)
    out["pallas_fwd"] = wrap_fwd(pal)
    out["pallas_fwdbwd"] = wrap_fwdbwd(pal)

    # weight-generation-only pallas kernel: isolates the VPU cost
    # (positions-last layout: [vb, support, P] — P in lanes)
    import functools

    from jax.experimental import pallas as pl
    from paradis_tpu.ops.interp_pallas import _weights_T

    def genonly_kernel(py_ref, px_ref, out_ref):
        wx = _weights_T(px_ref[0], C, MODE)
        wy = _weights_T(py_ref[0], R, MODE)
        out_ref[0] = jnp.sum(wx, axis=1) + jnp.sum(wy, axis=1)

    def genonly(py_t, px_t):
        vb, pb = 8, 1024  # 2048 overflows scoped VMEM with the select-LUT masks
        grid = (B, V // vb, py_t.shape[-1] // pb)
        return pl.pallas_call(
            genonly_kernel,
            out_shape=jax.ShapeDtypeStruct((B, V, py_t.shape[-1]), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            ],
            out_specs=pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
        )(py_t, px_t)

    py_t = jnp.moveaxis(py.reshape(B, H * W, V), -1, 1)
    px_t = jnp.moveaxis(px.reshape(B, H * W, V), -1, 1)

    @jax.jit
    def gen_step(carry, py_t, px_t):
        o = genonly(py_t + carry * 1e-30, px_t)
        return jnp.sum(o) * 1e-30

    out["pallas_genonly"] = (gen_step, (jnp.float32(0.0), py_t, px_t))

    # matmul-only kernels: isolate the MXU cost of the channel-batched
    # dot_general at different operand dtypes / channel batch sizes
    def mm_kernel(wx_ref, f_ref, out_ref, *, cdt):
        t = jax.lax.dot_general(
            wx_ref[0].astype(cdt), f_ref[0].astype(cdt),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # [vb, P, R]
        out_ref[0] = jnp.sum(t, axis=2)

    def mm_only(cdt, vb, pb):
        P = H * W
        rng2 = np.random.default_rng(1)
        wx_full = jnp.asarray(rng2.normal(size=(B, V, P, C)), jnp.float32)
        f_full = jnp.asarray(rng2.normal(size=(B, V, R, C)), jnp.float32)
        grid = (B, V // vb, P // pb)
        call = pl.pallas_call(
            functools.partial(mm_kernel, cdt=cdt),
            out_shape=jax.ShapeDtypeStruct((B, V, P), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, vb, pb, C), lambda b, v, p: (b, v, p, 0)),
                pl.BlockSpec((1, vb, R, C), lambda b, v, p: (b, v, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
        )

        @jax.jit
        def step(carry, wx, f):
            o = call(wx + carry * 1e-30, f)
            return jnp.sum(o) * 1e-30

        return step, (jnp.float32(0.0), wx_full, f_full)

    out["mm_f32_vb8"] = mm_only(jnp.float32, 8, 1024)
    out["mm_bf16_vb8"] = mm_only(jnp.bfloat16, 8, 1024)
    out["mm_bf16_vb32"] = mm_only(jnp.bfloat16, 32, 256)
    out["mm_bf16_vb128"] = mm_only(jnp.bfloat16, 128, 128)

    # transposed matmul-only: [vb,R,C] @ [vb,C,P] (small-M stream, N=P lanes)
    def mmT_kernel(wxT_ref, f_ref, out_ref, *, cdt):
        t = jax.lax.dot_general(
            f_ref[0].astype(cdt), wxT_ref[0].astype(cdt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # [vb, R, P]
        out_ref[0] = jnp.sum(t, axis=1)

    def mmT_only(cdt, vb, pb):
        P = H * W
        rng2 = np.random.default_rng(1)
        wxT_full = jnp.asarray(rng2.normal(size=(B, V, C, P)), jnp.float32)
        f_full = jnp.asarray(rng2.normal(size=(B, V, R, C)), jnp.float32)
        grid = (B, V // vb, P // pb)
        call = pl.pallas_call(
            functools.partial(mmT_kernel, cdt=cdt),
            out_shape=jax.ShapeDtypeStruct((B, V, P), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, vb, C, pb), lambda b, v, p: (b, v, 0, p)),
                pl.BlockSpec((1, vb, R, C), lambda b, v, p: (b, v, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
        )

        @jax.jit
        def step(carry, wxT, f):
            o = call(wxT + carry * 1e-30, f)
            return jnp.sum(o) * 1e-30

        return step, (jnp.float32(0.0), wxT_full, f_full)

    out["mmT_bf16_vb8"] = mmT_only(jnp.bfloat16, 8, 1024)

    # ---- backward-split microbenches -------------------------------------
    # Decompose the bwd kernel's ~1.02 ms/layer into its derivative
    # weight-gen (VPU) and dot/reduce (MXU+VPU) phases, at the REAL bwd
    # blocking (pb from _pick_pb(bwd=True)), to measure whether Mosaic
    # overlaps the phases (full bwd << gen + mm) or serializes them
    # (full bwd ≈ gen + mm) — the 3 ms ledger gap hinges on this.
    from paradis_tpu.ops.interp_pallas import _pick_pb

    vb_b = 8
    pb_b = _pick_pb(H * W, vb_b, R, C, bwd=True, rw=0)

    def bwd_gen_kernel(py_ref, px_ref, out_ref):
        wx, dwx = _weights_T(px_ref[0], C, MODE, derivative=True)
        wy, dwy = _weights_T(py_ref[0], R, MODE, derivative=True)
        out_ref[0] = (jnp.sum(wx, axis=1) + jnp.sum(dwx, axis=1)
                      + jnp.sum(wy, axis=1) + jnp.sum(dwy, axis=1))

    def bwd_gen(py_t, px_t):
        P = py_t.shape[-1]
        grid = (B, V // vb_b, P // pb_b)
        return pl.pallas_call(
            bwd_gen_kernel,
            out_shape=jax.ShapeDtypeStruct((B, V, P), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
            ],
            out_specs=pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
        )(py_t, px_t)

    @jax.jit
    def bwd_gen_step(carry, py_t, px_t):
        o = bwd_gen(py_t + carry * 1e-30, px_t)
        return jnp.sum(o) * 1e-30

    out["bwd_genonly"] = (bwd_gen_step, (jnp.float32(0.0), py_t, px_t))

    def bwd_mm_kernel(field_ref, py_ref, px_ref, g_ref,
                      dfield_ref, dpy_ref, dpx_ref, *, cdt):
        R_, C_ = field_ref.shape[-2], field_ref.shape[-1]
        P_ = py_ref.shape[-1]
        vb = py_ref.shape[1]
        py2 = py_ref[0]
        px2 = px_ref[0]
        g2 = g_ref[0]
        f = field_ref[0].astype(cdt)
        # near-free stand-in weights (~1 VPU op/elem instead of the ~20-op
        # derivative select-LUT pair): isolates the dots + reduces
        # Mosaic only lowers integer iota: build int32 and convert
        wy = py2[:, None, :] * jax.lax.broadcasted_iota(
            jnp.int32, (vb, R_, P_), 1).astype(jnp.float32)
        dwy = wy * 0.5
        wxa = px2[:, None, :] * jax.lax.broadcasted_iota(
            jnp.int32, (vb, C_, P_), 1).astype(jnp.float32)
        wx2 = jnp.concatenate([wxa, wxa * 0.5], axis=-1).astype(cdt)
        tt = jax.lax.dot_general(f, wx2, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dpy_ref[0] = g2 * jnp.sum(dwy * tt[..., :P_], axis=1)
        dpx_ref[0] = g2 * jnp.sum(wy * tt[..., P_:], axis=1)
        wyg = (wy * g2[:, None, :]).astype(cdt)
        partial = jax.lax.dot_general(
            wyg, wx2[..., :P_], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == 0)
        def _():
            dfield_ref[0] = partial

        @pl.when(pl.program_id(2) != 0)
        def _():
            dfield_ref[0] = dfield_ref[0] + partial

    def bwd_mm(field_t, py_t2, px_t2, g_t):
        P = py_t2.shape[-1]
        grid = (B, V // vb_b, P // pb_b)
        dfield, dpy, dpx = pl.pallas_call(
            functools.partial(bwd_mm_kernel, cdt=jnp.bfloat16),
            out_shape=(
                jax.ShapeDtypeStruct((B, V, R, C), jnp.float32),
                jax.ShapeDtypeStruct((B, V, P), jnp.float32),
                jax.ShapeDtypeStruct((B, V, P), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, vb_b, R, C), lambda b, v, p: (b, v, 0, 0)),
                pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
            ],
            out_specs=(
                pl.BlockSpec((1, vb_b, R, C), lambda b, v, p: (b, v, 0, 0)),
                pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb_b, pb_b), lambda b, v, p: (b, v, p)),
            ),
        )(field_t, py_t2, px_t2, g_t)
        return dfield, dpy, dpx

    field_t = jnp.moveaxis(field.reshape(B, R, C, V), -1, 1)
    g_t = jnp.ones((B, V, H * W), jnp.float32)

    @jax.jit
    def bwd_mm_step(carry, field_t, py_t, px_t, g_t):
        df, dy, dx = bwd_mm(field_t, py_t + carry * 1e-30, px_t, g_t)
        return (jnp.sum(df) + jnp.sum(dy) + jnp.sum(dx)) * 1e-30

    out["bwd_mmonly"] = (bwd_mm_step,
                         (jnp.float32(0.0), field_t, py_t, px_t, g_t))

    return out


def ns_variant():
    """NorMuon optimizer update on flagship-shaped gradients."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from paradis_tpu.train.optim import build_optimizer

    cfg, model, d = g._flagship(tiny=False)
    cfg.training.optimizer.name = "normuon"
    x = jnp.zeros((1, d["nlat"], d["nlon"], d["input_dim"]), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(1).normal(size=p.shape, scale=1e-2), p.dtype
        ),
        params,
    )

    @jax.jit
    def step(carry, grads, state, params):
        # perturb one leaf to defeat caching
        leaves, treedef = jax.tree_util.tree_flatten(grads)
        leaves[0] = leaves[0] + carry * 1e-30
        grads = jax.tree_util.tree_unflatten(treedef, leaves)
        upd, _ = opt.update(grads, state, params)
        return sum(jnp.sum(u.astype(jnp.float32)) for u in jax.tree.leaves(upd)) * 1e-30

    return step, (jnp.float32(0.0), grads, state, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="all")
    args = ap.parse_args()

    import jax

    print("backend:", jax.default_backend(), flush=True)
    sel = None if args.variants == "all" else set(args.variants.split(","))

    results = {}
    variants = make_variants()
    if sel is None or "ns" in (sel or set()):
        variants["ns_update"] = ns_variant()
    for name, (fn, a) in variants.items():
        if sel is not None and name not in sel and name != "ns_update":
            continue
        t0 = time.perf_counter()
        chain_time(fn, a, 1)  # compile
        compile_s = time.perf_counter() - t0
        ms = slope_ms(fn, a)
        results[name] = ms
        print(f"{name:18s} {ms:8.3f} ms/op   (compile {compile_s:.0f}s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
