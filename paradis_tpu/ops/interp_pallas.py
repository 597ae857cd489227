"""Pallas TPU kernel: fused semi-Lagrangian gather-interpolation.

Same math as ``ops.interp.grid_sample_interp_dense`` (dense separable kernel
contraction — zero gathers; the TPU replacement for the reference's
``F.grid_sample``, reference ``model/advection.py:161-167``), fused in VMEM
per (channel-group × position-block):

  * the dense kernel weights ``K(pos − i)`` are generated on the VPU and
    consumed immediately by MXU matmuls — they never touch HBM (the XLA path
    materializes O(P·V·R) weights per layer);
  * in-kernel everything is **positions-last** — weights are
    ``[vb, support, P]`` so the 128-lane axis is the 128-aligned position
    count, not the 36/68 support axis (full VPU lanes for weight generation,
    full MXU N-tiles for the contractions);
  * at the HBM boundary all operands keep the model's natural channels-last
    layout (``[B, P, V]`` positions, ``[B, R, C, V]`` field) and the small
    per-block transposes happen in VMEM: inside the model graph the producers
    (convs, departure-point trig) pin channels-last layouts, and a kernel
    demanding channel-major operands forces XLA to insert physical lane
    relayouts worth ~2.5 ms/layer at 5.625° (measured, scripts/bench_model.py);
  * matmul operands are bfloat16 under AMP (the MXU's native input format;
    fp32 dots decompose into multiple passes), accumulation always fp32;
  * a custom VJP regenerates weights once in the backward kernel and emits
    ``d_field``, ``d_py``, ``d_px`` in a single pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paradis_tpu.ops.interp import CUBIC_A

# channels per kernel instance: Mosaic requires lane-dim blocks to be
# 128-divisible or the full axis, and the channel axis sits in lanes at the
# HBM boundary (natural channels-last layout)
_VB = 128
_VMEM_BUDGET = 24 * 2**20  # working-set target per kernel instance (bytes)
_VMEM_LIMIT = 48 * 2**20   # scoped VMEM ceiling handed to Mosaic


def _weights_T(pos, size, mode):
    """Dense kernel columns K(pos − i), positions-last: [vb, size, P] fp32.

    ``pos`` is [vb, P]; the support index i runs over the sublane axis so the
    long position axis sits in the 128-lane dimension.
    """
    vb, P = pos.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (vb, size, P), 1).astype(jnp.float32)
    d = jnp.abs(pos[:, None, :] - idx)
    if mode == "bilinear":
        return jnp.maximum(0.0, 1.0 - d)
    a = CUBIC_A
    near = ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
    far = ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a
    return jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))


def _dweights_T(pos, size, mode):
    """∂K(pos − i)/∂pos, positions-last: [vb, size, P] fp32."""
    vb, P = pos.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (vb, size, P), 1).astype(jnp.float32)
    t = pos[:, None, :] - idx
    d = jnp.abs(t)
    s = jnp.sign(t)
    if mode == "bilinear":
        return jnp.where(d < 1.0, -s, 0.0)
    a = CUBIC_A
    near = (3.0 * (a + 2.0) * d - 2.0 * (a + 3.0)) * d
    far = (3.0 * a * d - 10.0 * a) * d + 8.0 * a
    return s * jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))


def _compute_dtype(field_dtype):
    """Matmul operand dtype: bf16 for sub-fp32 fields (AMP), fp32 otherwise."""
    return jnp.float32 if field_dtype == jnp.float32 else jnp.bfloat16


def _fwd_kernel(field_ref, py_ref, px_ref, out_ref, *, mode, cdt):
    R, C = field_ref.shape[-3], field_ref.shape[-2]
    py = py_ref[0].T                                             # [vb, P]
    px = px_ref[0].T
    f = jnp.transpose(field_ref[0], (2, 0, 1)).astype(cdt)       # [vb, R, C]
    wxT = _weights_T(px, C, mode).astype(cdt)                    # [vb, C, P]
    # t[v,r,p] = Σ_c f[v,r,c] · wxT[v,c,p]  (M=R rows streamed, N=P lanes)
    t = jax.lax.dot_general(
        f, wxT, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                            # [vb, R, P]
    wyT = _weights_T(py, R, mode)                                # [vb, R, P]
    out_ref[0] = jnp.sum(wyT * t, axis=1).T                      # [P, vb]


def _bwd_kernel(field_ref, py_ref, px_ref, g_ref,
                dfield_ref, dpy_ref, dpx_ref, *, mode, cdt):
    R, C = field_ref.shape[-3], field_ref.shape[-2]
    py = py_ref[0].T                                             # [vb, P]
    px = px_ref[0].T
    f = jnp.transpose(field_ref[0], (2, 0, 1)).astype(cdt)       # [vb, R, C]
    g = g_ref[0].T                                               # [vb, P]
    wxT = _weights_T(px, C, mode)                                # [vb, C, P]
    wyT = _weights_T(py, R, mode)                                # [vb, R, P]
    wxc = wxT.astype(cdt)

    # d_field[v,r,c] = Σ_p wyT[v,r,p] g[v,p] wxT[v,c,p], accumulated across
    # position blocks (the grid revisits this output block with p innermost)
    wyg = (wyT * g[:, None, :]).astype(cdt)                      # [vb, R, P]
    partial = jnp.transpose(jax.lax.dot_general(
        wyg, wxc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ), (1, 2, 0)).astype(dfield_ref.dtype)                       # [R, C, vb]

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfield_ref[0] = partial

    @pl.when(pl.program_id(2) != 0)
    def _():
        dfield_ref[0] = dfield_ref[0] + partial

    # d_py[v,p] = g Σ_r K'y[v,r,p] · t[v,r,p],  t = x-interp of f
    t = jax.lax.dot_general(f, wxc, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [vb, R, P]
    dpy_ref[0] = (g * jnp.sum(_dweights_T(py, R, mode) * t, axis=1)).T

    # d_px[v,p] = g Σ_c K'x[v,c,p] · u[v,c,p],  u = y-interp of f
    u = jax.lax.dot_general(f, wyT.astype(cdt), (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [vb, C, P]
    dpx_ref[0] = (g * jnp.sum(_dweights_T(px, C, mode) * u, axis=1)).T


def _pick_vb(V: int) -> int:
    """Lane-legal channel block: 128 when divisible, else the full axis."""
    return _VB if V % _VB == 0 else V


def _pick_pb(P: int, vb: int, R: int, C: int, bwd: bool) -> int:
    """Largest 128-multiple position block whose working set fits VMEM.

    Per position (fp32 words): forward holds wxT[C·1.5] (fp32 gen + cdt
    cast), t[R], wyT[R]; backward additionally holds the derivative rows and
    u[C] (liveness lets the two contraction phases share space).
    """
    per_pos = vb * 4 * (int(1.5 * C) + 2 * R if not bwd
                        else int(3.5 * C) + 3 * R)
    pb = min(P, 2048)
    while pb > 128 and (pb * per_pos > _VMEM_BUDGET or P % pb != 0):
        pb //= 2
    return pb if P % pb == 0 else P


def _fwd_pv(field, py, px, mode, interpret):
    """field [B,R,C,V], py/px [B,P,V] → out [B,P,V] fp32 (natural layouts)."""
    B, R, C, V = field.shape
    P = py.shape[1]
    vb = _pick_vb(V)
    pb = _pick_pb(P, vb, R, C, bwd=False)
    grid = (B, V // vb, P // pb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, mode=mode,
                          cdt=_compute_dtype(field.dtype)),
        out_shape=jax.ShapeDtypeStruct((B, P, V), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, C, vb), lambda b, v, p: (b, 0, 0, v)),
            pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
            pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
        ],
        out_specs=pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(field, py, px)


def _bwd_pv(field, py, px, g, mode, interpret):
    B, R, C, V = field.shape
    P = py.shape[1]
    vb = _pick_vb(V)
    pb = _pick_pb(P, vb, R, C, bwd=True)
    # p is the innermost grid dim: the d_field output block is revisited
    # across p steps and accumulated in place
    grid = (B, V // vb, P // pb)
    dfield, dpy, dpx = pl.pallas_call(
        functools.partial(_bwd_kernel, mode=mode,
                          cdt=_compute_dtype(field.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, C, V), jnp.float32),
            jax.ShapeDtypeStruct((B, P, V), jnp.float32),
            jax.ShapeDtypeStruct((B, P, V), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, C, vb), lambda b, v, p: (b, 0, 0, v)),
            pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
            pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
            pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
        ],
        out_specs=(
            pl.BlockSpec((1, R, C, vb), lambda b, v, p: (b, 0, 0, v)),
            pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
            pl.BlockSpec((1, pb, vb), lambda b, v, p: (b, p, v)),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(field, py, px, g)
    return dfield, dpy, dpx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _interp_pv(field, py, px, mode, interpret):
    return _fwd_pv(field, py, px, mode, interpret)


def _interp_pv_fwd(field, py, px, mode, interpret):
    out = _fwd_pv(field, py, px, mode, interpret)
    return out, (field, py, px)


def _interp_pv_bwd(mode, interpret, res, g):
    field, py, px = res
    dfield, dpy, dpx = _bwd_pv(field, py, px,
                               g.astype(jnp.float32), mode, interpret)
    return dfield.astype(field.dtype), dpy, dpx


_interp_pv.defvjp(_interp_pv_fwd, _interp_pv_bwd)


def grid_sample_interp_pallas(field: jnp.ndarray, pix_y: jnp.ndarray,
                              pix_x: jnp.ndarray, mode: str = "bicubic",
                              interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ``grid_sample_interp`` (channels-last API).

    field ``[B, R, C, V]``, positions ``[B, H, W, V]`` → ``[B, H, W, V]``.
    All reshapes here are layout-preserving (no physical transposes).
    """
    if mode not in ("bilinear", "bicubic"):
        raise ValueError(f"mode must be bilinear|bicubic, got {mode!r}")
    B, R, C, V = field.shape
    _, H, W, _ = pix_y.shape
    py = pix_y.astype(jnp.float32).reshape(B, H * W, V)
    px = pix_x.astype(jnp.float32).reshape(B, H * W, V)
    out = _interp_pv(field, py, px, mode, interpret)           # [B, P, V]
    return out.reshape(B, H, W, V).astype(field.dtype)
