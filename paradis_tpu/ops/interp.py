"""Gather-interpolation at arbitrary departure points (grid_sample semantics).

This is the TPU replacement for the reference's single native-kernel
dependency, ``F.grid_sample`` (reference ``model/advection.py:161-167``,
``align_corners=True``, modes bilinear/bicubic, ATen cubic convolution with
a = -0.75).  Instead of normalized [-1, 1] grid coordinates we take pixel
coordinates directly — the reference normalizes and the kernel immediately
denormalizes, so composing the two is the identity (advection.py:144-150).

Two implementations with identical semantics:

``method="dense"`` (default, the TPU-native formulation): the interpolation
kernel has compact support (2 px bilinear, 4 px bicubic), so instead of
gathering taps we evaluate the kernel *densely* over every padded row/column —
``Wy[p,v,r] = K(pos_y[p,v] − r)`` — and contract:

    T[p,v,c]  = Σ_r Wy[p,v,r] · field[r,c,v]        (batched matmul, MXU)
    out[p,v]  = Σ_c K(pos_x[p,v] − c) · T[p,v,c]    (fused multiply-reduce, VPU)

Zero gathers; everything is matmul + elementwise.  On the 5.625° workload this
is ~1000× faster than the gather path on TPU (dynamic gather lowers to scalar
loops there).

``method="gather"``: the direct formulation via flattened ``take_along_axis``
(4/16 taps) — the validation oracle, and faster on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CUBIC_A = -0.75  # ATen's cubic convolution constant


def _cubic_weights(t: jnp.ndarray):
    """Cubic convolution weights for taps at offsets (-1, 0, 1, 2) from floor.

    ``t`` is the fractional coordinate in [0, 1).  Uses the two-branch cubic
    convolution kernel with A = -0.75, matching torch's bicubic exactly.
    """
    a = CUBIC_A

    def near(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def far(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    w0 = far(t + 1.0)
    w1 = near(t)
    w2 = near(1.0 - t)
    w3 = far(2.0 - t)
    return w0, w1, w2, w3


def _gather2d(flat_field: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray,
              h: int, w: int) -> jnp.ndarray:
    """Gather ``flat_field[b, yi*w + xi, v]`` with index clamping.

    flat_field: [B, h*w, V]; yi/xi: [B, P, V] int32 → [B, P, V].
    """
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    return jnp.take_along_axis(flat_field, yi * w + xi, axis=1)


def _kernel_dense(dist: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Interpolation kernel K(d) evaluated at signed pixel distances.

    Exactly zero outside the support so a dense evaluation over all rows/cols
    reproduces the 4/16-tap stencil bit-for-bit (up to fp rounding).
    """
    d = jnp.abs(dist)
    if mode == "bilinear":
        return jnp.maximum(0.0, 1.0 - d)
    a = CUBIC_A
    near = ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
    far = ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a
    return jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))


def _dense_kernel_derivative(dist: jnp.ndarray, mode: str) -> jnp.ndarray:
    """∂K(d)/∂d at signed pixel distances (piecewise, zero outside support)."""
    d = jnp.abs(dist)
    s = jnp.sign(dist)
    if mode == "bilinear":
        return jnp.where(d < 1.0, -s, 0.0)
    a = CUBIC_A
    near = (3.0 * (a + 2.0) * d - 2.0 * (a + 3.0)) * d
    far = (3.0 * a * d - 10.0 * a) * d + 8.0 * a
    return s * jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))


def _tap_scalars(pos: jnp.ndarray, mode: str, derivative: bool):
    """Per-position tap weights (and optionally their pos-derivatives).

    Returns ``(i0, taps, ws[, dws])`` where the dense weight row is
    ``W[..., r] = Σ_k ws_k · (r == i0 + taps_k)`` — identical values to
    evaluating the piecewise kernel densely (the kernel is exactly zero
    outside the taps), but built from 4 scalar evaluations plus integer
    masks instead of a full polynomial per (position, offset) pair.  The
    masks are shared between W and W' in the backward pass.
    """
    i0 = jnp.floor(pos)
    t = pos - i0
    if mode == "bilinear":
        taps = (0, 1)
        ws = (1.0 - t, t)
        if not derivative:
            return i0, taps, ws
        dws = tuple(_dense_kernel_derivative(t - k, "bilinear") for k in taps)
        return i0, taps, ws, dws
    taps = (-1, 0, 1, 2)
    ws = _cubic_weights(t)
    if not derivative:
        return i0, taps, ws
    dws = tuple(_dense_kernel_derivative(t - k, "bicubic") for k in taps)
    return i0, taps, ws, dws


def _dense_weights_via_taps(pos: jnp.ndarray, size: int, mode: str,
                            derivative: bool = False):
    """Dense [., size] weight rows (and derivatives) from tap scalars.

    Select-LUT expansion: the 4 (2 for bilinear) per-position tap scalars are
    routed to their row offsets through a select tree on ``rel = r − i0``
    instead of per-tap masks + FMA — ~25% fewer VPU ops per weight element
    (0.445 vs 0.576 ms per fused gen+contract at flagship shapes, measured),
    and the backward shares all comparisons between W and W′.
    """
    if derivative:
        i0, taps, ws, dws = _tap_scalars(pos, mode, True)
    else:
        i0, taps, ws = _tap_scalars(pos, mode, False)
    rel = jnp.arange(size, dtype=jnp.float32) - i0[..., None]

    if mode == "bilinear":
        # taps (0, 1): one cmp picks the scalar, one window zeroes the rest
        is0 = rel == 0.0
        inb = is0 | (rel == 1.0)

        def expand(vals):
            v = jnp.where(is0, vals[0][..., None], vals[1][..., None])
            return jnp.where(inb, v, 0.0)
    else:
        # taps (-1, 0, 1, 2): two-level select tree + support window
        ism1 = rel == -1.0
        lo_half = rel <= 0.0
        is1 = rel == 1.0
        inb = (rel >= -1.0) & (rel <= 2.0)

        def expand(vals):
            lo = jnp.where(ism1, vals[0][..., None], vals[1][..., None])
            hi = jnp.where(is1, vals[2][..., None], vals[3][..., None])
            return jnp.where(inb, jnp.where(lo_half, lo, hi), 0.0)

    w = expand(ws)
    if not derivative:
        return w
    return w, expand(dws)


def grid_sample_interp_dense(field: jnp.ndarray, pix_y: jnp.ndarray,
                             pix_x: jnp.ndarray, mode: str = "bicubic") -> jnp.ndarray:
    """Gather-free interpolation via dense separable kernel contraction.

    Custom VJP: the dense kernel matrices are large (O(P·V·(R+C)) per layer)
    but trivially recomputable from the positions, so the backward pass
    regenerates them once and shares them across the three cotangent
    contractions — cheaper than both storing them as residuals (HBM blow-up)
    and remat + autodiff (which regenerates per transposed einsum).
    """
    return _dense_vjp(field, pix_y, pix_x, mode)


import functools as _functools

import jax as _jax


@_functools.partial(_jax.custom_vjp, nondiff_argnums=(3,))
def _dense_vjp(field, pix_y, pix_x, mode):
    return _dense_impl(field, pix_y, pix_x, mode)


def _dense_vjp_fwd(field, pix_y, pix_x, mode):
    return _dense_impl(field, pix_y, pix_x, mode), (field, pix_y, pix_x)


def _dense_vjp_bwd(mode, res, g):
    field, pix_y, pix_x = res
    B, R, C, V = field.shape
    _, H, W, _ = pix_y.shape
    cdt = jnp.float32 if field.dtype == jnp.float32 else (
        jnp.bfloat16 if _jax.default_backend() == "tpu" else jnp.float32)

    py = pix_y.astype(jnp.float32).reshape(B, H * W, V)
    px = pix_x.astype(jnp.float32).reshape(B, H * W, V)
    gf = g.astype(jnp.float32).reshape(B, H * W, V)

    wy, dky = _dense_weights_via_taps(py, R, mode, derivative=True)  # [B,P,V,R]
    wx, dkx = _dense_weights_via_taps(px, C, mode, derivative=True)  # [B,P,V,C]
    fieldT = jnp.moveaxis(field, -1, 1).astype(cdt)                 # [B,V,R,C]

    # d_field[b,v,r,c] = Σ_p wy g wx
    wyg = (wy * gf[..., None]).astype(cdt)
    d_fieldT = jnp.einsum("bpvr,bpvc->bvrc", wyg, wx.astype(cdt),
                          preferred_element_type=jnp.float32)
    d_field = jnp.moveaxis(d_fieldT, 1, -1).astype(field.dtype)

    # d_py = g Σ_r K'y (Σ_c wx f);   d_px = g Σ_c K'x (Σ_r wy f)
    t = jnp.einsum("bpvc,bvrc->bpvr", wx.astype(cdt), fieldT,
                   preferred_element_type=jnp.float32)
    d_py = (gf * jnp.sum(dky * t, axis=-1)).reshape(B, H, W, V).astype(pix_y.dtype)

    u = jnp.einsum("bpvr,bvrc->bpvc", wy.astype(cdt), fieldT,
                   preferred_element_type=jnp.float32)
    d_px = (gf * jnp.sum(dkx * u, axis=-1)).reshape(B, H, W, V).astype(pix_x.dtype)

    return d_field, d_py, d_px


_dense_vjp.defvjp(_dense_vjp_fwd, _dense_vjp_bwd)


def _dense_impl(field: jnp.ndarray, pix_y: jnp.ndarray, pix_x: jnp.ndarray,
                mode: str) -> jnp.ndarray:
    B, R, C, V = field.shape
    _, H, W, _ = pix_y.shape
    out_dtype = field.dtype
    # compute dtype: match the field (bf16 under AMP → MXU passes; fp32 else).
    # CPU's dot kernels lack BF16xBF16=F32 — upcast there.
    import jax

    on_tpu = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if (field.dtype != jnp.float32 and on_tpu) else jnp.float32

    py = pix_y.astype(jnp.float32).reshape(B, H * W, V)
    px = pix_x.astype(jnp.float32).reshape(B, H * W, V)

    wy = _dense_weights_via_taps(py, R, mode).astype(cdt)           # [B,P,V,R]
    wx = _dense_weights_via_taps(px, C, mode).astype(cdt)           # [B,P,V,C]

    fieldT = jnp.moveaxis(field, -1, 1).astype(cdt)                  # [B,V,R,C]
    # batched matmul over (B,V): [P,R] @ [R,C] -> [P,C].  MXU accumulates in
    # fp32 internally; emitting t in the compute dtype halves its HBM traffic.
    t = jnp.einsum("bpvr,bvrc->bpvc", wy, fieldT,
                   preferred_element_type=cdt)
    out = jnp.sum(wx.astype(jnp.float32) * t.astype(jnp.float32), axis=-1)
    return out.reshape(B, H, W, V).astype(out_dtype)


def grid_sample_interp(field: jnp.ndarray, pix_y: jnp.ndarray, pix_x: jnp.ndarray,
                       mode: str = "bicubic", method: str = "dense") -> jnp.ndarray:
    """Sample ``field`` at per-pixel departure coordinates.

    Args:
      field: padded source ``[B, Hp, Wp, V]`` (any float dtype).
      pix_y, pix_x: sample coordinates in pixel units of ``field``,
        shape ``[B, H, W, V]``.  Taps falling outside are index-clamped
        (the reference's coordinates are in-bounds by construction; see
        advection geometry analysis — clamping only guards numerics).
      mode: "bilinear" (4-tap) or "bicubic" (16-tap cubic convolution).

    Returns ``[B, H, W, V]`` in ``field.dtype``.
    """
    if mode not in ("bilinear", "bicubic"):
        raise ValueError(f"mode must be bilinear|bicubic, got {mode!r}")
    if method == "dense":
        return grid_sample_interp_dense(field, pix_y, pix_x, mode)
    if method != "gather":
        raise ValueError(f"method must be dense|gather, got {method!r}")
    B, Hp, Wp, V = field.shape
    _, H, W, _ = pix_y.shape
    out_dtype = field.dtype

    py = pix_y.astype(jnp.float32).reshape(B, H * W, V)
    px = pix_x.astype(jnp.float32).reshape(B, H * W, V)
    flat = field.astype(jnp.float32).reshape(B, Hp * Wp, V)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ty = py - y0
    tx = px - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    if mode == "bilinear":
        wy = (1.0 - ty, ty)
        wx = (1.0 - tx, tx)
        y_off, x_off = (0, 1), (0, 1)
    else:
        wy = _cubic_weights(ty)
        wx = _cubic_weights(tx)
        y_off, x_off = (-1, 0, 1, 2), (-1, 0, 1, 2)

    acc = jnp.zeros_like(py)
    for iy, dy in enumerate(y_off):
        row_w = wy[iy]
        for ix, dx in enumerate(x_off):
            tap = _gather2d(flat, y0 + dy, x0 + dx, Hp, Wp)
            acc = acc + row_w * wx[ix] * tap

    return acc.reshape(B, H, W, V).astype(out_dtype)
