"""Pallas TPU kernel: fused semi-Lagrangian gather-interpolation.

Same math as ``ops.interp.grid_sample_interp_dense`` (dense separable kernel
contraction — zero gathers; the TPU replacement for the reference's
``F.grid_sample``, reference ``model/advection.py:161-167``), fused in VMEM
per (channel-group × position-block):

  * the dense kernel weights ``K(pos − i)`` are generated on the VPU and
    consumed immediately by MXU matmuls — they never touch HBM.  This is the
    only viable backend at high resolution: at 1.40625° the XLA dense path
    would materialize ≈6.6 GB of weights per layer, so the auto-dispatch
    (ops/advection.py) selects this kernel there and the XLA path at 5.625°
    (where it wins in-model, scripts/bench_model.py);
  * in-kernel everything is **positions-last** — weights are
    ``[vb, support, P]`` so the 128-lane axis is the 128-aligned position
    count, not the 36/68 support axis (full VPU lanes for weight generation,
    full MXU N-tiles for the contractions; the support-in-lanes layout
    measured 3× slower on weight generation alone);
  * operands are channel-major at the HBM boundary (``[B, V, P]`` positions,
    ``[B, V, R, C]`` field) so the channel block ``vb`` stays small (8): a
    channels-last boundary would put ``vb`` in the lane dimension, forcing
    vb=128 and a VMEM working set that cannot fit high-resolution grids;
  * matmul operands are bfloat16 under AMP (the MXU's native input format;
    fp32 dots decompose into multiple passes), accumulation always fp32;
  * a custom VJP regenerates weights once in the backward kernel and emits
    ``d_field``, ``d_py``, ``d_px`` in a single pass;
  * the position block is processed in statically-unrolled SUB-BLOCKS
    (default ``pb/128``, ``_pick_pb_sub``): each sub-block's VPU weight
    generation is dataflow-independent of the previous sub-block's MXU
    dots, so Mosaic overlaps them, and the per-sub-block weight working set
    is what VMEM must hold — which lets the position block itself grow
    (128 → 1024 at 1.40625°), amortizing per-instance overhead.  Measured
    v5e ladder (BASELINE.md round 5): 1.40625° step 1046 → 933 ms,
    flagship 5.625° 29.6 → 31.6 samples/s.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from paradis_tpu.ops.interp import _tap_scalars

# channels per kernel instance (batch dim of the in-kernel dot_generals;
# second-to-last block dim of the [B, V, P] operands → multiple of 8)
_VB = 8
_VMEM_BUDGET = 12 * 2**20  # working-set target per kernel instance (bytes;
# the Mosaic scoped-vmem limit is 16 MB — 12 MB of estimated working set
# keeps slack for scheduling copies while halving the instance count at
# flagship shapes vs 10 MB (bwd pb 512→1024: ~14% faster, per-instance
# weight-generation overhead amortizes)

# Row chunking (EXPERIMENTAL, off by default — set PARADIS_INTERP_CHUNK):
# the dense y-contraction costs O(R) per position but each position's kernel
# touches only 4 rows (2 bilinear), clustered around the position block's
# latitude band, so the kernels can process the padded rows in static
# rw-row chunks guarded by ``pl.when(chunk ∩ [min tap row, max tap row] ≠
# ∅)`` — exact for arbitrary displacements.  Measured on v5e it LOSES at
# every size, even at near-zero displacements where the fewest chunks fire:
# flagship 5.625° 28.9 → 25.1 samples/s (rw=8 pb=256); 1.40625° step 1060 →
# 1170 ms (rw=32) / 1195 ms (rw=16) at pb=128.  The guard branches break
# Mosaic's scheduling/pipelining by more than the smaller f·wx GEMMs save,
# and each unrolled ``pl.when`` scope keeps its own stack slots live (rw-
# based VMEM sizing OOMed the 16 MB scoped limit).  Kept behind the env
# knob for future-hardware A/Bs; auto-dispatch never chunks.
_CHUNK_ROWS = 32

# Dead end (measured, v5e): generating the expanded weight tensors directly
# in bfloat16 ("GEN16") cannot compile on the target.  bf16 selects need
# masks in the 16-bit-packed layout, but Mosaic can neither relayout the
# 32-bit-packed masks fp32 comparisons produce ("Invalid relayout ...
# vector<...xi1>") nor compare 16-bit types at all ("Target does not support
# this comparison" for both bf16 and int16 operands).  The only compiling
# formulation — select in fp32, cast the result — is exactly what the
# kernels already do via ``.astype(cdt)`` before the dots.


def _weights_T(pos, size, mode, derivative=False, row0=0):
    """Dense kernel columns K(pos − i), positions-last: [vb, size, P] fp32.

    ``pos`` is [vb, P]; the support index i runs over the sublane axis so the
    long position axis sits in the 128-lane dimension.  Same select-LUT
    expansion as ``interp._dense_weights_via_taps``: the 4 (2 bilinear) tap
    scalars are O(P) polynomial evaluations, routed to their rows through a
    select tree on ``rel = i − i0`` — far fewer VPU ops per [size, P] element
    than evaluating the piecewise cubic densely, and with ``derivative=True``
    all comparisons are shared between K and K′ (one pass for the backward).

    ``row0`` offsets the support rows: the result covers rows
    ``[row0, row0 + size)`` of the full grid — the row-chunked kernels pass a
    static chunk start, the row-banded kernels a traced per-band start.
    """
    vb, P = pos.shape
    if derivative:
        i0, _, ws, dws = _tap_scalars(pos, mode, True)
    else:
        i0, _, ws = _tap_scalars(pos, mode, False)
    idx = jax.lax.broadcasted_iota(
        jnp.int32, (vb, size, P), 1).astype(jnp.float32)
    rel = (idx + jnp.asarray(row0, jnp.float32)) - i0[:, None, :]

    if mode == "bilinear":
        is0 = rel == 0
        inb = is0 | (rel == 1)

        def expand(vals):
            v = jnp.where(is0, vals[0][:, None, :], vals[1][:, None, :])
            return jnp.where(inb, v, 0.0)
    else:
        ism1 = rel == -1
        lo_half = rel <= 0
        is1 = rel == 1
        inb = (rel >= -1) & (rel <= 2)

        def expand(vals):
            lo = jnp.where(ism1, vals[0][:, None, :], vals[1][:, None, :])
            hi = jnp.where(is1, vals[2][:, None, :], vals[3][:, None, :])
            return jnp.where(inb, jnp.where(lo_half, lo, hi), 0.0)

    if not derivative:
        return expand(ws)
    return expand(ws), expand(dws)


def _compute_dtype(field_dtype):
    """Matmul operand dtype: bf16 for sub-fp32 fields (AMP), fp32 otherwise."""
    return jnp.float32 if field_dtype == jnp.float32 else jnp.bfloat16


def _fwd_contrib(f, wxT, py, mode, r0, rw, cdt):
    """Rows [r0, r0+rw)'s contribution to the interpolated output.

    ``f`` is the row slice [vb, rw, C] (cdt); t[v,r,p] = Σ_c f·wxT (M=rw rows
    streamed, N=P lanes), reduced against the y-weights of those rows.
    """
    t = jax.lax.dot_general(
        f, wxT, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                            # [vb, rw, P]
    wyT = _weights_T(py, rw, mode, row0=r0)                      # [vb, rw, P]
    return jnp.sum(wyT * t, axis=1)                              # [vb, P]


def _bwd_contrib(f, wx2, py, g, mode, r0, rw, P, cdt, out_dtype):
    """Rows [r0, r0+rw)'s contribution to (d_py, d_px, d_field rows).

    One x-contraction serves both position cotangents: [wx | dwx] stacked
    along the lane axis so a single [rw,C]@[C,2P] dot yields t = f·wx (for
    d_py) and tdx = f·dwx (for d_px, replacing a separate u = f·wy dot since
    d_px = g Σ_r wy·tdx ≡ g Σ_c dwx·u) — 2/3 the MXU FLOPs of three small
    dots and twice the N per issue.
    """
    wyT, dwyT = _weights_T(py, rw, mode, derivative=True, row0=r0)
    tt = jax.lax.dot_general(f, wx2, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [vb, rw, 2P]
    dpy = g * jnp.sum(dwyT * tt[..., :P], axis=1)
    dpx = g * jnp.sum(wyT * tt[..., P:], axis=1)
    # d_field[v,r,c] = Σ_p wyT[v,r,p] g[v,p] wxT[v,c,p] over this p block
    wyg = (wyT * g[:, None, :]).astype(cdt)                      # [vb, rw, P]
    partial = jax.lax.dot_general(
        wyg, wx2[..., :P], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)                                          # [vb, rw, C]
    return dpy, dpx, partial


def _fwd_kernel(field_ref, py_ref, px_ref, out_ref, *, mode, cdt, n_sub=1):
    """Unchunked forward, optionally software-pipelined over position
    sub-blocks.

    ``n_sub > 1`` splits the position block into statically-unrolled
    sub-blocks: each sub-block's (VPU) weight generation is an independent
    dataflow chain from the previous sub-block's (MXU) contraction, so Mosaic
    can overlap gen(i+1) with dots(i) instead of serializing one monolithic
    gen-then-dot body.  No ``pl.when`` guards, no dynamic slices — distinct
    from the recorded row-chunking/banding dead ends.
    """
    R, C = field_ref.shape[-2], field_ref.shape[-1]
    P = py_ref.shape[-1]
    f = field_ref[0].astype(cdt)                                 # [vb, R, C]
    sp = P // n_sub
    for s in range(n_sub):
        sl = slice(s * sp, (s + 1) * sp)
        py = py_ref[0, :, sl]                                    # [vb, sp]
        px = px_ref[0, :, sl]
        wxT = _weights_T(px, C, mode).astype(cdt)                # [vb, C, sp]
        out_ref[0, :, sl] = _fwd_contrib(f, wxT, py, mode, 0, R, cdt)


def _bwd_kernel(field_ref, py_ref, px_ref, g_ref,
                dfield_ref, dpy_ref, dpx_ref, *, mode, cdt, n_sub=1):
    """Unchunked backward; ``n_sub`` as in :func:`_fwd_kernel` (the d_field
    partials of the sub-blocks sum associatively before the cross-position-
    block accumulation)."""
    R, C = field_ref.shape[-2], field_ref.shape[-1]
    P = py_ref.shape[-1]
    f = field_ref[0].astype(cdt)                                 # [vb, R, C]
    sp = P // n_sub
    acc = None
    for s in range(n_sub):
        sl = slice(s * sp, (s + 1) * sp)
        py = py_ref[0, :, sl]                                    # [vb, sp]
        px = px_ref[0, :, sl]
        g = g_ref[0, :, sl]
        wxT, dwxT = _weights_T(px, C, mode, derivative=True)     # [vb, C, sp]
        wx2 = jnp.concatenate([wxT, dwxT], axis=-1).astype(cdt)  # [vb, C, 2sp]
        dpy, dpx, partial = _bwd_contrib(f, wx2, py, g, mode, 0, R, sp, cdt,
                                         dfield_ref.dtype)
        dpy_ref[0, :, sl] = dpy
        dpx_ref[0, :, sl] = dpx
        acc = partial if acc is None else acc + partial

    # d_field accumulates across position blocks (the grid revisits this
    # output block with p innermost)
    @pl.when(pl.program_id(2) == 0)
    def _():
        dfield_ref[0] = acc

    @pl.when(pl.program_id(2) != 0)
    def _():
        dfield_ref[0] = dfield_ref[0] + acc


def _tap_row_range(pos, mode):
    """Block-level scalars (lo, hi): the inclusive row range of nonzero taps."""
    t_lo, t_hi = (-1.0, 2.0) if mode == "bicubic" else (0.0, 1.0)
    lo = jnp.floor(jnp.min(pos)) + t_lo
    hi = jnp.floor(jnp.max(pos)) + t_hi
    return lo, hi


def _fwd_kernel_chunked(field_ref, py_ref, px_ref, out_ref, *, mode, cdt, rw):
    Rp, C = field_ref.shape[-2], field_ref.shape[-1]
    py = py_ref[0]                                               # [vb, P]
    px = px_ref[0]
    wxT = _weights_T(px, C, mode).astype(cdt)                    # [vb, C, P]
    lo, hi = _tap_row_range(py, mode)
    out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)
    for k in range(Rp // rw):
        r0 = k * rw

        @pl.when((lo <= float(r0 + rw - 1)) & (hi >= float(r0)))
        def _(r0=r0):
            f = field_ref[0, :, r0:r0 + rw, :].astype(cdt)       # [vb, rw, C]
            out_ref[0] = out_ref[0] + _fwd_contrib(f, wxT, py, mode, r0, rw,
                                                   cdt)


def _bwd_kernel_chunked(field_ref, py_ref, px_ref, g_ref,
                        dfield_ref, dpy_ref, dpx_ref, *, mode, cdt, rw):
    Rp, C = field_ref.shape[-2], field_ref.shape[-1]
    P = py_ref.shape[-1]
    py = py_ref[0]                                               # [vb, P]
    px = px_ref[0]
    g = g_ref[0]                                                 # [vb, P]
    wxT, dwxT = _weights_T(px, C, mode, derivative=True)         # [vb, C, P]
    wx2 = jnp.concatenate([wxT, dwxT], axis=-1).astype(cdt)      # [vb, C, 2P]
    lo, hi = _tap_row_range(py, mode)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfield_ref[0] = jnp.zeros(dfield_ref.shape[1:], dfield_ref.dtype)

    dpy_ref[0] = jnp.zeros(dpy_ref.shape[1:], dpy_ref.dtype)
    dpx_ref[0] = jnp.zeros(dpx_ref.shape[1:], dpx_ref.dtype)
    for k in range(Rp // rw):
        r0 = k * rw

        @pl.when((lo <= float(r0 + rw - 1)) & (hi >= float(r0)))
        def _(r0=r0):
            f = field_ref[0, :, r0:r0 + rw, :].astype(cdt)       # [vb, rw, C]
            dpy, dpx, partial = _bwd_contrib(f, wx2, py, g, mode, r0, rw, P,
                                             cdt, dfield_ref.dtype)
            dpy_ref[0] = dpy_ref[0] + dpy
            dpx_ref[0] = dpx_ref[0] + dpx
            dfield_ref[0, :, r0:r0 + rw, :] = (
                dfield_ref[0, :, r0:r0 + rw, :] + partial)


def _chunk_rows(R: int, override) -> int:
    """Row-chunk size for this grid (0 = unchunked).

    Priority: explicit ``chunk_rows`` argument, then the
    ``PARADIS_INTERP_CHUNK`` env var (benchmark A/B switch).  Default is
    always unchunked — chunking measured slower at every size (see the
    dead-end note at _CHUNK_ROWS).
    """
    if override is not None:
        return int(override)
    env = os.environ.get("PARADIS_INTERP_CHUNK")
    if env is not None:
        return int(env)
    return 0


def _n_sub(pb: int, default: int = 1) -> int:
    """Position sub-blocks per kernel instance (software-pipelining factor).

    ``PARADIS_INTERP_SUBBLOCK`` overrides (chip A/B knob).  Each sub-block
    must stay a 128-multiple of positions (full lanes); factors that don't
    divide are rounded down.
    """
    env = os.environ.get("PARADIS_INTERP_SUBBLOCK")
    n = int(env) if env else default
    while n > 1 and (pb % n or (pb // n) % 128):
        n //= 2
    return max(n, 1)


# Positions per sub-block under the sub-blocked default (one full MXU
# N-tile).  Measured on v5e (BASELINE.md round-5 A/B ladder): sub-blocking
# unlocks LARGER position blocks — the per-sub-block weight working set is
# what VMEM must hold, so pb rises from 128 to 1024+ at 1.40625° — and each
# gen(i+1) chain is independent of dots(i), recovering MXU/VPU overlap that
# the monolithic gen-then-dot body serialized.
_SP_TARGET = 128


def _pick_pb_sub(P: int, vb: int, R: int, C: int, bwd: bool) -> tuple[int, int]:
    """(position block, sub-block count) for the sub-blocked default path.

    VMEM model: the weight/temp working set lives PER SUB-BLOCK
    (``_SP_TARGET`` positions), while per-position outputs (positions,
    cotangents) and the field/d_field blocks scale with the full ``pb``.
    """
    env = os.environ.get("PARADIS_INTERP_PB")
    if env:
        forced = int(env)
        if forced > 0 and P % forced == 0:
            return forced, _n_sub(forced, default=forced // _SP_TARGET)
        import warnings

        warnings.warn(f"PARADIS_INTERP_PB={env} ignored: must be a positive "
                      f"divisor of P={P}; using the VMEM heuristic")
    per_pos = vb * 4 * (int(1.5 * C) + 2 * R if not bwd
                        else int(3.5 * C) + 3 * R)
    out_pos = vb * 4 * (5 if bwd else 3)
    fixed = vb * R * C * (10 if bwd else 2)
    # measured caps (1.40625° ladder): bwd peaks at pb=1024 (pb=2048 reads
    # 939 vs 933 ms); fwd at 2048
    pb = min(P, 1024 if bwd else 2048)
    while pb > 128 and (fixed + _SP_TARGET * per_pos + pb * out_pos
                        > _VMEM_BUDGET or P % pb != 0):
        pb //= 2
    return pb, _n_sub(pb, default=pb // _SP_TARGET)


def _pick_vb(V: int) -> int:
    for vb in (_VB, 4, 2, 1):
        if V % vb == 0:
            return vb
    return 1


def _pick_pb(P: int, vb: int, R: int, C: int, bwd: bool, rw: int = 0) -> int:
    """Largest 128-multiple position block whose working set fits VMEM.

    Per position (fp32 words): forward holds wxT[C·1.5] (fp32 gen + cdt
    cast), t[R], wyT[R]; backward additionally holds the derivative rows and
    u[C] (liveness lets the two contraction phases share space).  On top of
    that each instance holds position-independent field blocks: f (bf16) and,
    backward, the fp32 d_field accumulator + bf16 partial — negligible at
    5.625° but ~3 MB at 1.40625°, where omitting them overflowed the 16 MB
    Mosaic scoped-vmem limit at pb=256.

    Row-chunked kernels (``rw > 0``) hold one rw-row chunk of the row-indexed
    temporaries per ``pl.when`` scope, but Mosaic does NOT share stack slots
    across the unrolled chunk scopes: sizing them at rw underestimated the
    stack by ~1.5× and OOMed the 16 MB scoped-vmem limit at 1.40625°
    (measured: modeled 11.5 MB, actual 17.17 MB at rw=32 pb=256).  Count the
    row temporaries at the full padded R — worst case every chunk fires and
    each scope keeps its slots live.
    """
    env = os.environ.get("PARADIS_INTERP_PB")  # experimentation override
    if env:
        forced = int(env)
        if forced > 0 and P % forced == 0:
            return forced
        import warnings

        warnings.warn(f"PARADIS_INTERP_PB={env} ignored: must be a positive "
                      f"divisor of P={P}; using the VMEM heuristic")
    per_pos = vb * 4 * (int(1.5 * C) + 2 * R if not bwd
                        else int(3.5 * C) + 3 * R)
    fixed = vb * R * C * (10 if bwd else 2)
    pb = min(P, 2048)
    while pb > 128 and (fixed + pb * per_pos > _VMEM_BUDGET or P % pb != 0):
        pb //= 2
    return pb if P % pb == 0 else P


def _pad_rows(field_t, R, rw):
    """Zero-pad the row axis to a chunk multiple (padded rows get zero taps)."""
    Rp = -(-R // rw) * rw
    if Rp != R:
        field_t = jnp.pad(field_t, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
    return field_t, Rp


# -- row banding --------------------------------------------------------------
#
# The dense kernels pay O(R) per position on the y-axis (wyT generation, the
# x-contraction's M dimension, the d_field dot) even though each position's
# taps touch ≤4 rows near its ARRIVAL row: positions are row-major, so a
# position block spans a handful of arrival rows, and when the row
# displacement is bounded (|pix_y − arrival_row| ≤ m, enforced by an explicit
# clamp in ``grid_sample_interp_pallas``) every nonzero tap of the block
# provably lies in a static band of ``band_rows = rpb + 2m + O(1)`` rows.
# The banded kernels therefore receive a pre-sliced field
# ``[B, V, n_bands, band_rows, C]`` (overlapping static slices, built once in
# XLA) and run the exact same unchunked kernel body on ``band_rows`` instead
# of ``R`` — no ``pl.when`` guards, no dynamic slicing, so none of the Mosaic
# scheduling loss that killed the row-CHUNKED variants (dead-end note at
# ``_CHUNK_ROWS``).  On paper, at 1.40625° (R=132, band_rows=40) this cuts
# the x-dot and d_field MXU work ~3× and the wyT generation ~3×; at 5.625°
# (R=36) the profitability gate disables it.
#
# DEAD END (measured, v5e, 1.40625° full train step, same-session A/B legs):
# banding LOSES at every variant despite the smaller dots —
#   unbanded 1043–1046 ms | banded fwd+bwd 1058 ms | banded fwd-only 1186 ms.
# The kernel is VPU-bound on the (unshrunk) x-weight generation O(C·P), and
# the XLA-side costs banding adds — the 16-band overlapping field copy
# (~236 MB bf16/layer, built per forward incl. remat replay) and the bwd
# overlap-add that re-reads the full-R d_field accumulator per band
# (~5× d_field bytes) — exceed what the smaller y-axis work saves.  Default
# OFF (``compute.interp_band_rad: 0``); the machinery stays correct and
# tested (tests/test_interp_pallas.py) for future-hardware A/Bs.
#
# Exactness when opted in: positions are clamped to the caller's bound
# (``compute.interp_band_rad`` radians of latitude per layer; 0.3 ≈ 15× the
# largest physical semi-Lagrangian per-layer displacement, so the clamp only
# ever binds unphysical transients) — within the bound, banded and unbanded
# kernels produce identical outputs and gradients.

_BAND_RPB = 8  # arrival rows per band


def _band_spec(H, W, R, mode, max_dy_pix):
    """Static banding plan or None.

    Returns ``(rpb, band_rows, halo_lo, pad, m_pix)``: bands of ``rpb``
    arrival rows, each seeing ``band_rows`` padded field rows starting at
    ``clip(b·rpb + pad − halo_lo, 0, R − band_rows)``.
    """
    if max_dy_pix is None:
        return None
    env = os.environ.get("PARADIS_INTERP_BAND")
    if env is not None and env == "0":
        return None
    rpb = _BAND_RPB
    while rpb > 1 and H % rpb:
        rpb //= 2
    m = int(np.ceil(float(max_dy_pix)))
    lo, hi = (1, 2) if mode == "bicubic" else (0, 1)
    band_rows = -(-(rpb + 2 * m + lo + hi) // 8) * 8  # sublane-align
    pad = (R - H) // 2
    # profitable only when the band is well under the full padded row count
    # (else the slicing/overlap-add overhead outweighs the smaller dots)
    if band_rows * 2 > R and env != "1":
        return None
    if band_rows > R:
        return None
    return (rpb, band_rows, m + lo, pad, float(max_dy_pix))


def _band_starts(spec, R):
    rpb, band_rows, halo_lo, pad, _ = spec
    n_bands = 0
    starts = []
    b = 0
    while True:
        arr0 = b * rpb + pad
        if arr0 >= R - pad:
            break
        starts.append(min(max(arr0 - halo_lo, 0), R - band_rows))
        b += 1
    return starts


def _band_field(field_t, spec):
    """[B,V,R,C] → [B,V,n_bands,band_rows,C] overlapping static row slices."""
    R = field_t.shape[-2]
    _, band_rows, _, _, _ = spec
    bands = [field_t[:, :, r0:r0 + band_rows, :]
             for r0 in _band_starts(spec, R)]
    return jnp.stack(bands, axis=2)


def _band_r0(spec, R, bpb):
    """Traced band start row for this kernel instance (matches _band_starts)."""
    rpb, band_rows, halo_lo, pad, _ = spec
    band = pl.program_id(2) // bpb
    return jnp.clip(band * rpb + pad - halo_lo, 0, R - band_rows)


def _fwd_kernel_banded(field_ref, py_ref, px_ref, out_ref, *, mode, cdt,
                       spec, R_full, bpb):
    band_rows, C = field_ref.shape[-2], field_ref.shape[-1]
    r0 = _band_r0(spec, R_full, bpb)
    py = py_ref[0]                                               # [vb, P]
    px = px_ref[0]
    f = field_ref[0, :, 0].astype(cdt)                           # [vb, br, C]
    wxT = _weights_T(px, C, mode).astype(cdt)                    # [vb, C, P]
    out_ref[0] = _fwd_contrib(f, wxT, py, mode, r0, band_rows, cdt)


def _bwd_kernel_banded(field_ref, py_ref, px_ref, g_ref,
                       dfield_ref, dpy_ref, dpx_ref, *, mode, cdt,
                       spec, R_full, bpb):
    band_rows, C = field_ref.shape[-2], field_ref.shape[-1]
    P = py_ref.shape[-1]
    r0 = _band_r0(spec, R_full, bpb)
    py = py_ref[0]
    px = px_ref[0]
    f = field_ref[0, :, 0].astype(cdt)                           # [vb, br, C]
    g = g_ref[0]
    wxT, dwxT = _weights_T(px, C, mode, derivative=True)
    wx2 = jnp.concatenate([wxT, dwxT], axis=-1).astype(cdt)      # [vb, C, 2P]
    dpy, dpx, partial = _bwd_contrib(f, wx2, py, g, mode, r0, band_rows, P,
                                     cdt, dfield_ref.dtype)
    dpy_ref[0] = dpy
    dpx_ref[0] = dpx

    # the band's d_field block is revisited across this band's position
    # blocks (p innermost): init on the first, accumulate after
    @pl.when(pl.program_id(2) % bpb == 0)
    def _():
        dfield_ref[0, :, 0] = partial

    @pl.when(pl.program_id(2) % bpb != 0)
    def _():
        dfield_ref[0, :, 0] = dfield_ref[0, :, 0] + partial


def _band_pb(P, vb, spec, C, W, bwd):
    """Position block for banded kernels: fits VMEM at band_rows and divides
    the per-band position count."""
    rpb, band_rows, _, _, _ = spec
    band_pos = rpb * W
    pb = _pick_pb(P, vb, band_rows, C, bwd=bwd)
    pb = min(pb, band_pos)
    while band_pos % pb:
        pb //= 2
    return pb, band_pos // pb


def _fwd_tv(field_t, py_t, px_t, mode, interpret, chunk_rows, band=None):
    """field [B,V,R,C], py/px [B,V,P] → out [B,V,P] fp32 (channel-major)."""
    B, V, R, C = field_t.shape
    P = py_t.shape[-1]
    vb = _pick_vb(V)
    if band is not None:
        rpb, band_rows, _, pad, _ = band
        W = P // (R - 2 * pad)  # P = H·W, H = R − 2·pad
        pb, bpb = _band_pb(P, vb, band, C, W, bwd=False)
        fb = _band_field(field_t, band)
        grid = (B, V // vb, P // pb)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_banded, mode=mode,
                              cdt=_compute_dtype(field_t.dtype),
                              spec=band, R_full=R, bpb=bpb),
            out_shape=jax.ShapeDtypeStruct((B, V, P), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, vb, 1, band_rows, C),
                             lambda b, v, p, bpb=bpb: (b, v, p // bpb, 0, 0)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            ],
            out_specs=pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            interpret=interpret,
        )(fb, py_t, px_t)
    rw = _chunk_rows(R, chunk_rows)
    if rw:
        field_t, R = _pad_rows(field_t, R, rw)
        kernel = functools.partial(_fwd_kernel_chunked, rw=rw)
        pb = _pick_pb(P, vb, R, C, bwd=False, rw=rw)
    else:
        pb, ns = _pick_pb_sub(P, vb, R, C, bwd=False)
        kernel = functools.partial(_fwd_kernel, n_sub=ns)
    grid = (B, V // vb, P // pb)
    return pl.pallas_call(
        functools.partial(kernel, mode=mode,
                          cdt=_compute_dtype(field_t.dtype)),
        out_shape=jax.ShapeDtypeStruct((B, V, P), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, vb, R, C), lambda b, v, p: (b, v, 0, 0)),
            pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
        ],
        out_specs=pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
        interpret=interpret,
    )(field_t, py_t, px_t)


def _bwd_tv(field_t, py_t, px_t, g_t, mode, interpret, chunk_rows, band=None):
    B, V, R, C = field_t.shape
    P = py_t.shape[-1]
    vb = _pick_vb(V)
    if band is not None:
        rpb, band_rows, _, pad, _ = band
        W = P // (R - 2 * pad)
        pb, bpb = _band_pb(P, vb, band, C, W, bwd=True)
        fb = _band_field(field_t, band)
        starts = _band_starts(band, R)
        n_bands = len(starts)
        grid = (B, V // vb, P // pb)
        dbands, dpy, dpx = pl.pallas_call(
            functools.partial(_bwd_kernel_banded, mode=mode,
                              cdt=_compute_dtype(field_t.dtype),
                              spec=band, R_full=R, bpb=bpb),
            out_shape=(
                jax.ShapeDtypeStruct((B, V, n_bands, band_rows, C),
                                     jnp.float32),
                jax.ShapeDtypeStruct((B, V, P), jnp.float32),
                jax.ShapeDtypeStruct((B, V, P), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, vb, 1, band_rows, C),
                             lambda b, v, p, bpb=bpb: (b, v, p // bpb, 0, 0)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            ],
            out_specs=(
                pl.BlockSpec((1, vb, 1, band_rows, C),
                             lambda b, v, p, bpb=bpb: (b, v, p // bpb, 0, 0)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
                pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            ),
            interpret=interpret,
        )(fb, py_t, px_t, g_t)
        # overlap-add the per-band d_field contributions (static slices)
        dfield = jnp.zeros((B, V, R, C), jnp.float32)
        for i, r0 in enumerate(starts):
            dfield = dfield.at[:, :, r0:r0 + band_rows, :].add(
                dbands[:, :, i])
        return dfield, dpy, dpx
    rw = _chunk_rows(R, chunk_rows)
    R_out = R
    if rw:
        field_t, R = _pad_rows(field_t, R, rw)
        kernel = functools.partial(_bwd_kernel_chunked, rw=rw)
        pb = _pick_pb(P, vb, R, C, bwd=True, rw=rw)
    else:
        pb, ns = _pick_pb_sub(P, vb, R, C, bwd=True)
        kernel = functools.partial(_bwd_kernel, n_sub=ns)
    # p is the innermost grid dim: the d_field output block is revisited
    # across p steps and accumulated in place
    grid = (B, V // vb, P // pb)
    dfield, dpy, dpx = pl.pallas_call(
        functools.partial(kernel, mode=mode,
                          cdt=_compute_dtype(field_t.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, V, R, C), jnp.float32),
            jax.ShapeDtypeStruct((B, V, P), jnp.float32),
            jax.ShapeDtypeStruct((B, V, P), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, vb, R, C), lambda b, v, p: (b, v, 0, 0)),
            pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
        ],
        out_specs=(
            pl.BlockSpec((1, vb, R, C), lambda b, v, p: (b, v, 0, 0)),
            pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
            pl.BlockSpec((1, vb, pb), lambda b, v, p: (b, v, p)),
        ),
        interpret=interpret,
    )(field_t, py_t, px_t, g_t)
    if R != R_out:
        dfield = dfield[:, :, :R_out, :]
    return dfield, dpy, dpx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _interp_tv(field_t, py_t, px_t, mode, interpret, chunk_rows, band):
    return _fwd_tv(field_t, py_t, px_t, mode, interpret, chunk_rows, band)


def _interp_tv_fwd(field_t, py_t, px_t, mode, interpret, chunk_rows, band):
    out = _fwd_tv(field_t, py_t, px_t, mode, interpret, chunk_rows, band)
    return out, (field_t, py_t, px_t)


def _interp_tv_bwd(mode, interpret, chunk_rows, band, res, g):
    field_t, py_t, px_t = res
    dfield, dpy, dpx = _bwd_tv(field_t, py_t, px_t,
                               g.astype(jnp.float32), mode, interpret,
                               chunk_rows, band)
    return dfield.astype(field_t.dtype), dpy, dpx


_interp_tv.defvjp(_interp_tv_fwd, _interp_tv_bwd)


def grid_sample_interp_pallas(field: jnp.ndarray, pix_y: jnp.ndarray,
                              pix_x: jnp.ndarray, mode: str = "bicubic",
                              interpret: bool = False,
                              chunk_rows: int | None = None,
                              max_dy_pix: float | None = None) -> jnp.ndarray:
    """Drop-in replacement for ``grid_sample_interp`` (channels-last API).

    field ``[B, R, C, V]``, positions ``[B, H, W, V]`` → ``[B, H, W, V]``.
    ``chunk_rows`` overrides the row-chunking heuristic (0 disables,
    None = auto: never chunk).

    ``max_dy_pix``: a caller-provided bound on the row displacement
    ``|pix_y − (arrival row + pad)|`` in pixels.  When given (and the
    banding gate finds it profitable — see ``_band_spec``), positions are
    explicitly clamped to that bound and the row-banded kernels run on a
    small static band of rows per position block instead of all R.
    """
    if mode not in ("bilinear", "bicubic"):
        raise ValueError(f"mode must be bilinear|bicubic, got {mode!r}")
    B, R, C, V = field.shape
    _, H, W, _ = pix_y.shape
    band = _band_spec(H, W, R, mode, max_dy_pix)
    pix_y = pix_y.astype(jnp.float32)
    if band is not None:
        # enforce the bound the banding relies on: arrival padded row ± m
        pad, m = band[3], band[4]
        arr = jax.lax.broadcasted_iota(jnp.float32, (1, H, 1, 1), 1) + pad
        pix_y = jnp.clip(pix_y, arr - m, arr + m)
    field_t = jnp.moveaxis(field, -1, 1)                       # [B, V, R, C]
    py_t = jnp.moveaxis(pix_y.reshape(B, H * W, V), -1, 1)
    px_t = jnp.moveaxis(pix_x.astype(jnp.float32).reshape(B, H * W, V), -1, 1)
    out_t = _interp_tv(field_t, py_t, px_t, mode, interpret, chunk_rows, band)
    out = jnp.moveaxis(out_t, 1, -1).reshape(B, H, W, V)
    return out.astype(field.dtype)
