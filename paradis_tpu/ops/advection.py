"""Neural semi-Lagrangian advection on the sphere (the PARADIS signature op).

Per layer (reference ``model/advection.py:7-175``):
  1. down-project the latent state to ``num_vels`` channels,
  2. enforce pole continuity (pole rows become their longitudinal mean,
     advection.py:100-114),
  3. compute departure points: the learned (u, v) act as displacements in a
     per-point rotated spherical frame; transform back to geographic lat/lon
     (advection.py:74-98) and map to pixel coordinates,
  4. geocyclic-pad and gather-interpolate at the departure points
     (grid_sample semantics; advection.py:141-167),
  5. pole-fix again and up-project back to the latent width.

TPU design: departure-point trig runs in float32 on the VPU; the
interpolation is a swappable backend (XLA take_along_axis or a Pallas
kernel); the projections are MXU matmuls in the compute dtype.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from paradis_tpu.ops.blocks import GMBlock
from paradis_tpu.ops.interp import grid_sample_interp
from paradis_tpu.sphere.geometry import rotated_to_latlon
from paradis_tpu.sphere.padding import geocyclic_pad


def enforce_pole_continuity(x: jnp.ndarray) -> jnp.ndarray:
    """Replace each pole row with its longitudinal mean (single scalar/channel)."""
    south = jnp.mean(x[..., :1, :, :], axis=-2, keepdims=True)
    north = jnp.mean(x[..., -1:, :, :], axis=-2, keepdims=True)
    W = x.shape[-2]
    south = jnp.broadcast_to(south, south.shape[:-2] + (W,) + south.shape[-1:])
    north = jnp.broadcast_to(north, north.shape[:-2] + (W,) + north.shape[-1:])
    return jnp.concatenate([south, x[..., 1:-1, :, :], north], axis=-3)


def departure_pixel_coords(u, v, dt, lat_grid, lon_grid,
                           fast_trig: bool = False):
    """Departure points in pixel units of the *unpadded* grid.

    ``u``/``v`` are ``[B, H, W, V]`` latent velocities; ``lat_grid``/
    ``lon_grid`` are ``[H, W]`` radians.  Returns float32 ``(pix_y, pix_x)``
    of the same shape as ``u``.  Matches reference advection.py:131-139.
    ``fast_trig`` selects the bounded-displacement polynomial sin/cos path
    (see :func:`rotated_to_latlon`).
    """
    H, W = lat_grid.shape
    lat_g = lat_grid.astype(jnp.float32)[None, :, :, None]
    lon_g = lon_grid.astype(jnp.float32)[None, :, :, None]
    lon_prime = -u.astype(jnp.float32) * dt
    lat_prime = -v.astype(jnp.float32) * dt
    lat_dep, lon_dep = rotated_to_latlon(lat_prime, lon_prime, lat_g, lon_g,
                                         small_displacement=fast_trig)

    # jnp min/max (not python floats): the grids may be traced under jit;
    # XLA constant-folds these when the grids are compile-time constants.
    min_lat = jnp.min(lat_grid).astype(jnp.float32)
    max_lat = jnp.max(lat_grid).astype(jnp.float32)
    min_lon = jnp.min(lon_grid).astype(jnp.float32)
    max_lon = jnp.max(lon_grid).astype(jnp.float32)
    pix_x = (lon_dep - min_lon) / (max_lon - min_lon) * (W - 1.0)
    pix_y = (lat_dep - min_lat) / (max_lat - min_lat) * (H - 1.0)
    return pix_y, pix_x


def interpolate(field, pix_y, pix_x, mode: str, impl: str = "auto",
                max_dy_pix: float | None = None):
    """Backend dispatch for the gather-interpolation.

    ``auto`` picks by backend and problem size:
      * on TPU the fused Pallas kernel wins the full model both forward-only
        (7.4 vs 7.8 ms) and fwd+bwd (25.9 vs 27.2 ms, scripts/bench_model.py)
        since the select-LUT weight generation + 12 MB VMEM blocks — and it
        is the only viable path at high resolution (the XLA dense
        contraction would materialize ≈6.6 GB of weights/layer at 1.40625°);
      * on CPU/GPU the gather path wins at size, the dense path at toy sizes.
    ``pallas`` / ``xla`` / ``gather`` force a backend.

    ``max_dy_pix`` is part of the op's contract, not a Pallas detail: when
    given, departure rows are clamped to ±``max_dy_pix`` of their arrival row
    on EVERY backend, so a config with ``compute.interp_band_rad`` set cannot
    yield different numerics across impls when the bound binds.
    """
    import jax

    if max_dy_pix is not None:
        H = pix_y.shape[1]
        pad = (field.shape[1] - H) // 2
        arr = jax.lax.broadcasted_iota(jnp.float32, (1, H, 1, 1), 1) + pad
        pix_y = jnp.clip(pix_y.astype(jnp.float32),
                         arr - max_dy_pix, arr + max_dy_pix)
    if impl in ("auto", "auto_train"):
        B, R, C, V = field.shape
        P = pix_y.shape[1] * pix_y.shape[2]
        weight_elems = B * P * V * (R + C)
        if jax.default_backend() == "tpu":
            impl = "pallas"
        else:
            # the dense contraction is an MXU design (trades O(P·V·(R+C))
            # materialized weights for batched GEMMs); on CPU/GPU backends the
            # gather path wins by orders of magnitude at flagship size —
            # except at toy sizes, where the dense path's compile+run is
            # cheap and numerically bit-identical to the TPU configuration
            impl = "gather" if weight_elems > 2**24 else "xla"
    if impl == "pallas":
        from paradis_tpu.ops.interp_pallas import grid_sample_interp_pallas

        return grid_sample_interp_pallas(field, pix_y, pix_x, mode,
                                         max_dy_pix=max_dy_pix)
    if impl == "xla":
        return grid_sample_interp(field, pix_y, pix_x, mode, method="dense")
    if impl == "gather":
        return grid_sample_interp(field, pix_y, pix_x, mode, method="gather")
    raise ValueError(f"advection impl must be auto|pallas|xla|gather, got {impl!r}")


class NeuralSemiLagrangian(nn.Module):
    """Learned semi-Lagrangian transport of the latent state."""

    hidden_dim: int
    num_vels: int
    mesh_size: tuple[int, int]
    down_layers: tuple = ("SepConv",)
    down_hidden: int = 0
    up_layers: tuple = ("CLinear",)
    up_hidden: int = 0
    interpolation: str = "bicubic"
    impl: str = "auto"
    fast_trig: bool = False
    # Row-displacement bound in PIXELS licensing the Pallas row-banded
    # kernels at high resolution (departure rows are clamped to ±bound of
    # the arrival row).  Must be a static Python float — computed by the
    # caller from ``compute.interp_band_rad`` and the latitude spacing
    # (model/paradis.py), NOT derived from the (possibly traced) grid
    # arguments.  None disables banding; it is also auto-disabled where
    # unprofitable (interp_pallas._band_spec).
    band_max_dy_pix: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                 dt: float, lat_grid: jnp.ndarray, lon_grid: jnp.ndarray) -> jnp.ndarray:
        pad = 2 if self.interpolation == "bicubic" else 1

        proj = GMBlock(
            layers=self.down_layers,
            input_dim=self.hidden_dim,
            output_dim=self.num_vels,
            hidden_dim=self.down_hidden,
            mesh_size=self.mesh_size,
            dtype=self.dtype,
            name="down_projection",
        )(hidden)

        proj = enforce_pole_continuity(proj)

        pix_y, pix_x = departure_pixel_coords(u, v, dt, lat_grid, lon_grid,
                                              fast_trig=self.fast_trig)
        # Named for remat offload policies (model/paradis.py _remat_policy):
        # the positions are the interp VJP's residuals — saving them lets a
        # rematerialized layer skip the velocity-net + departure-trig replay.
        pix_y = checkpoint_name(pix_y, "advect_pos")
        pix_x = checkpoint_name(pix_x, "advect_pos")

        padded = geocyclic_pad(proj, pad)
        out = interpolate(
            padded, pix_y + pad, pix_x + pad, self.interpolation, self.impl,
            max_dy_pix=self.band_max_dy_pix,
        )
        # Saving the interp output skips the (VPU-bound, weight-regenerating)
        # gather-interpolate FORWARD during backward replay — at 1.40625°
        # that forward is the hottest op under remat.
        out = checkpoint_name(out, "advect_interp")

        out = enforce_pole_continuity(out)

        return GMBlock(
            layers=self.up_layers,
            input_dim=self.num_vels,
            output_dim=self.hidden_dim,
            hidden_dim=self.up_hidden,
            mesh_size=self.mesh_size,
            dtype=self.dtype,
            name="up_projection",
        )(out)
