"""Geocyclic padding for equiangular lat-lon grids (spherical boundary).

Semantics match reference ``model/padding.py:4-39``: rows adjacent to each pole
are rolled by 180° in longitude and mirrored across the pole, and the longitude
axis wraps periodically.  Implemented as static-shape ``jnp.roll`` / ``flip`` /
``concatenate`` so XLA fuses it into the consuming convolution — no kernel
needed.

This module is layout-native for TPU: fields are channels-last
``[..., lat, lon, channel]`` so the channel dim rides the 128-lane axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def geocyclic_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Pad a ``[..., H, W, C]`` field by ``pad`` on both spherical boundaries.

    Row 0 is one pole, row H-1 the other (any orientation — the construction is
    symmetric).  Requires an even number of longitudes, as in the reference
    (``model/padding.py:21``).

    Returns a ``[..., H + 2*pad, W + 2*pad, C]`` array.
    """
    if pad == 0:
        return x
    if x.ndim < 3:
        raise ValueError(f"geocyclic_pad expects [..., lat, lon, channel], got {x.shape}")
    H, W = x.shape[-3], x.shape[-2]
    if W % 2 != 0:
        raise ValueError(f"Number of longitude points must be even, got {W}")
    if pad + 1 > H:
        raise ValueError(f"pad={pad} too large for nlat={H}")

    half = W // 2
    lat_ax, lon_ax = x.ndim - 3, x.ndim - 2

    # Mirror rows across each pole with a 180° longitude roll.
    top = jnp.roll(x[..., 1 : pad + 1, :, :], half, axis=lon_ax)
    bottom = jnp.roll(x[..., -(pad + 1) : -1, :, :], half, axis=lon_ax)
    x = jnp.concatenate(
        [jnp.flip(top, axis=lat_ax), x, jnp.flip(bottom, axis=lat_ax)], axis=lat_ax
    )

    # Periodic longitude wrap.
    return jnp.concatenate(
        [x[..., :, -pad:, :], x, x[..., :, :pad, :]], axis=lon_ax
    )
