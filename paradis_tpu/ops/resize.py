"""Separable align-corners bilinear resize as two small matmuls (MXU-native).

Replaces the reference's ``F.interpolate(mode="bilinear", align_corners=True)``
uses (``model/paradis.py:208-220`` latent upsample and ``trainer.py:233-257``
GlobalBias factor resolution transfer).  Because align-corners bilinear is
separable with static weights, we precompute 1-D interpolation matrices and
contract them — dense matmuls instead of gathers, which is the fast path on
TPU for these small sizes.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=64)
def linear_interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic ``[n_out, n_in]`` matrix for align-corners linear interp."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    frac = (pos - lo).astype(np.float64)
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    mat[np.arange(n_out), lo] = 1.0 - frac
    mat[np.arange(n_out), lo + 1] = frac
    return mat.astype(np.float32)


def bilinear_resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize ``[..., H, W, C]`` to ``[..., out_h, out_w, C]``."""
    H, W = x.shape[-3], x.shape[-2]
    if H == out_h and W == out_w:
        return x
    dt = x.dtype
    wy = jnp.asarray(linear_interp_matrix(H, out_h), dtype=dt)
    wx = jnp.asarray(linear_interp_matrix(W, out_w), dtype=dt)
    # precision="highest": interpolation weights must not be bf16-rounded on MXU
    y = jnp.einsum("oh,...hwc->...owc", wy, x, precision="highest")
    return jnp.einsum("ow,...hwc->...hoc", wx, y, precision="highest")


def periodic_upsample(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Longitude-periodic upsample matching reference ``Paradis.upsample``.

    Appends the first longitude column so interpolation sees the 0°/360°
    wrap, resizes to ``(out_h, out_w + 1)`` with align-corners bilinear, and
    drops the duplicated endpoint (``model/paradis.py:208-220``).
    """
    if x.shape[-3] == out_h and x.shape[-2] == out_w:
        return x
    x_ext = jnp.concatenate([x, x[..., :, :1, :]], axis=-2)
    y = bilinear_resize_align_corners(x_ext, out_h, out_w + 1)
    return y[..., :, :-1, :]
