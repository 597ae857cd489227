"""Custom VJP of the dense interpolation ≡ autodiff of the raw implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.ops.interp import _dense_impl, grid_sample_interp_dense


def _setup(B=2, Hp=12, Wp=16, V=3, H=6, W=8, seed=0):
    rng = np.random.default_rng(seed)
    field = jnp.asarray(rng.normal(size=(B, Hp, Wp, V)), jnp.float32)
    # fractional positions away from kernel-piece boundaries
    py = jnp.asarray(np.floor(rng.uniform(2, Hp - 3, size=(B, H, W, V))) + 0.37,
                     jnp.float32)
    px = jnp.asarray(np.floor(rng.uniform(2, Wp - 3, size=(B, H, W, V))) + 0.61,
                     jnp.float32)
    return field, py, px


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_custom_vjp_matches_autodiff(mode):
    field, py, px = _setup()

    def loss_custom(f, y, x):
        return jnp.sum(grid_sample_interp_dense(f, y, x, mode) ** 2)

    def loss_auto(f, y, x):
        return jnp.sum(_dense_impl(f, y, x, mode) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(field, py, px)
    g2 = jax.grad(loss_auto, argnums=(0, 1, 2))(field, py, px)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-4)


def test_forward_unchanged():
    field, py, px = _setup(seed=5)
    a = np.asarray(grid_sample_interp_dense(field, py, px, "bicubic"))
    b = np.asarray(_dense_impl(field, py, px, "bicubic"))
    np.testing.assert_allclose(a, b, atol=1e-6)
