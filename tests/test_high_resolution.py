"""High-resolution configs (the 1.40625° stress axis, BASELINE.md configs[3]).

Exercises geocyclic padding, departure-point math, and the model forward at a
128x256 grid (channel widths shrunk for CPU), plus the interp backend chooser.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from paradis_tpu.model.paradis import Paradis
from paradis_tpu.ops import advection
from paradis_tpu.sphere.geometry import equiangular_lat_lon
from paradis_tpu.sphere.padding import geocyclic_pad

pytestmark = pytest.mark.slow  # integration-scale; fast lane = -m 'not slow'


def test_geocyclic_pad_at_quarter_degree_shape():
    x = jnp.zeros((1, 721, 1440, 2), jnp.float32)
    y = geocyclic_pad(x, 2)
    assert y.shape == (1, 725, 1444, 2)


def test_forward_at_1p4_degree_grid():
    lat, lon = equiangular_lat_lon(128, 256, include_poles=False)
    m = Paradis(
        input_dim=12, output_dim=6, n_static=4,
        lat_deg=tuple(lat), lon_deg=tuple(lon),
        hidden_dim=8, num_vels=2, num_layers=1,
        velocity_hidden=4, reaction_hidden=4, output_hidden=4,
        bias_channels=2, bias_rank=4, coarsening_factor=2,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 128, 256, 12)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 128, 256, 6)
    assert np.isfinite(np.asarray(y)).all()


def test_auto_backend_dispatch(monkeypatch):
    calls = {}

    def fake_dense(field, py, px, mode, method="dense"):
        calls["impl"] = "xla"
        return jnp.zeros(py.shape, field.dtype)

    monkeypatch.setattr(advection, "grid_sample_interp", fake_dense)

    # small problem on CPU → xla
    field = jnp.zeros((1, 12, 20, 4), jnp.float32)
    py = jnp.zeros((1, 8, 16, 4), jnp.float32)
    advection.interpolate(field, py, py, "bicubic", "auto")
    assert calls["impl"] == "xla"

    # huge problem on CPU still → xla (pallas needs the TPU backend)
    field_big = jnp.zeros((1, 136, 264, 768), jnp.bfloat16)
    py_big = jnp.zeros((1, 128, 2048, 768), jnp.bfloat16)
    # don't actually allocate — only the chooser matters; shapes drive it
    weight_elems = 1 * (128 * 2048) * 768 * (136 + 264)
    assert weight_elems > 2**28
    calls.clear()
    advection.interpolate(field_big, py_big, py_big, "bicubic", "auto")
    assert calls["impl"] == "xla"  # cpu backend keeps xla
