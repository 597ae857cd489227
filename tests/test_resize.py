import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.ops.resize import (
    bilinear_resize_align_corners,
    linear_interp_matrix,
    periodic_upsample,
)


def test_interp_matrix_identity():
    np.testing.assert_array_equal(linear_interp_matrix(5, 5), np.eye(5, dtype=np.float32))


def test_interp_matrix_rows_sum_to_one():
    m = linear_interp_matrix(7, 19)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    assert m[0, 0] == 1.0 and m[-1, -1] == 1.0  # endpoints preserved


def test_resize_matches_torch_bilinear_align_corners():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 9, 14, 3)).astype(np.float32)
    out = np.asarray(bilinear_resize_align_corners(jnp.asarray(x), 17, 30))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(
        t, size=(17, 30), mode="bilinear", align_corners=True
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_periodic_upsample_matches_reference_construction():
    """Replicates Paradis.upsample (model/paradis.py:208-220) against torch."""
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(1).normal(size=(1, 8, 16, 4)).astype(np.float32)
    out = np.asarray(periodic_upsample(jnp.asarray(x), 15, 32))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    t_ext = torch.cat([t, t[..., :1]], dim=-1)
    ref = torch.nn.functional.interpolate(
        t_ext, size=(15, 33), mode="bilinear", align_corners=True
    )[..., :-1].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_periodic_upsample_identity_when_same_size():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 16, 4)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(periodic_upsample(x, 8, 16)), np.asarray(x))
