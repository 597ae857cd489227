import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.ops.blocks import (
    ChannelNorm,
    CLinear,
    GlobalBias,
    GMBlock,
    PhysicalDownsample,
    SepConv,
)

KEY = jax.random.PRNGKey(0)


def _x(B=2, H=8, W=12, C=16, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(B, H, W, C)), jnp.float32)


def test_clinear_shape_and_init_scale():
    x = _x(C=64)
    m = CLinear(32)
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 12, 32)
    k = params["params"]["conv"]["kernel"]
    # kaiming fan_in relu: std ≈ sqrt(2/64)
    assert abs(float(jnp.std(k)) - np.sqrt(2 / 64)) < 0.05


def test_sepconv_shape_preserved():
    x = _x(C=16)
    m = SepConv(24, kernel_size=5)
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 12, 24)


def test_sepconv_constant_field_invariance():
    """Geo-padded depthwise conv of a constant field stays constant."""
    x = jnp.ones((1, 8, 12, 4), jnp.float32)
    m = SepConv(4, kernel_size=3)
    params = m.init(KEY, x)
    y = np.asarray(m.apply(params, x))
    for c in range(4):
        np.testing.assert_allclose(y[..., c], y[0, 0, 0, c], rtol=1e-5)


def test_channelnorm_matches_torch_var_mean():
    torch = pytest.importorskip("torch")
    x = _x(C=32)
    m = ChannelNorm()
    params = m.init(KEY, x)
    y = np.asarray(m.apply(params, x))

    t = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))  # NCHW
    var, mean = torch.var_mean(t, dim=-3, keepdim=False)
    inv_std = (1e-5 + var) ** -0.5
    ref = (t - mean[:, None]) * inv_std[:, None]
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_globalbias_lowrank_math():
    x = jnp.zeros((1, 6, 8, 10), jnp.float32)
    m = GlobalBias(bias_channels=4, output_dim=10, mesh_size=(6, 8), rank=3)
    params = m.init(KEY, x)
    y = np.asarray(m.apply(params, x))
    p = params["params"]
    maps = np.einsum("ck,kh,kw->hwc", p["A"], p["U"], p["V"])
    maps = np.einsum("hwc,co->hwo", maps, p["projection"])
    np.testing.assert_allclose(y[0], maps, atol=1e-6)


def test_globalbias_no_projection_when_dims_match():
    x = jnp.zeros((1, 6, 8, 4), jnp.float32)
    m = GlobalBias(bias_channels=4, output_dim=4, mesh_size=(6, 8), rank=3)
    params = m.init(KEY, x)
    assert "projection" not in params["params"]


def test_downsample_shapes():
    x = _x(B=1, H=33, W=64, C=4)
    for s in (1, 2, 4):
        m = PhysicalDownsample(stride=s)
        y = m.apply({}, x)
        assert y.shape == (1, (33 - 1) // s + 1, 64 // s if 64 % s == 0 else y.shape[2], 4)


def test_downsample_mean_pool_constant():
    x = jnp.full((1, 9, 16, 2), 3.0)
    y = np.asarray(PhysicalDownsample(stride=2).apply({}, x))
    np.testing.assert_allclose(y, 3.0, rtol=1e-6)


def test_gmblock_reaction_structure():
    """The default reaction block: 4 CLinears with hidden 896 + bias + prenorm."""
    x = _x(C=24)
    m = GMBlock(
        layers=("CLinear", "CLinear", "CLinear", "CLinear"),
        input_dim=24,
        output_dim=16,
        mesh_size=(8, 12),
        hidden_dim=20,
        bias_channels=4,
        pre_normalize=True,
        activation_fn="SiLU",
    )
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 12, 16)
    p = params["params"]
    assert "pre_norm" in p
    assert "bias0_GlobalBias" in p
    assert p["layer0_CLinear"]["conv"]["kernel"].shape == (24, 20)
    assert p["layer3_CLinear"]["conv"]["kernel"].shape == (20, 16)
    # last conv gets 0.1-scaled init
    s_first = float(jnp.std(p["layer0_CLinear"]["conv"]["kernel"]))
    s_last = float(jnp.std(p["layer3_CLinear"]["conv"]["kernel"]))
    assert s_last < 0.3 * s_first


def test_gmblock_hidden_default_max_in_out():
    x = _x(C=8)
    m = GMBlock(
        layers=("CLinear", "CLinear"),
        input_dim=8,
        output_dim=32,
        mesh_size=(8, 12),
        hidden_dim=0,
    )
    params = m.init(KEY, x)
    assert params["params"]["layer0_CLinear"]["conv"]["kernel"].shape == (8, 32)


def test_gmblock_single_layer_activation_flag():
    x = _x(C=8)
    m = GMBlock(
        layers=("CLinear",),
        input_dim=8,
        output_dim=8,
        mesh_size=(8, 12),
        activation=True,
    )
    params = m.init(KEY, x)
    y = np.asarray(m.apply(params, x))
    assert (y > -0.2786).all()  # silu lower bound


def test_gmblock_unknown_layer_raises():
    x = _x(C=8)
    with pytest.raises(ValueError):
        GMBlock(layers=("Nope",), input_dim=8, output_dim=8, mesh_size=(8, 12)).init(KEY, x)


def test_gmblock_bf16_compute_fp32_params():
    x = _x(C=8).astype(jnp.bfloat16)
    m = GMBlock(
        layers=("CLinear", "SepConv"),
        input_dim=8,
        output_dim=8,
        mesh_size=(8, 12),
        pre_normalize=True,
        dtype=jnp.bfloat16,
    )
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.dtype == jnp.bfloat16
    flat = jax.tree_util.tree_leaves(params)
    assert all(p.dtype == jnp.float32 for p in flat)
