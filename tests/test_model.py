import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.config import default_config
from paradis_tpu.model.paradis import Paradis, get_scaled_timestep
from paradis_tpu.sphere.geometry import equiangular_lat_lon

KEY = jax.random.PRNGKey(0)


def tiny_model(**kw):
    lat, lon = equiangular_lat_lon(8, 16, include_poles=False)
    defaults = dict(
        input_dim=20,
        output_dim=12,
        n_static=5,
        lat_deg=tuple(lat),
        lon_deg=tuple(lon),
        hidden_dim=16,
        num_vels=4,
        num_layers=2,
        velocity_hidden=8,
        reaction_hidden=8,
        output_hidden=8,
        bias_channels=2,
        bias_rank=4,
    )
    defaults.update(kw)
    return Paradis(**defaults)


def test_scaled_timestep():
    assert abs(get_scaled_timestep(21600.0) - 21600.0 * 7.29212e-5) < 1e-9


def test_forward_shapes_and_param_stacking():
    m = tiny_model()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 16, 20)), jnp.float32)
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 16, 12)
    assert np.isfinite(np.asarray(y)).all()
    # scanned layers: per-layer params stacked on a leading [num_layers] axis
    layers = params["params"]["layers"]
    assert layers["alpha_adv"].shape == (2, 16)
    vel_k = layers["velocity_net"]["layer0_CLinear"]["conv"]["kernel"]
    assert vel_k.shape == (2, 16, 8)


def test_alpha_adv_initial_gate():
    """alpha_adv init -1 → gate sigmoid(-1) ≈ 0.269 (reference paradis.py:180)."""
    m = tiny_model()
    x = jnp.zeros((1, 8, 16, 20), jnp.float32)
    params = m.init(KEY, x)
    alpha = params["params"]["layers"]["alpha_adv"]
    np.testing.assert_allclose(np.asarray(alpha), -1.0)


@pytest.mark.slow
def test_remat_matches_no_remat():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 16, 20)), jnp.float32)
    m1 = tiny_model(gradient_checkpointing=False)
    m2 = tiny_model(gradient_checkpointing=True)
    params = m1.init(KEY, x)
    y1 = np.asarray(m1.apply(params, x))
    y2 = np.asarray(m2.apply(params, x))
    np.testing.assert_allclose(y1, y2, atol=1e-5)

    g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(m2.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("scan_unroll", [0, 1], ids=["unrolled", "scan"])
@pytest.mark.parametrize("policy", ["advect", "advect_pos"])
def test_remat_policy_matches_full_remat(policy, scan_unroll):
    """Saveable-name remat policies change memory/replay, never numerics.

    Covers both layer-stack paths: the fully-unrolled Python loop (the
    5.625° default) and nn.scan (scan_unroll=1) — named-saveable policies
    compose differently with scan's residual stacking, so both must agree
    with full remat.
    """
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 16, 20)), jnp.float32)
    m_full = tiny_model(gradient_checkpointing=True, scan_unroll=scan_unroll)
    m_pol = tiny_model(gradient_checkpointing=True, remat_policy=policy,
                       scan_unroll=scan_unroll)
    params = m_full.init(KEY, x)
    np.testing.assert_allclose(
        np.asarray(m_pol.apply(params, x)),
        np.asarray(m_full.apply(params, x)), atol=1e-6)
    g1 = jax.grad(lambda p: jnp.sum(m_full.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(m_pol.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        # rtol absorbs fp32 reassociation noise: saved-vs-recomputed
        # intermediates fuse (and round) differently under nn.scan
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-6)


def test_remat_policy_rejects_unknown():
    from paradis_tpu.model.paradis import _remat_policy

    with pytest.raises(ValueError, match="remat_policy"):
        _remat_policy("bogus")
    assert _remat_policy("none") is None


@pytest.mark.slow
def test_coarsening_factor_roundtrip():
    lat, lon = equiangular_lat_lon(9, 16, include_poles=False)
    m = tiny_model(lat_deg=tuple(lat), lon_deg=tuple(lon), coarsening_factor=2)
    assert m.mesh_size_coarse == (5, 8)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 9, 16, 20)), jnp.float32)
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (1, 9, 16, 12)


@pytest.mark.slow
def test_bf16_policy():
    m = tiny_model(dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 16, 20)), jnp.float32)
    params = m.init(KEY, x)
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params))
    y = m.apply(params, x)
    assert y.dtype == jnp.bfloat16


def test_from_config_dims():
    cfg = default_config().resolved()
    cfg.model.latent_size = 16
    cfg.model.velocity_vectors = 4
    cfg.model.num_layers = 1
    cfg.model.physblock.velocity_net.hidden_dim = 8
    cfg.model.physblock.reaction.hidden_dim = 8
    cfg.model.physblock.output_proj.hidden_dim = 8
    lat, lon = equiangular_lat_lon(8, 16, include_poles=False)
    m = Paradis.from_config(cfg, input_dim=186, output_dim=97, lat_deg=lat, lon_deg=lon)
    assert m.n_static == 10
    assert m.input_dim == 186
    assert m.dtype == jnp.bfloat16  # use_amp default true
    assert m.interpolation == "bicubic"


def test_wrong_spatial_dims_raises():
    m = tiny_model()
    x = jnp.zeros((1, 6, 16, 20), jnp.float32)
    with pytest.raises(ValueError):
        m.init(KEY, x)


@pytest.mark.slow
def test_loop_matches_scan_layer_stack():
    """The Python-loop layer stack (scan_unroll=0, the default) is
    numerically identical to the lax.scan form (scan_unroll=1) and stores
    the same stacked [num_layers, ...] parameter tree."""
    m_loop = tiny_model(num_layers=3, scan_unroll=0)
    m_scan = tiny_model(num_layers=3, scan_unroll=1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 16, 20)),
                    jnp.float32)
    p_loop = m_loop.init(KEY, x)
    p_scan = m_scan.init(KEY, x)
    assert (jax.tree_util.tree_structure(p_loop)
            == jax.tree_util.tree_structure(p_scan))
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape,
                                     p_loop, p_scan))

    # same stored params -> same outputs and (reassociation-level) grads
    y_scan = m_scan.apply(p_scan, x)
    y_loop = m_loop.apply(p_scan, x)
    np.testing.assert_allclose(np.asarray(y_loop), np.asarray(y_scan),
                               atol=2e-6)

    def loss(mdl, p):
        return jnp.sum(jnp.sin(mdl.apply(p, x)))

    g_scan = jax.grad(lambda p: loss(m_scan, p))(p_scan)
    g_loop = jax.grad(lambda p: loss(m_loop, p))(p_scan)
    for a, b in zip(jax.tree.leaves(g_loop), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_bf16_precast_skips_fp32_consumers():
    """The hoisted compute-dtype pre-cast in the unrolled layer loop
    (model/paradis.py _precast) must leave every fp32-consumed leaf alone
    (ChannelNorm incl. the GMBlock ``pre_norm``, GlobalBias, alpha_adv)
    while genuinely pre-casting the Dense/depthwise leaves.

    Probe: perturb a leaf by less than half a bf16 ulp of its value.  If the
    leaf is pre-cast to bf16 the perturbation is swallowed and the output is
    bit-identical; if it is consumed at fp32 the output must change.
    """
    m = tiny_model(dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 8, 16, 20)),
                    jnp.float32)
    params = m.init(KEY, x)

    def with_leaf(path_keys, fn):
        p = jax.tree.map(lambda a: a, params)  # shallow-copy-safe rebuild
        node = p["params"]["layers"]
        for k in path_keys[:-1]:
            node = node[k]
        node[path_keys[-1]] = fn(node[path_keys[-1]])
        return p

    y0 = np.asarray(m.apply(params, x))

    # fp32 consumers: a sub-bf16-ulp nudge MUST reach the output
    path = ("diffusion", "pre_norm", "weight")
    yp = np.asarray(m.apply(with_leaf(path, lambda a: a + 1.5e-3), x))
    assert (yp != y0).any(), f"{path}: fp32 leaf was pre-cast to bf16"

    # alpha_adv feeds a fp32 sigmoid whose result is then cast to bf16, so
    # the probe base/delta are picked so the fp32 gate crosses a bf16
    # rounding boundary while the alpha itself rounds back to the base:
    # bf16(-0.992188 + 0.00175781) == -0.992188 but
    # bf16(sigmoid32(-0.992188)) = 0.269531 != 0.271484 = bf16(sigmoid32(+d))
    base = with_leaf(("alpha_adv",), lambda a: jnp.full_like(a, -0.992188))
    ya = np.asarray(m.apply(base, x))
    pert = with_leaf(("alpha_adv",),
                     lambda a: jnp.full_like(a, -0.992188 + 0.00175781))
    yb = np.asarray(m.apply(pert, x))
    assert (ya != yb).any(), "alpha_adv: fp32 leaf was pre-cast to bf16"

    # compute-dtype consumer: the same nudge around an exactly-representable
    # value MUST be swallowed by the (hoisted) bf16 cast
    base = with_leaf(("diffusion", "layer0_SepConv", "pointwise", "kernel"),
                     lambda a: jnp.full_like(a, 0.5))
    ya = np.asarray(m.apply(base, x))
    pert = with_leaf(("diffusion", "layer0_SepConv", "pointwise", "kernel"),
                     lambda a: jnp.full_like(a, 0.5 + 1.0e-4))
    yb = np.asarray(m.apply(pert, x))
    np.testing.assert_array_equal(ya, yb)
