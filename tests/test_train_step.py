import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.config import default_config
from paradis_tpu.model.paradis import Paradis
from paradis_tpu.sphere.geometry import equiangular_lat_lon
from paradis_tpu.train.loss import WeightedLoss
from paradis_tpu.train.optim import build_optimizer
from paradis_tpu.train.step import (
    TrainState,
    autoregress_next_input,
    create_train_state,
    make_eval_step,
    make_train_step,
)

H, W = 8, 16
C_COMMON = 6      # common (autoregressively fed back) features
N_TIME = 2
C_DYN = C_COMMON * N_TIME
N_FORC = 3
N_CONST = 5
C_IN = C_DYN + N_FORC + N_CONST
C_OUT = C_COMMON + 2  # two output-only channels


def _cfg(**over):
    cfg = default_config().resolved()
    cfg.training.optimizer.name = "adamw"
    cfg.training.optimizer.lr = 1e-3
    cfg.training.loss_function.lat_weights = False
    for k, v in over.items():
        cfg.set_path(k, v)
    return cfg


def _model():
    lat, lon = equiangular_lat_lon(H, W, include_poles=False)
    return Paradis(
        input_dim=C_IN, output_dim=C_OUT, n_static=N_CONST,
        lat_deg=tuple(lat), lon_deg=tuple(lon),
        hidden_dim=16, num_vels=4, num_layers=2,
        velocity_hidden=8, reaction_hidden=8, output_hidden=8,
        bias_channels=2, bias_rank=4,
    )


def _loss():
    fw = np.ones(C_OUT, np.float32)
    return WeightedLoss(kind="mse", feature_weights=fw, lat_weights=None)


def _batch(S=2, B=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input": jnp.asarray(rng.normal(size=(B, H, W, C_DYN)), jnp.float32),
        "target": jnp.asarray(rng.normal(size=(B, S, H, W, C_OUT)), jnp.float32),
        "forcings": jnp.asarray(rng.normal(size=(B, S, H, W, N_FORC)), jnp.float32),
        "constants": jnp.asarray(rng.normal(size=(B, H, W, N_CONST)), jnp.float32),
    }


def test_autoregress_shift():
    dyn = jnp.arange(2 * 1 * 1 * C_DYN, dtype=jnp.float32).reshape(2, 1, 1, C_DYN)
    out = -jnp.ones((2, 1, 1, C_OUT), jnp.float32)
    nxt = np.asarray(autoregress_next_input(dyn, out, C_COMMON, N_TIME))
    # oldest lag dropped: first C_COMMON of result = previous block t_n
    np.testing.assert_allclose(nxt[..., :C_COMMON], np.asarray(dyn)[..., C_COMMON:C_DYN])
    np.testing.assert_allclose(nxt[..., C_COMMON:], -1.0)


def test_train_step_runs_and_reduces_loss():
    cfg = _cfg()
    model, loss = _model(), _loss()
    batch = _batch(S=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C_IN)))
    opt = build_optimizer(cfg, params)
    step, _ = make_train_step(model, loss, cfg, opt, donate=False)
    state = create_train_state(params, opt)

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, C_COMMON)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_multi_step_rollout_losses_shape():
    cfg = _cfg()
    model, loss = _model(), _loss()
    batch = _batch(S=3)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C_IN)))
    opt = build_optimizer(cfg, params)
    step, _ = make_train_step(model, loss, cfg, opt, donate=False)
    state = create_train_state(params, opt)
    state, metrics = step(state, batch, C_COMMON)
    assert metrics["loss_per_step"].shape == (3,)


@pytest.mark.slow
def test_tbptt_matches_full_backprop_value():
    """Losses identical with/without detach; grads differ only via truncation."""
    model, loss = _model(), _loss()
    batch = _batch(S=4)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, C_IN)))

    cfg_full = _cfg()
    cfg_tbptt = _cfg(**{"training.optimizer.detach_gradient_every": 2})
    opt_f = build_optimizer(cfg_full, params)
    opt_t = build_optimizer(cfg_tbptt, params)
    step_f, _ = make_train_step(model, loss, cfg_full, opt_f, donate=False)
    step_t, _ = make_train_step(model, loss, cfg_tbptt, opt_t, donate=False)

    sf = create_train_state(params, opt_f)
    st = create_train_state(params, opt_t)
    _, mf = step_f(sf, batch, C_COMMON)
    _, mt = step_t(st, batch, C_COMMON)
    np.testing.assert_allclose(np.asarray(mf["loss_per_step"]),
                               np.asarray(mt["loss_per_step"]), rtol=2e-4)
    # both produce finite grad norms
    assert float(mf["grad_norm"]) > 0 and float(mt["grad_norm"]) > 0


def test_grad_accumulation_applies_every_n():
    cfg = _cfg(**{"training.accumulate_grad_batches": 2})
    model, loss = _model(), _loss()
    batch = _batch(S=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C_IN)))
    opt = build_optimizer(cfg, params)
    step, _ = make_train_step(model, loss, cfg, opt, donate=False)
    state = create_train_state(params, opt)

    p0 = jax.tree.leaves(state.params)[0]
    state, m1 = step(state, batch, C_COMMON)
    assert not bool(m1["applied"])
    # params unchanged after first microbatch
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.params)[0]),
                                  np.asarray(p0))
    state, m2 = step(state, batch, C_COMMON)
    assert bool(m2["applied"])
    assert int(state.step) == 1
    # accumulator reset after apply
    assert float(jnp.abs(jax.tree.leaves(state.accum)[0]).sum()) == 0.0


@pytest.mark.slow
def test_grad_accum_equals_big_batch():
    """Two microbatches of B=1 ≡ one step over their concatenation (B=2)."""
    model, loss = _model(), _loss()
    full = _batch(S=1, B=2, seed=7)
    half1 = {k: v[:1] for k, v in full.items()}
    half2 = {k: v[1:] for k, v in full.items()}
    # target/forcings keep the step axis
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, H, W, C_IN)))

    cfg_acc = _cfg(**{"training.accumulate_grad_batches": 2})
    opt_a = build_optimizer(cfg_acc, params)
    step_a, _ = make_train_step(model, loss, cfg_acc, opt_a, donate=False)
    sa = create_train_state(params, opt_a)
    sa, _ = step_a(sa, half1, C_COMMON)
    sa, _ = step_a(sa, half2, C_COMMON)

    cfg_b = _cfg()
    opt_b = build_optimizer(cfg_b, params)
    step_b, _ = make_train_step(model, loss, cfg_b, opt_b, donate=False)
    sb = create_train_state(params, opt_b)
    sb, _ = step_b(sb, full, C_COMMON)

    # adam normalizes per-parameter, so compare the resulting params: the
    # accumulated direction is mean-of-grads vs grad-of-mean → equal up to
    # microbatch-mean vs batch-mean scaling (B=1 halves summed * 1/2 = mean)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_eval_step_with_reports():
    cfg = _cfg()
    model, loss = _model(), _loss()
    batch = _batch(S=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C_IN)))
    report = {
        "indices": np.array([0, 3]),
        "std": np.array([2.0, 5.0], np.float32),
        "lat_weights": np.ones(H, np.float32),
    }
    ev = make_eval_step(model, loss, cfg, report=report)
    out = ev(params, batch, C_COMMON)
    assert np.isfinite(float(out["loss"]))
    assert out["report_rmse"].shape == (2,)
    assert (np.asarray(out["report_rmse"]) > 0).all()
