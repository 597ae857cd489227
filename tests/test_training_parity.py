"""Training-DYNAMICS parity oracle vs the torch reference (VERDICT r3 #1).

test_reference_parity.py pins the forward pass at ~3e-7; this module pins the
*training path*: gradients through the custom interp VJPs, TBPTT segmentation,
loss chunk-scaling and cross-batch gradient accumulation, end-to-end against
torch autograd.

The reference's manual-optimization loop (``/root/reference/trainer.py:498-587``)
cannot be driven through ``LitParadis`` here (lightning is not installed), so
this test transcribes that loop faithfully — same zero_grad cadence
(``trainer.py:505-506``), chunk-loss scaling by ``1/(num_steps*grad_accum)``
(``trainer.py:560``), interleaved ``backward`` + input detach at
``detach_gradient_every`` boundaries (``trainer.py:566-576``), optimizer step
every ``accumulate_grad_batches`` microbatches (``trainer.py:580-587``), and
the autoregressive lag-shift (``trainer.py:710-729``) — and drives the ACTUAL
reference model (grid_sample advection and all) with torch autograd + AdamW.

Our side runs the real production ``make_train_step`` (per-segment
value_and_grad, stop-gradient carry, lax.cond accumulation) from transplanted
identical weights.  Parity asserted on per-step losses at every microbatch
(losses after microbatch 2 reflect the first optimizer step, so any gradient
or update divergence surfaces immediately) and on the final parameters after
6 optimizer steps, on both interpolation modes.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

torch = pytest.importorskip("torch")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

sys.path.insert(0, str(REFERENCE))

import jax
import jax.numpy as jnp

from test_reference_parity import (
    H,
    IN_DIM,
    N_COMMON,
    N_FORCINGS,
    N_STATIC,
    N_TIME,
    OUT_DIM,
    W,
    _build_jax,
    _build_reference,
    _cfg,
    _copy_all,
)

from paradis_tpu.train.optim import build_optimizer
from paradis_tpu.train.step import create_train_state, make_train_step

S = 4              # rollout steps per microbatch
ACCUM = 2          # accumulate_grad_batches
DETACH = 2         # detach_gradient_every (TBPTT segment length)
MICRO = 12         # microbatches → 6 optimizer steps
LR, B1, B2, WD = 1e-3, 0.9, 0.95, 0.01
C_DYN = N_COMMON * N_TIME


def _make_batches(seed: int = 42):
    """MICRO deterministic channels-last microbatches (batch size 1)."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(MICRO):
        batches.append({
            "input": rng.normal(size=(1, H, W, C_DYN)).astype(np.float32),
            "target": rng.normal(size=(1, S, H, W, OUT_DIM)).astype(np.float32),
            "forcings": rng.normal(size=(1, S, H, W, N_FORCINGS)).astype(np.float32),
            "constants": rng.normal(size=(1, H, W, N_STATIC)).astype(np.float32),
        })
    return batches


def _torch_autoregress(model_input, output):
    """Reference ``_autoregression_next_input`` (trainer.py:710-729)."""
    common = output[:, :N_COMMON]
    lag = N_COMMON * N_TIME
    return torch.cat([model_input[:, N_COMMON:lag], common], dim=1)


def _torch_ns5(x, steps=5, eps=1e-7):
    """Quintic Newton–Schulz orthogonalization (Jordan et al., the iteration
    dion's Triton kernels implement), fp32, gram always on the short side."""
    a, b, c = 3.4445, -4.7750, 2.0315
    transpose = x.shape[0] > x.shape[1]
    y = x.t() if transpose else x
    y = y / (y.norm() + eps)
    for _ in range(steps):
        g = y @ y.t()
        y = a * y + (b * g + c * (g @ g)) @ y
    return y.t() if transpose else y


class _TorchNorMuon:
    """dion's published NorMuon update rule, transcribed in torch (exactly as
    the Lightning loop below transcribes ``trainer.py:498-587``): nesterov
    momentum → quintic NS orthogonalization on the ``[out, fan_in]``
    flattening (dion ``flatten=True``) → aspect rescale → per-output-neuron
    second-moment EMA normalization with a global-norm-preserving rescale →
    decoupled weight decay.  Param partition mirrors reference
    ``build_param_groups`` (``trainer.py:24-64``): Linear/Conv weights to
    NorMuon, biases and everything else to AdamW at the same lr/wd
    (``trainer.py:337-364``, dion ``NorMuon(use_triton=True)``).
    """

    def __init__(self, model, lr, betas, weight_decay, ns_steps=5, eps=1e-8):
        import torch.nn as nn

        muon, adamw, seen = [], [], set()
        for module in model.modules():
            if isinstance(module,
                          (nn.Linear, nn.Conv1d, nn.Conv2d, nn.Conv3d)):
                w = getattr(module, "weight", None)
                if w is not None and w.requires_grad and id(w) not in seen:
                    muon.append(w)
                    seen.add(id(w))
                b = getattr(module, "bias", None)
                if b is not None and b.requires_grad and id(b) not in seen:
                    adamw.append(b)
                    seen.add(id(b))
        for p in model.parameters():
            if p.requires_grad and id(p) not in seen:
                adamw.append(p)
                seen.add(id(p))
        assert muon and adamw, "partition must split the model"
        self.muon = muon
        self.momentum = [torch.zeros_like(p) for p in muon]
        self.nu = [torch.zeros(p.shape[0]) for p in muon]
        self.lr, (self.b1, self.b2) = lr, betas
        self.wd, self.ns_steps, self.eps = weight_decay, ns_steps, eps
        self.adamw = torch.optim.AdamW(adamw, lr=lr, betas=betas, eps=1e-8,
                                       weight_decay=weight_decay)

    def zero_grad(self):
        self.adamw.zero_grad()
        for p in self.muon:
            p.grad = None

    @torch.no_grad()
    def step(self):
        import math

        self.adamw.step()
        for p, m, nu in zip(self.muon, self.momentum, self.nu):
            g = p.grad
            m.mul_(self.b1).add_(g)
            u = g + self.b1 * m                       # nesterov
            g2 = u.reshape(u.shape[0], -1)            # [out, fan_in]
            o = _torch_ns5(g2.float(), self.ns_steps)
            o = o * math.sqrt(max(1.0, o.shape[0] / o.shape[1]))
            ms = o.pow(2).mean(dim=1)                 # per-output-neuron
            nu.mul_(self.b2).add_(ms, alpha=1.0 - self.b2)
            o_hat = o / (nu.sqrt().unsqueeze(1) + self.eps)
            o_hat = o_hat * (o.norm() / (o_hat.norm() + self.eps))
            p.mul_(1.0 - self.lr * self.wd)           # decoupled weight decay
            p.add_(o_hat.reshape(p.shape), alpha=-self.lr)


def _torch_training(ref, batches, loss_mod=None, optimizer="adamw"):
    """The reference manual-optimization loop, transcribed from
    ``trainer.py:498-587`` (see module docstring).

    ``loss_mod``: optional torch loss module (e.g. the reference's actual
    ``ParadisLoss``); defaults to plain MSE.  ``optimizer``: ``adamw`` or the
    production ``normuon`` (reference ``trainer.py:337-364``).
    """
    loss_fn = loss_mod if loss_mod is not None \
        else torch.nn.functional.mse_loss
    if optimizer == "normuon":
        opt = _TorchNorMuon(ref, lr=LR, betas=(B1, B2), weight_decay=WD)
    else:
        opt = torch.optim.AdamW(ref.parameters(), lr=LR, betas=(B1, B2),
                                eps=1e-8, weight_decay=WD)
    per_step_losses = []  # [MICRO, S]
    for batch_idx, b in enumerate(batches):
        input_data = torch.from_numpy(
            b["input"].transpose(0, 3, 1, 2)).unsqueeze(1)       # [B,1,C,H,W]
        true_data = torch.from_numpy(b["target"].transpose(0, 1, 4, 2, 3))
        forcings = torch.from_numpy(b["forcings"]).permute(0, 1, 4, 2, 3)
        constants = torch.from_numpy(b["constants"]).unsqueeze(1) \
            .permute(0, 1, 4, 2, 3)                              # [:, :1] slice

        if batch_idx % ACCUM == 0:                               # trainer.py:505
            opt.zero_grad()

        chunk_loss = 0.0
        row = []
        for step in range(S):                                    # trainer.py:533
            forcings_step = forcings[:, step].unsqueeze(1)
            model_input = torch.cat(
                [input_data, forcings_step, constants], dim=2).squeeze(1)
            output = ref(model_input)
            loss = loss_fn(output, true_data[:, step])
            row.append(float(loss.detach()))
            chunk_loss = chunk_loss + loss / (S * ACCUM)         # trainer.py:560
            input_data = _torch_autoregress(model_input, output).unsqueeze(1)
            if (step + 1) % DETACH == 0 or step == S - 1:        # trainer.py:566-576
                chunk_loss.backward()
                input_data = input_data.detach()
                chunk_loss = 0.0

        if (batch_idx + 1) % ACCUM == 0:                         # trainer.py:580-587
            opt.step()
        per_step_losses.append(row)
    return np.asarray(per_step_losses)


def _train_cfg(interpolation: str, optimizer: str = "adamw"):
    cfg = _cfg()
    cfg.model.adv_interpolation = interpolation
    cfg.training.optimizer.name = optimizer
    # fp32 NS on both sides: the oracle pins the update RULE at fp32
    # tolerance; the production bf16 iteration is a precision choice covered
    # by tests/test_optim.py self-consistency
    cfg.training.optimizer.ns_dtype = "float32"
    cfg.training.optimizer.lr = LR
    cfg.training.optimizer.beta1 = B1
    cfg.training.optimizer.beta2 = B2
    cfg.training.optimizer.weight_decay = WD
    cfg.training.optimizer.detach_gradient_every = DETACH
    cfg.training.accumulate_grad_batches = ACCUM
    cfg.training.gradient_clip_val = None
    cfg.training.log_additional_stats = False
    return cfg


def _jax_training(cfg, model, params, batches, loss_fn=None):
    optimizer = build_optimizer(cfg, params)
    if loss_fn is None:
        loss_fn = lambda out, tgt: jnp.mean((out - tgt) ** 2)  # noqa: E731
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer, donate=False)
    state = create_train_state(params, optimizer)
    per_step_losses = []
    for b in batches:
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = train_step(state, batch, N_COMMON)
        per_step_losses.append(np.asarray(metrics["loss_per_step"]))
    return state, np.asarray(per_step_losses)


def _weighted_huber_losses():
    """The reference's ACTUAL ``ParadisLoss`` (imported from the checkout)
    and our ``WeightedLoss`` built with identical var × pressure × latitude
    weights (reference utils/loss.py:191-231,262-283)."""
    from utils.loss import ParadisLoss as RefLoss  # /root/reference on path

    from paradis_tpu.sphere.geometry import (
        equiangular_lat_lon,
        latitude_weights,
    )
    from paradis_tpu.train.loss import WeightedLoss, pressure_weights

    lat, _ = equiangular_lat_lon(H, W, include_poles=False)
    levels = [200.0, 500.0, 850.0]
    n_lev = len(levels)
    n_atmo = OUT_DIM - 2
    names = [f"{v}_h{int(L)}" for v in ("ta", "ua", "qa", "za")[: n_atmo // n_lev]
             for L in levels] + ["s1", "s2"]
    var_w = np.linspace(0.5, 1.5, OUT_DIM).astype(np.float32)
    ref_loss = RefLoss(
        loss_function="reversed_huber",
        lat_grid=torch.tensor(lat, dtype=torch.float32),
        pressure_levels=torch.tensor(levels),
        num_features=OUT_DIM,
        num_surface_vars=2,
        var_loss_weights=torch.tensor(var_w),
        output_name_order=names,
        delta_loss=1.0,
        apply_latitude_weights=True,
    )
    pw = pressure_weights(np.asarray(levels, np.float32))
    fw = var_w.copy()
    for i in range(0, n_atmo, n_lev):
        fw[i : i + n_lev] = var_w[i : i + n_lev] * pw
    ours = WeightedLoss(kind="reversed_huber", feature_weights=fw,
                        lat_weights=latitude_weights(lat).astype(np.float32))
    return ref_loss, ours


@pytest.mark.slow
@pytest.mark.parametrize("interpolation,loss,optimizer", [
    ("bilinear", "mse", "adamw"),
    ("bicubic", "mse", "adamw"),
    ("bicubic", "weighted_huber", "adamw"),
    # the PRODUCTION optimizer (reference trains with dion NorMuon,
    # trainer.py:337-364) — oracle-checked on both interp modes, and once
    # through the reference's actual weighted loss (the full production
    # training configuration)
    ("bilinear", "mse", "normuon"),
    ("bicubic", "mse", "normuon"),
    ("bicubic", "weighted_huber", "normuon"),
])
def test_training_dynamics_parity_with_reference(interpolation, loss,
                                                 optimizer):
    cfg = _train_cfg(interpolation, optimizer)
    ref = _build_reference(cfg)
    ref.train()
    model, params = _build_jax(cfg)
    _copy_all(ref, params)

    loss_mod = jax_loss = None
    if loss == "weighted_huber":
        loss_mod, jax_loss = _weighted_huber_losses()
        # scalar parity of the loss modules themselves before the loop
        rng = np.random.default_rng(9)
        p = rng.normal(size=(1, OUT_DIM, H, W)).astype(np.float32)
        t = rng.normal(size=(1, OUT_DIM, H, W)).astype(np.float32)
        a = float(loss_mod(torch.from_numpy(p), torch.from_numpy(t)))
        b = float(jax_loss(jnp.moveaxis(jnp.asarray(p), 1, -1),
                           jnp.moveaxis(jnp.asarray(t), 1, -1)))
        np.testing.assert_allclose(b, a, rtol=1e-6)

    batches = _make_batches()
    theirs = _torch_training(ref, batches, loss_mod=loss_mod,
                             optimizer=optimizer)
    state, ours = _jax_training(cfg, model, params, batches, loss_fn=jax_loss)

    assert theirs.shape == ours.shape == (MICRO, S)
    # Per-step losses at every microbatch: any gradient/TBPTT/accumulation
    # divergence shows up from microbatch 3 on (first optimizer step applies
    # after microbatch 2).  fp32 end-to-end; forward parity alone is ~3e-7.
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-6)

    # Losses must actually evolve (optimizer steps are taking effect) —
    # guards against a vacuous pass where no side ever updates.
    assert not np.allclose(theirs[0], theirs[-1], rtol=1e-3)

    # Final parameters after 6 optimizer steps: transplant our trained params
    # into a fresh reference skeleton and diff state_dicts leaf by leaf.
    # NorMuon gets a looser absolute floor: NS orthogonalization is sign-like
    # along near-degenerate gradient directions, so fp32-level noise amplifies
    # to ~1e-5 absolute on near-zero leaves while the per-step losses (checked
    # above, every microbatch) still agree at 2e-5.
    atol = 2e-6 if optimizer == "adamw" else 5e-5
    ref_final = _build_reference(cfg)
    _copy_all(ref_final, jax.device_get(state.params))
    sd_trained = ref.state_dict()
    sd_ours = ref_final.state_dict()
    assert sd_trained.keys() == sd_ours.keys()
    for key in sd_trained:
        a = sd_trained[key].detach().numpy()
        b = sd_ours[key].numpy()
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=atol,
            err_msg=f"post-training parameter divergence at {key}")
