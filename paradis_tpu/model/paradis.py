"""The PARADIS model: a latent advection–diffusion–reaction integrator.

Architecture (reference ``model/paradis.py:31-269``):
  input projection → static encoder → downsample → N × physics layer →
  periodic upsample + skip → output projection, where each physics layer is
  velocity net → semi-Lagrangian advection (gated by a learned per-channel
  ``alpha_adv``) → diffusion → reaction(hidden ⊕ static).

TPU-first structure: the N identical physics layers run as a fully-unrolled
Python loop under ``nn.map_variables`` (``_LayerLoop``) — parameters stay in
the stacked ``[num_layers, ...]`` layout (checkpoints, batched Newton–Schulz
and weight transplants all see one tree) while the compute graph is
straight-line code, avoiding the ~9 ms/step of residual-stacking copies that
differentiating ``nn.scan`` costs at flagship size (see ``_LayerLoop``).
``nn.scan`` remains available as an opt-in compile-time lever
(``model.scan_unroll > 0``).  Layers are optionally rematerialised (the
analogue of the reference's ``torch.utils.checkpoint`` wrapping,
paradis.py:62-70).  All spatial ops are channels-last; compute dtype is
configurable (bf16 for the AMP-equivalent policy) with float32 parameters.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from paradis_tpu.distributed import constrain_spatial
from paradis_tpu.ops.advection import NeuralSemiLagrangian
from paradis_tpu.ops.blocks import (
    GMBlock,
    PhysicalDownsample,
    SepConv,
    _Depthwise,
    get_activation,
)
from paradis_tpu.ops.resize import periodic_upsample
from paradis_tpu.sphere.geometry import lonlat_grids
from paradis_tpu.sphere.padding import geocyclic_pad

EARTH_ROTATION_RATE = 7.29212e-5  # rad/s (reference model/paradis.py:13-14)
STATIC_DIM = 128  # static-encoder output width (reference model/paradis.py:83)


def _remat_policy(name: str):
    """Map ``compute.remat_policy`` to a jax.checkpoint saveable policy.

    Only meaningful with ``gradient_checkpointing=true`` (i.e. the 1.40625°
    HBM-fit configuration).  Full remat replays the whole physics layer in
    the backward pass, which recomputes the advection gather-interpolate
    forward — the hottest VPU-bound op at high resolution — purely to feed
    downstream recomputation.  Policies:

      * ``none``   — classic full remat (default; minimum HBM),
      * ``advect`` — save the interp output (named ``advect_interp`` in
        ops/advection.py): backward replay skips the 8 interp forwards at
        the cost of one [B,H,W,V] bf16 activation per layer (~48 MB/layer
        at 1.40625°),
      * ``advect_pos`` — additionally save the fp32 departure positions
        (``advect_pos``): replay also skips the velocity-net forward and
        the departure trig, at ~200 MB/layer more.
    """
    if name in ("", "none", None):
        return None
    if name == "advect":
        return jax.checkpoint_policies.save_only_these_names("advect_interp")
    if name == "advect_pos":
        return jax.checkpoint_policies.save_only_these_names(
            "advect_interp", "advect_pos")
    raise ValueError(
        f"compute.remat_policy must be none|advect|advect_pos, got {name!r}")


class _LayerLoop(nn.Module):
    """Python-loop layer stack over per-layer submodules.

    Wrapped in ``nn.map_variables`` (see ``Paradis.__call__``) so the stored
    parameter layout stays the stacked ``[num_layers, ...]`` format of the
    ``nn.scan`` path — checkpoints, the optimizer's per-layer batched
    Newton–Schulz and the reference-weight transplant all keep working — while
    the compute graph is straight-line code.  Rationale: differentiating
    ``lax.scan`` stacks every layer's residual activations into ``[L, ...]``
    buffers via dynamic-update-slice even when fully unrolled, a pure-copy
    pass measured at ~9 ms/step on the 5.625° flagship workload (device
    profile); with a Python loop the residuals are the producing fusions' own
    outputs and the copies vanish.
    """

    num_layers: int
    layer_cls: Any
    layer_kwargs: dict

    @nn.compact
    def __call__(self, hidden, hidden_static, lat_grid, lon_grid):
        for i in range(self.num_layers):
            hidden, _ = self.layer_cls(name=f"layer_{i}", **self.layer_kwargs)(
                hidden, hidden_static, lat_grid, lon_grid
            )
            hidden = constrain_spatial(hidden)
        return hidden, None


def get_scaled_timestep(dt_seconds: float) -> float:
    """Nondimensionalize the data timestep by the Earth rotation rate."""
    return dt_seconds * EARTH_ROTATION_RATE


class PhysicsLayer(nn.Module):
    """One ADR step: transport → mixing → forcing (reference paradis.py:228-254)."""

    hidden_dim: int
    num_vels: int
    mesh_size: tuple[int, int]
    dt: float
    bias_channels: int = 8
    bias_rank: int = 128
    activation: str = "SiLU"
    interpolation: str = "bicubic"
    advection_impl: str = "auto"
    fast_trig: bool = False
    band_max_dy_pix: Any = None    # Pallas row-banding bound in pixels (ops/advection.py)
    velocity_layers: tuple = ("CLinear", "SepConv")
    velocity_hidden: Any = 384
    diffusion_layers: tuple = ("SepConv",)
    diffusion_hidden: Any = 0
    reaction_layers: tuple = ("CLinear", "CLinear", "CLinear", "CLinear")
    reaction_hidden: Any = 896
    adv_down_layers: tuple = ("SepConv",)
    adv_down_hidden: Any = 0
    adv_up_layers: tuple = ("CLinear",)
    adv_up_hidden: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, hidden_static, lat_grid, lon_grid):
        # carry/out contract for nn.scan
        velocities = GMBlock(
            layers=self.velocity_layers,
            input_dim=self.hidden_dim,
            output_dim=2 * self.num_vels,
            hidden_dim=self.velocity_hidden,
            mesh_size=self.mesh_size,
            bias_channels=self.bias_channels,
            bias_rank=self.bias_rank,
            activation_fn=self.activation,
            pre_normalize=True,
            dtype=self.dtype,
            name="velocity_net",
        )(hidden)
        u = velocities[..., : self.num_vels]
        v = velocities[..., self.num_vels :]

        alpha_adv = self.param(
            "alpha_adv", nn.initializers.constant(-1.0), (self.hidden_dim,), jnp.float32
        )
        g_adv = nn.sigmoid(alpha_adv).astype(hidden.dtype)

        advected = NeuralSemiLagrangian(
            hidden_dim=self.hidden_dim,
            num_vels=self.num_vels,
            mesh_size=self.mesh_size,
            down_layers=self.adv_down_layers,
            down_hidden=self.adv_down_hidden,
            up_layers=self.adv_up_layers,
            up_hidden=self.adv_up_hidden,
            interpolation=self.interpolation,
            impl=self.advection_impl,
            fast_trig=self.fast_trig,
            band_max_dy_pix=self.band_max_dy_pix,
            dtype=self.dtype,
            name="advection",
        )(hidden, u, v, self.dt, lat_grid, lon_grid)
        hidden = hidden + g_adv * (advected - hidden)

        hidden = hidden + GMBlock(
            layers=self.diffusion_layers,
            input_dim=self.hidden_dim,
            output_dim=self.hidden_dim,
            hidden_dim=self.diffusion_hidden,
            mesh_size=self.mesh_size,
            pre_normalize=True,
            bias_channels=self.bias_channels,
            bias_rank=self.bias_rank,
            activation_fn=self.activation,
            dtype=self.dtype,
            name="diffusion",
        )(hidden)

        reac_in = jnp.concatenate([hidden, hidden_static], axis=-1)
        hidden = hidden + GMBlock(
            layers=self.reaction_layers,
            input_dim=self.hidden_dim + hidden_static.shape[-1],
            output_dim=self.hidden_dim,
            hidden_dim=self.reaction_hidden,
            mesh_size=self.mesh_size,
            pre_normalize=True,
            bias_channels=self.bias_channels,
            bias_rank=self.bias_rank,
            activation_fn=self.activation,
            dtype=self.dtype,
            name="reaction",
        )(reac_in)

        return hidden, None


class Paradis(nn.Module):
    """Full PARADIS forward model over ``[B, nlat, nlon, C_in]`` fields."""

    input_dim: int
    output_dim: int
    n_static: int
    lat_deg: tuple      # 1-D latitude in degrees (static, hashable)
    lon_deg: tuple      # 1-D longitude in degrees
    hidden_dim: int = 1024
    num_vels: int = 768
    num_layers: int = 8
    base_dt: float = 21600.0
    bias_channels: int = 8
    bias_rank: int = 128
    activation: str = "SiLU"
    interpolation: str = "bicubic"
    advection_impl: str = "auto"
    fast_trig: bool = False
    band_bound_rad: Any = None     # Pallas row-banding opt-in, rad (dead end on v5e — ops/interp_pallas.py)
    coarsening_factor: int = 1
    gradient_checkpointing: bool = False
    # remat offload policy (see _remat_policy); PARADIS_REMAT_POLICY overrides
    remat_policy: str = "none"
    # lax.scan unroll factor for the physics layers.  Full unroll (0 = all
    # layers) removes the scan's residual-stacking dynamic-update-slices,
    # which cost ~20 ms/step at 5.625° (measured via device profile); the
    # loop form only pays off when code size matters (very deep stacks).
    scan_unroll: int = 0
    input_layers: tuple = ("CLinear",)
    input_hidden: Any = 0
    output_layers: tuple = ("CLinear", "CLinear", "CLinear")
    output_hidden: Any = 768
    velocity_layers: tuple = ("CLinear", "SepConv")
    velocity_hidden: Any = 384
    diffusion_layers: tuple = ("SepConv",)
    diffusion_hidden: Any = 0
    reaction_layers: tuple = ("CLinear", "CLinear", "CLinear", "CLinear")
    reaction_hidden: Any = 896
    adv_down_layers: tuple = ("SepConv",)
    adv_down_hidden: Any = 0
    adv_up_layers: tuple = ("CLinear",)
    adv_up_hidden: Any = 0
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, *, input_dim: int, output_dim: int,
                    lat_deg, lon_deg, dtype=None, training: bool = False) -> "Paradis":
        """Build from a paradis_tpu Config (schema of paradis_settings.yaml).

        ``training`` is accepted for call-site documentation but no longer
        changes the advection dispatch: the fused Pallas kernel wins both the
        forward-only and fwd+bwd model on TPU (ops/advection.interpolate).
        """
        del training
        pb = cfg.model.physblock
        if dtype is None:
            dtype = jnp.bfloat16 if cfg.compute.use_amp else jnp.float32
        adv_impl = cfg.compute.get("advection_impl", "auto")
        return cls(
            input_dim=input_dim,
            output_dim=output_dim,
            n_static=len(cfg.features.input.constants),
            lat_deg=tuple(float(v) for v in np.asarray(lat_deg)),
            lon_deg=tuple(float(v) for v in np.asarray(lon_deg)),
            hidden_dim=cfg.model.latent_size,
            num_vels=cfg.model.velocity_vectors,
            num_layers=max(1, cfg.model.num_layers),
            base_dt=float(cfg.model.base_dt),
            bias_channels=cfg.model.get("bias_channels", 4),
            bias_rank=cfg.model.get("bias_rank", 128),
            activation=cfg.model.activation,
            interpolation=cfg.model.adv_interpolation,
            advection_impl=adv_impl,
            fast_trig=bool(cfg.compute.get("fast_departure_trig", False)),
            band_bound_rad=cfg.compute.get("interp_band_rad", None) or None,
            coarsening_factor=cfg.model.get("coarsening_factor", 1),
            gradient_checkpointing=cfg.compute.get("gradient_checkpointing", False),
            remat_policy=str(cfg.compute.get("remat_policy", "none") or "none"),
            scan_unroll=int(cfg.model.get("scan_unroll", 0) or 0),
            input_layers=tuple(pb.input_proj.layers),
            input_hidden=pb.input_proj.hidden_dim,
            output_layers=tuple(pb.output_proj.layers),
            output_hidden=pb.output_proj.hidden_dim,
            velocity_layers=tuple(pb.velocity_net.layers),
            velocity_hidden=pb.velocity_net.hidden_dim,
            diffusion_layers=tuple(pb.diffusion.layers),
            diffusion_hidden=pb.diffusion.hidden_dim,
            reaction_layers=tuple(pb.reaction.layers),
            reaction_hidden=pb.reaction.hidden_dim,
            adv_down_layers=tuple(pb.advection.down_projection.layers),
            adv_down_hidden=pb.advection.down_projection.hidden_dim,
            adv_up_layers=tuple(pb.advection.up_projection.layers),
            adv_up_hidden=pb.advection.up_projection.hidden_dim,
            dtype=dtype,
        )

    @property
    def mesh_size(self) -> tuple[int, int]:
        return (len(self.lat_deg), len(self.lon_deg))

    @property
    def mesh_size_coarse(self) -> tuple[int, int]:
        s = self.coarsening_factor
        H, W = self.mesh_size
        return ((H - 1) // s + 1, W // s)

    def _coarse_grids(self):
        s = self.coarsening_factor
        lat = np.deg2rad(np.asarray(self.lat_deg, np.float64))[::s]
        lon = np.deg2rad(np.asarray(self.lon_deg, np.float64))[::s]
        latg, long_ = lonlat_grids(lat, lon)
        return jnp.asarray(latg, jnp.float32), jnp.asarray(long_, jnp.float32)

    def _band_max_dy_pix(self):
        """Static pixel bound for the Pallas row-banded interp kernels.

        Computed from numpy grid constants so it stays a static attribute
        even when the physics layers run under remat/scan (where the grid
        ARGUMENTS are tracers).  None when disabled.
        """
        if not self.band_bound_rad:
            return None
        s = self.coarsening_factor
        lat = np.deg2rad(np.asarray(self.lat_deg, np.float64))[::s]
        if len(lat) < 2:
            return None
        spacing = (lat.max() - lat.min()) / (len(lat) - 1)
        if spacing <= 0:
            return None
        return float(self.band_bound_rad) / float(spacing)

    @nn.compact
    def __call__(self, fields: jnp.ndarray) -> jnp.ndarray:
        H, W = self.mesh_size
        if fields.shape[-3] != H or fields.shape[-2] != W:
            raise ValueError(
                f"expected spatial dims {(H, W)}, got {fields.shape[-3:-1]}"
            )
        fields = fields.astype(self.dtype)
        dt = get_scaled_timestep(self.base_dt) / self.num_layers
        lat_grid, lon_grid = self._coarse_grids()

        hidden = GMBlock(
            layers=self.input_layers,
            input_dim=self.input_dim,
            output_dim=self.hidden_dim,
            hidden_dim=self.input_hidden,
            mesh_size=(H, W),
            activation=True,
            activation_fn=self.activation,
            pre_normalize=False,
            bias_channels=0,
            dtype=self.dtype,
            name="input_proj",
        )(fields)

        hidden = constrain_spatial(hidden)
        hidden_static = self._static_encoder(fields[..., -self.n_static :])

        skip = hidden
        down = PhysicalDownsample(stride=self.coarsening_factor, name="downsample")
        hidden = constrain_spatial(down(hidden))
        hidden_static = constrain_spatial(down(hidden_static))

        layer_kwargs = dict(
            hidden_dim=self.hidden_dim,
            num_vels=self.num_vels,
            mesh_size=self.mesh_size_coarse,
            dt=dt,
            bias_channels=self.bias_channels,
            bias_rank=self.bias_rank,
            activation=self.activation,
            interpolation=self.interpolation,
            advection_impl=self.advection_impl,
            fast_trig=self.fast_trig,
            band_max_dy_pix=self._band_max_dy_pix(),
            velocity_layers=self.velocity_layers,
            velocity_hidden=self.velocity_hidden,
            diffusion_layers=self.diffusion_layers,
            diffusion_hidden=self.diffusion_hidden,
            reaction_layers=self.reaction_layers,
            reaction_hidden=self.reaction_hidden,
            adv_down_layers=self.adv_down_layers,
            adv_down_hidden=self.adv_down_hidden,
            adv_up_layers=self.adv_up_layers,
            adv_up_hidden=self.adv_up_hidden,
            dtype=self.dtype,
        )

        layer_cls = PhysicsLayer
        if self.gradient_checkpointing:
            policy_name = os.environ.get(
                "PARADIS_REMAT_POLICY", self.remat_policy)
            if policy_name != self.remat_policy:
                logging.getLogger(__name__).warning(
                    "PARADIS_REMAT_POLICY=%s overrides compute.remat_policy=%s",
                    policy_name, self.remat_policy)
            policy = _remat_policy(policy_name)
            layer_cls = nn.remat(PhysicsLayer, prevent_cse=False,
                                 policy=policy)
        L = self.num_layers
        unroll = self.scan_unroll if self.scan_unroll > 0 else L
        if unroll >= L:
            # fully unrolled: Python loop, but stored params keep the scan's
            # stacked [L, ...] layout via map_variables (see _LayerLoop)
            # trans fns see {"params": <module tree>}
            cdt = self.dtype
            # init round-trips created params through trans_in_fn: keep the
            # cast out of that path so stored params stay fp32
            initializing = self.is_mutable_collection("params")
            # PARADIS_PRECAST=0 restores per-layer in-module casts (chip A/B)
            enabled = os.environ.get("PARADIS_PRECAST", "1") != "0"

            def _precast(path, x):
                if initializing or not enabled:
                    return x
                # Hoisted compute-dtype cast: one astype per STACKED leaf
                # instead of one per layer slice (the unrolled loop's
                # per-layer bias/kernel casts were ~90 sub-20 us ops, ~2 ms
                # of pure op-count tax on the device profile).  Skip every
                # leaf that is consumed in fp32 so numerics are untouched:
                # ChannelNorm (named pre_norm / layerN_ChannelNorm) and
                # GlobalBias apply params at fp32, and alpha_adv goes through
                # a fp32 sigmoid (PhysicsLayer:121-124).  Everything else
                # (Dense / _Depthwise kernels+biases) is cast to compute
                # dtype at use anyway.
                keys = [getattr(k, "key", "") for k in path]
                if any("ChannelNorm" in k or "GlobalBias" in k
                       or k in ("pre_norm", "alpha_adv") for k in keys):
                    return x
                return x.astype(cdt)

            def _split(cols):
                tree = cols.get("params", {})
                if not tree:
                    return cols
                tree = jax.tree_util.tree_map_with_path(_precast, tree)
                split = {
                    f"layer_{i}": jax.tree.map(lambda x: x[i], tree)
                    for i in range(L)
                }
                return {**cols, "params": split}

            def _stack(cols):
                tree = cols.get("params", {})
                if not tree:
                    return cols
                per_layer = [tree[f"layer_{i}"] for i in range(L)]
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
                return {**cols, "params": stacked}

            Looped = nn.map_variables(
                _LayerLoop, "params",
                trans_in_fn=_split, trans_out_fn=_stack, init=True,
            )
            hidden, _ = Looped(
                num_layers=L, layer_cls=layer_cls, layer_kwargs=layer_kwargs,
                name="layers",
            )(hidden, hidden_static, lat_grid, lon_grid)
        else:
            ScannedLayers = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=L,
                unroll=min(unroll, L),
            )
            hidden, _ = ScannedLayers(name="layers", **layer_kwargs)(
                hidden, hidden_static, lat_grid, lon_grid
            )

        hidden = constrain_spatial(periodic_upsample(hidden, H, W) + skip)

        return GMBlock(
            layers=self.output_layers,
            input_dim=self.hidden_dim,
            output_dim=self.output_dim,
            hidden_dim=self.output_hidden,
            mesh_size=(H, W),
            activation=False,
            activation_fn=self.activation,
            pre_normalize=True,
            bias_channels=self.bias_channels,
            bias_rank=self.bias_rank,
            dtype=self.dtype,
            name="output_proj",
        )(hidden)

    def _static_encoder(self, x: jnp.ndarray) -> jnp.ndarray:
        """Orography/constants encoder (reference paradis.py:186-193).

        SepConv(64, k7) → SiLU → geo-pad(3) + depthwise 7×7 → SiLU →
        SepConv(STATIC_DIM, k5).  Uses torch-default init like the reference
        (these convs sit outside any GMBlock, so kaiming is never applied).

        The bare depthwise conv is the same shift-and-FMA ``_Depthwise``
        stencil SepConv uses (identical ``kernel``/``bias`` param names and
        shapes as the grouped ``nn.Conv`` it replaced): grouped-conv grads
        lower to slow strided fusions on TPU, and under a spatial mesh GSPMD
        cannot partition ``feature_group_count`` convs over (lat, space) —
        it was the source of all four "Involuntary full rematerialization"
        fallbacks in the round-2 multichip dryrun.  The stencil is pure
        elementwise work and partitions trivially.
        """
        act = get_activation("SiLU")
        x = SepConv(64, kernel_size=7, init_mode="torch_default", dtype=self.dtype,
                    name="static_sepconv1")(x)
        x = act(x)
        x = constrain_spatial(x)
        x = geocyclic_pad(x, 3)
        x = _Depthwise(
            kernel_size=7,
            features=64,
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, mode="fan_in", distribution="uniform"
            ),
            use_bias=True,
            dtype=self.dtype,
            name="static_depthwise",
        )(x)
        x = act(x)
        x = constrain_spatial(x)
        return SepConv(STATIC_DIM, kernel_size=5, init_mode="torch_default",
                       dtype=self.dtype, name="static_sepconv2")(x)
