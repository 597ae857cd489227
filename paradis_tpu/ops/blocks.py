"""Building-block layers for the PARADIS physics network (flax.linen, NHWC).

Functional parity targets (reference ``model/blocks.py``):
  * ``CLinear``            — 1×1 conv / channel-wise linear  (blocks.py:74-89)
  * ``SepConv``            — geocyclic-padded depthwise + pointwise (blocks.py:92-116)
  * ``ChannelNorm``        — channel LayerNorm with unbiased variance (blocks.py:118-134)
  * ``GlobalBias``         — rank-K factorized spatial bias A⊗U⊗V (+ channel
                             projection)                      (blocks.py:138-197)
  * ``PhysicalDownsample`` — geo-pad + 5×5 mean pool          (blocks.py:57-71)
  * ``GMBlock``            — config-programmable composer with pre-norm,
                             first-layer bias injection, per-layer activations,
                             kaiming init with last-conv 0.1 scale
                             (blocks.py:210-304, init at blocks.py:33-54)

TPU-first choices: channels-last layout (channel = lane dim), 1×1 convs as
``nn.Dense`` (pure MXU matmuls), parameters stored float32 with a bfloat16
compute dtype (the JAX analogue of the reference's bf16-mixed AMP).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from paradis_tpu.sphere.padding import geocyclic_pad


def kaiming_normal_init(scale: float = 1.0):
    """He/kaiming fan-in normal (relu gain), optionally scaled.

    Matches ``nn.init.kaiming_normal_(mode="fan_in", nonlinearity="relu")``
    with the post-init multiplicative ``scale`` used for last convs
    (reference ``model/blocks.py:33-39``): std = scale * sqrt(2 / fan_in).
    """
    return nn.initializers.variance_scaling(
        2.0 * scale * scale, mode="fan_in", distribution="normal"
    )


def torch_linear_default_init():
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Conv2d/Linear default init."""
    return nn.initializers.variance_scaling(1.0 / 3.0, mode="fan_in", distribution="uniform")


def _fanin_bias(_unused, fan_in: int):
    """Torch default bias init U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for a given fan-in."""
    bound = 1.0 / float(np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference ``model/paradis.py:17-28``)."""
    table = {
        "SiLU": nn.silu,
        # torch nn.GELU defaults to the exact erf formulation
        "GELU": lambda x: nn.gelu(x, approximate=False),
    }
    if name not in table:
        raise ValueError(f"Unknown activation_fn {name!r}. Allowed: {list(table)}")
    return table[name]


class CLinear(nn.Module):
    """Channel-wise linear map (the 1×1 conv of the reference) as a Dense."""

    output_dim: int
    use_bias: bool = True
    kernel_scale: float = 1.0
    init_mode: str = "kaiming"  # "kaiming" (GMBlock members) | "torch_default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.init_mode == "kaiming":
            kinit, binit = kaiming_normal_init(self.kernel_scale), nn.initializers.zeros
        else:
            kinit = binit = torch_linear_default_init()
        return nn.Dense(
            self.output_dim,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=_fanin_bias(binit, x.shape[-1]) if self.init_mode != "kaiming" else binit,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class _Depthwise(nn.Module):
    """Depthwise k×k conv as an explicit shift-and-FMA stencil.

    Mathematically identical to ``nn.Conv(feature_group_count=C)`` on the
    pre-padded input (same ``kernel`` param name/shape, (k, k, 1, C)), but
    its autodiff stays elementwise: the grouped-conv weight gradient lowers
    to slow strided fusions on TPU (~0.25 ms per conv at 5.625°, measured),
    while the stencil's weight grad is k² fused multiply-reduces.
    """

    kernel_size: int
    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    use_bias: bool = False
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xpad: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, 1, self.features), jnp.float32)
        kd = kernel.astype(self.dtype)
        xpad = xpad.astype(self.dtype)
        out_h = xpad.shape[-3] - (k - 1)
        out_w = xpad.shape[-2] - (k - 1)
        acc = None
        for i in range(k):
            for j in range(k):
                # products in compute dtype, accumulation in fp32 (the conv
                # accumulator semantics under AMP); all fused by XLA
                term = (xpad[..., i : i + out_h, j : j + out_w, :]
                        * kd[i, j, 0]).astype(jnp.float32)
                acc = term if acc is None else acc + term
        out = acc.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class SepConv(nn.Module):
    """Separable conv: geocyclic pad → depthwise k×k → pointwise 1×1."""

    output_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    kernel_scale: float = 1.0  # applied to the pointwise (last) conv only
    init_mode: str = "kaiming"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2
        cin = x.shape[-1]
        if self.init_mode == "kaiming":
            dw_init = kaiming_normal_init(1.0)
            pw_init = kaiming_normal_init(self.kernel_scale)
            pw_bias = nn.initializers.zeros
        else:
            dw_init = pw_init = torch_linear_default_init()
            pw_bias = _fanin_bias(None, cin)
        x = geocyclic_pad(x, pad)
        x = _Depthwise(
            kernel_size=self.kernel_size,
            features=cin,
            kernel_init=dw_init,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        return nn.Dense(
            self.output_dim,
            use_bias=self.use_bias,
            kernel_init=pw_init,
            bias_init=pw_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise",
        )(x)


class ChannelNorm(nn.Module):
    """LayerNorm over the channel axis with unbiased variance, float32 stats.

    Matches ``torch.var_mean(x, dim=channel)`` (correction=1) +
    ``(eps + var) ** -0.5`` exactly (reference ``model/blocks.py:128-134``).
    Statistics are computed in float32 regardless of compute dtype — the
    reference runs this under AMP where var_mean autocasts poorly; fp32 here
    is both safer and free (VPU work).
    """

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / max(c - 1, 1)
        inv = jax.lax.rsqrt(self.eps + var)
        y = (xf - mean) * inv * weight + bias
        return y.astype(self.dtype)


class GlobalBias(nn.Module):
    """Low-rank factorized spatial bias: y = x + proj(Σ_k A_ck u_k v_kᵀ).

    Factors A∈R^{C_b×K}, U∈R^{K×H}, V∈R^{K×W} init N(0, 1e-3); optional
    channel projection (torch-Linear default init) when C_b ≠ C_out.
    Reference ``model/blocks.py:138-197``; the U/V factors are the objects the
    cross-resolution checkpoint-transfer hook linearly re-interpolates
    (``trainer.py:233-257``).
    """

    bias_channels: int
    output_dim: int
    mesh_size: tuple[int, int]
    rank: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.mesh_size
        small = nn.initializers.normal(stddev=1e-3)
        A = self.param("A", small, (self.bias_channels, self.rank), jnp.float32)
        U = self.param("U", small, (self.rank, H), jnp.float32)
        V = self.param("V", small, (self.rank, W), jnp.float32)
        maps = jnp.einsum("ck,kh,kw->hwc", A, U, V)
        if self.bias_channels != self.output_dim:
            # torch nn.Linear weight layout [out, in], default init
            proj = self.param(
                "projection",
                torch_linear_default_init(),
                (self.bias_channels, self.output_dim),
                jnp.float32,
            )
            maps = jnp.einsum("hwc,co->hwo", maps, proj)
        return x + maps.astype(x.dtype)


class PhysicalDownsample(nn.Module):
    """Anti-aliased downsample: geocyclic pad(2) + 5×5 mean pool, stride s."""

    stride: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # the reference pools even at stride 1 (a 5x5 smoothing pass).  The
        # mean is separable: 5-row sum then 5-col sum as static-slice adds —
        # pure fused elementwise work.  A grouped ones-kernel conv computes
        # the same thing but lowers to slow grouped-conv kernels on TPU
        # (~0.3 ms per call at 5.625° vs ~0.05 for the stencil, and the
        # backward grouped transposed conv is worse).
        out_dtype = x.dtype
        H, W = x.shape[-3], x.shape[-2]
        x = geocyclic_pad(x, 2)
        s = self.stride
        h_out = (H - 1) // s + 1
        w_out = (W - 1) // s + 1
        xf = x.astype(jnp.float32)
        rows = None
        for i in range(5):
            sl = xf[..., i : i + (h_out - 1) * s + 1 : s, :, :]
            rows = sl if rows is None else rows + sl
        acc = None
        for j in range(5):
            sl = rows[..., :, j : j + (w_out - 1) * s + 1 : s, :]
            acc = sl if acc is None else acc + sl
        return (acc * (1.0 / 25.0)).astype(out_dtype)


BLOCK_REGISTRY = {
    "SepConv": SepConv,
    "CLinear": CLinear,
    "ChannelNorm": ChannelNorm,
    "GlobalBias": GlobalBias,
}


def _normalize_seq(value, n, default):
    if isinstance(value, (list, tuple)):
        assert len(value) == n, f"expected {n} entries, got {len(value)}"
        return tuple(value)
    if value is None:
        value = default
    return (value,) * n


class GMBlock(nn.Module):
    """Generic Multilayer Block: a config-programmable layer stack.

    Mirrors reference ``model/blocks.py:210-304``: optional pre-norm, a list
    of registry layer names, hidden widths (``<=0`` → max(in, out)), a
    GlobalBias injected after the first layer when ``bias_channels > 0``,
    activations between layers (and optionally after the last), and kaiming
    init with the final conv scaled by 0.1.
    """

    layers: tuple
    input_dim: int
    output_dim: int
    mesh_size: tuple[int, int]
    kernel_size: Any = 5
    hidden_dim: Any = 0
    activation: Any = False
    activation_fn: str = "SiLU"
    bias_channels: int = 0
    bias_rank: int = 128
    pre_normalize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        names = tuple(self.layers)
        n = len(names)
        if n == 0:
            raise ValueError("GMBlock: must specify at least one layer")

        acts = _normalize_seq(self.activation, n, False)
        if not isinstance(self.activation, (list, tuple)):
            acts = (True,) * (n - 1) + (bool(self.activation),)
        ksizes = _normalize_seq(self.kernel_size, n, 5)

        hidden = self.hidden_dim
        if isinstance(hidden, (list, tuple)):
            assert len(hidden) == n - 1
            hidden = tuple(hidden)
        else:
            if hidden is None or hidden <= 0:
                hidden = max(self.input_dim, self.output_dim)
            hidden = (hidden,) * (n - 1)

        act_fn = get_activation(self.activation_fn)

        if self.pre_normalize:
            x = ChannelNorm(dtype=self.dtype, name="pre_norm")(x)

        # index of the layer holding the final conv (gets the 0.1 init scale)
        conv_layers = [i for i, l in enumerate(names) if l in ("CLinear", "SepConv")]
        last_conv_idx = conv_layers[-1] if conv_layers else -1

        for idx, lname in enumerate(names):
            out_dim = self.output_dim if idx == n - 1 else hidden[idx]
            scale = 0.1 if idx == last_conv_idx else 1.0
            if lname == "CLinear":
                x = CLinear(out_dim, kernel_scale=scale, dtype=self.dtype,
                            name=f"layer{idx}_CLinear")(x)
            elif lname == "SepConv":
                x = SepConv(out_dim, kernel_size=ksizes[idx], kernel_scale=scale,
                            dtype=self.dtype, name=f"layer{idx}_SepConv")(x)
            elif lname == "ChannelNorm":
                x = ChannelNorm(dtype=self.dtype, name=f"layer{idx}_ChannelNorm")(x)
            elif lname == "GlobalBias":
                x = GlobalBias(x.shape[-1], out_dim, self.mesh_size, rank=self.bias_rank,
                               dtype=self.dtype, name=f"layer{idx}_GlobalBias")(x)
            else:
                raise ValueError(
                    f"Unknown layer type: {lname}. Available: {list(BLOCK_REGISTRY)}"
                )

            if idx == 0 and self.bias_channels > 0:
                x = GlobalBias(
                    self.bias_channels,
                    out_dim,
                    self.mesh_size,
                    rank=self.bias_rank,
                    dtype=self.dtype,
                    name="bias0_GlobalBias",
                )(x)

            if acts[idx]:
                x = act_fn(x)

        return x
