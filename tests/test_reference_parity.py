"""Full-model numerical parity against the reference PyTorch implementation.

Builds the actual reference ``Paradis`` (imported from /root/reference as a
validation oracle — skipped when absent), transplants the parameters of our
JAX model into it, and compares complete forward passes.  This pins down the
physics fidelity of the rebuild end-to-end: projections, static encoder,
velocity nets, rotated-frame departure points, grid-sample interpolation,
pole handling, gating, diffusion/reaction, upsample + skip.
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

from paradis_tpu.config import default_config
from paradis_tpu.model.paradis import Paradis as JaxParadis
from paradis_tpu.sphere.geometry import equiangular_lat_lon

H, W = 8, 16
N_STATIC = 10
N_COMMON = 12
N_TIME = 2
N_FORCINGS = 3
IN_DIM = N_COMMON * N_TIME + N_FORCINGS + N_STATIC
OUT_DIM = N_COMMON + 2
HIDDEN = 16
NUM_VELS = 4
LAYERS = 2


def _cfg():
    cfg = default_config().resolved()
    cfg.model.latent_size = HIDDEN
    cfg.model.velocity_vectors = NUM_VELS
    cfg.model.num_layers = LAYERS
    cfg.model.bias_channels = 2
    cfg.model.bias_rank = 3
    cfg.model.physblock.velocity_net.hidden_dim = 8
    cfg.model.physblock.reaction.hidden_dim = 8
    cfg.model.physblock.output_proj.hidden_dim = 8
    cfg.features.input.constants = [f"c{i}" for i in range(N_STATIC - 2)] + [
        "latitude", "longitude"]
    cfg.compute.use_amp = False
    # parity is against the reference's EXACT departure-point trig; the
    # fast-trig default (configs/default.yaml) differs by up to ~6e-5
    cfg.compute.fast_departure_trig = False
    return cfg


class _DS:
    num_in_dyn_features = N_COMMON * N_TIME + N_FORCINGS
    num_in_static_features = N_STATIC


class _DM:
    dataset = _DS()
    num_common_features = N_COMMON
    num_out_features = OUT_DIM


def _build_reference(cfg):
    # the reference reads GlobalBias rank from its default (128); shrink it to
    # match by monkeypatching the default
    import model.blocks as rblocks

    orig = rblocks.GlobalBias.__init__

    def patched(self, input_dim, output_dim, *, bias=True, kernel_size=0,
                mesh_size, rank=128):
        orig(self, input_dim, output_dim, bias=bias, kernel_size=kernel_size,
             mesh_size=mesh_size, rank=cfg.model.bias_rank)

    rblocks.GlobalBias.__init__ = patched
    try:
        from model.paradis import Paradis as RefParadis

        lat, lon = equiangular_lat_lon(H, W, include_poles=False)
        latg, long_ = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")
        ref = RefParadis(_DM(), cfg, torch.tensor(latg, dtype=torch.float32),
                         torch.tensor(long_, dtype=torch.float32))
    finally:
        rblocks.GlobalBias.__init__ = orig
    return ref.eval()


def _build_jax(cfg):
    lat, lon = equiangular_lat_lon(H, W, include_poles=False)
    model = JaxParadis.from_config(
        cfg, input_dim=IN_DIM, output_dim=OUT_DIM, lat_deg=lat, lon_deg=lon,
        dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, IN_DIM)))
    return model, params


# -- parameter transplantation ---------------------------------------------------

def _conv1x1(kernel):   # flax Dense kernel [in,out] → torch Conv2d [out,in,1,1]
    return torch.from_numpy(np.asarray(kernel).T[:, :, None, None].copy())


def _depthwise(t):      # flax [k,k,1,C] → torch [C,1,k,k]
    return torch.from_numpy(np.transpose(np.asarray(t), (3, 2, 0, 1)).copy())


def _linear(t):         # flax [in,out] → torch [out,in]
    return torch.from_numpy(np.asarray(t).T.copy())


def _t(t):
    return torch.from_numpy(np.asarray(t).copy())


def _copy_gmblock(dst_module, src: dict):
    """Transplant one of our GMBlock param subtrees into a torch GMBlock."""
    state = dst_module.state_dict()
    for key in list(state.keys()):
        parts = key.split(".")
        mod, leaf = parts[0], parts[-1]
        if mod == "0-ChannelNorm" and "pre_norm" in src:
            state[key] = _t(src["pre_norm"][leaf])
        elif mod.endswith("-ChannelNorm"):
            idx = mod.split("-")[0]
            state[key] = _t(src[f"layer{idx}_ChannelNorm"][leaf])
        elif mod.endswith("-CLinear"):
            idx = mod.split("-")[0]
            ours = src[f"layer{idx}_CLinear"]["conv"]
            state[key] = _conv1x1(ours["kernel"]) if leaf == "weight" \
                else _t(ours["bias"])
        elif mod.endswith("-SepConv"):
            idx = mod.split("-")[0]
            ours = src[f"layer{idx}_SepConv"]
            sub = parts[1]
            if sub == "depthwise":
                state[key] = _depthwise(ours["depthwise"]["kernel"])
            elif sub == "pointwise":
                state[key] = _conv1x1(ours["pointwise"]["kernel"]) \
                    if leaf == "weight" else _t(ours["pointwise"]["bias"])
        elif mod == "0-GlobalBias":
            ours = src["bias0_GlobalBias"]
            if leaf in ("A", "U", "V"):
                state[key] = _t(ours[leaf])
            elif parts[1] == "projection":
                state[key] = _linear(ours["projection"])
    dst_module.load_state_dict(state)


def _copy_all(ref, params):
    p = params["params"]
    _copy_gmblock(ref.input_proj, p["input_proj"])
    _copy_gmblock(ref.output_proj, p["output_proj"])

    # static encoder: Sequential(SepConv, SiLU, GeoPad, Conv2d, SiLU, SepConv)
    se = ref.static_encoder
    se[0].depthwise.weight.data = _depthwise(p["static_sepconv1"]["depthwise"]["kernel"])
    se[0].pointwise.weight.data = _conv1x1(p["static_sepconv1"]["pointwise"]["kernel"])
    se[0].pointwise.bias.data = _t(p["static_sepconv1"]["pointwise"]["bias"])
    se[3].weight.data = _depthwise(p["static_depthwise"]["kernel"])
    se[3].bias.data = _t(p["static_depthwise"]["bias"])
    se[5].depthwise.weight.data = _depthwise(p["static_sepconv2"]["depthwise"]["kernel"])
    se[5].pointwise.weight.data = _conv1x1(p["static_sepconv2"]["pointwise"]["kernel"])
    se[5].pointwise.bias.data = _t(p["static_sepconv2"]["pointwise"]["bias"])

    layers = p["layers"]
    ref.alpha_adv.data = _t(layers["alpha_adv"])

    def slice_layer(tree, i):
        return jax.tree.map(lambda x: x[i], tree)

    for i in range(LAYERS):
        _copy_gmblock(ref.velocity_nets[i], slice_layer(layers["velocity_net"], i))
        _copy_gmblock(ref.diffusion[i], slice_layer(layers["diffusion"], i))
        _copy_gmblock(ref.reaction[i], slice_layer(layers["reaction"], i))
        adv = slice_layer(layers["advection"], i)
        _copy_gmblock(ref.advection[i].down_projection, adv["down_projection"])
        _copy_gmblock(ref.advection[i].up_projection, adv["up_projection"])


@pytest.mark.parametrize("interpolation", ["bilinear", "bicubic"])
def test_full_forward_parity_with_reference(interpolation):
    cfg = _cfg()
    cfg.model.adv_interpolation = interpolation
    ref = _build_reference(cfg)
    model, params = _build_jax(cfg)
    _copy_all(ref, params)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, H, W, IN_DIM)).astype(np.float32)

    ours = np.asarray(model.apply(params, jnp.asarray(x)))

    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == theirs.shape
    assert ours.std() > 0.01  # non-vacuous comparison
    # measured: max |diff| ≈ 3e-7 on outputs with std ≈ 0.11
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
