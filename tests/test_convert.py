"""Torch-checkpoint migration: reference weights → our params → same forward."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, str(REFERENCE))

import jax.numpy as jnp

from paradis_tpu.train.convert import convert_torch_checkpoint, torch_state_dict_to_params

from test_reference_parity import H, IN_DIM, W, _build_jax, _build_reference, _cfg


def test_convert_reference_state_dict_preserves_forward():
    """ref torch model → convert → our model produces identical outputs."""
    cfg = _cfg()
    cfg.model.adv_interpolation = "bicubic"
    ref = _build_reference(cfg)  # randomly initialized torch reference
    model, params_template = _build_jax(cfg)

    params = torch_state_dict_to_params(ref.state_dict(), params_template)

    x = np.random.default_rng(1).normal(size=(1, H, W, IN_DIM)).astype(np.float32)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    assert ours.std() > 0.01
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_convert_lightning_ckpt_with_prefixes(tmp_path):
    """Lightning-style .ckpt with model./._orig_mod. prefixes loads too."""
    cfg = _cfg()
    ref = _build_reference(cfg)
    model, params_template = _build_jax(cfg)

    sd = {f"model.{k}".replace("input_proj.", "input_proj._orig_mod."): v
          for k, v in ref.state_dict().items()}
    ckpt = {"state_dict": sd, "epoch": 3}
    path = tmp_path / "ref.ckpt"
    torch.save(ckpt, path)

    params = convert_torch_checkpoint(str(path), params_template)
    x = np.random.default_rng(2).normal(size=(1, H, W, IN_DIM)).astype(np.float32)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, theirs.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_convert_shape_mismatch_raises():
    cfg = _cfg()
    ref = _build_reference(cfg)
    cfg2 = _cfg()
    cfg2.model.latent_size = 24  # different width
    from test_reference_parity import _build_jax as bj

    import jax
    from paradis_tpu.model.paradis import Paradis as JaxParadis
    from paradis_tpu.sphere.geometry import equiangular_lat_lon

    lat, lon = equiangular_lat_lon(H, W, include_poles=False)
    model2 = JaxParadis.from_config(cfg2, input_dim=IN_DIM, output_dim=14,
                                    lat_deg=lat, lon_deg=lon, dtype=jnp.float32)
    tmpl = model2.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, IN_DIM)))
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_state_dict_to_params(ref.state_dict(), tmpl)
