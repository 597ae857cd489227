"""Serialized deployment artifacts for the trained model (``jax.export``).

The reference has no deployment story beyond "load the Lightning checkpoint
in Python" (reference ``forecast.py:62-118``).  On TPU the natural serving
artifact is the compiled program itself: ``jax.export`` lowers the jitted
forward step to versioned StableHLO with shape/dtype/platform metadata, so a
serving process can run forecasts **without the model code** (and with
guaranteed numerical identity to the exporting build — same HLO, same
compiler).

Artifact layout (a directory):

    forward.shlo   serialized ``jax.export.Exported`` of one forward step
                   ``(params, x[B,H,W,Cin]) -> y[B,H,W,Cout]`` (fp32, the
                   forecast configuration — reference forecast.py:85)
    params.npz     flattened parameter tree ("/"-joined keys)
    manifest.json  shapes, dtypes, feature bookkeeping (n_common, n_time —
                   everything ``autoregress_next_input`` needs to roll the
                   model forward), jax/export versions, platforms, and the
                   full config YAML snapshot

Params stay an *argument* (not baked-in constants) so the artifact is small
and one export serves many checkpoints of the same architecture.
``load_artifact`` returns a ``ServingModel`` that reproduces the exporting
model's outputs up to compute-dtype reassociation from the reload-side
recompile (same StableHLO, freshly scheduled): ~2e-7 in fp32 at toy scale
(``tests/test_export.py``), ~1 bf16 ulp (0.0098) for the bf16 flagship
model driven on a real TPU chip (BASELINE.md round-4 table).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

_FORWARD_FILE = "forward.shlo"
_ROLLOUT_FILE = "rollout.shlo"
_PARAMS_FILE = "params.npz"
_MANIFEST_FILE = "manifest.json"
_SEP = "/"


def _flatten_params(params) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(_SEP)
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def export_forward(model, params, batch_size: int, nlat: int, nlon: int,
                   input_dim: int, platforms: list[str] | None = None):
    """``jax.export.Exported`` of ``(params, x) -> model.apply(params, x)``.

    Shapes are static (the TPU compilation model — SURVEY §7 hard part #6);
    export one artifact per serving batch size.  ``platforms`` defaults to
    the current backend; pass e.g. ``["tpu", "cpu"]`` for a multi-platform
    artifact (larger, but runs anywhere).
    """

    def forward(p, x):
        return model.apply(p, x)

    x_spec = jax.ShapeDtypeStruct((batch_size, nlat, nlon, input_dim),
                                  jnp.float32)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = platforms
    return jax_export.export(jax.jit(forward), **kwargs)(p_spec, x_spec)


def export_rollout(model, params, cfg, *, batch_size: int, nlat: int,
                   nlon: int, n_common: int, dyn_dim: int, forcing_dim: int,
                   const_dim: int, platforms: list[str] | None = None):
    """``jax.export.Exported`` of the K-step scanned forecast rollout.

    ``(params, input[B,H,W,dyn], forcings[B,S,H,W,F], constants[B,H,W,K])
    -> stored [B,T,H,W,Cout]`` — the same jitted ``lax.scan`` program the
    in-process forecast runs (``forecast.rollout.make_forecast_rollout``), so
    a K-step forecast is ONE ``Exported.call`` dispatch instead of K
    step-at-a-time calls through ``forward.shlo`` (each of which pays a
    host round-trip and loses scan fusion/donation).
    """
    from paradis_tpu.forecast.rollout import make_forecast_rollout

    S = int(cfg.model.forecast_steps)
    rollout = make_forecast_rollout(model, cfg)

    def fn(p, dyn, forcings, constants):
        return rollout(p, {"input": dyn, "forcings": forcings,
                           "constants": constants}, n_common)

    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    specs = (
        p_spec,
        jax.ShapeDtypeStruct((batch_size, nlat, nlon, dyn_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, S, nlat, nlon, forcing_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((batch_size, nlat, nlon, const_dim), jnp.float32),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = platforms
    return jax_export.export(jax.jit(fn), **kwargs)(*specs)


def save_artifact(out_dir, model, params, cfg, *, batch_size: int, nlat: int,
                  nlon: int, input_dim: int, output_dim: int, n_common: int,
                  feature_names: list[str] | None = None,
                  platforms: list[str] | None = None,
                  include_rollout: bool = True) -> Path:
    """Export + write the serving artifact directory; returns its path.

    ``include_rollout`` additionally exports the scanned K-step rollout
    (``rollout.shlo``, K = ``cfg.model.forecast_steps``) — the file a
    forecast server should prefer (see the manifest's ``serving_note``).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    exported = export_forward(model, params, batch_size, nlat, nlon,
                              input_dim, platforms=platforms)
    (out / _FORWARD_FILE).write_bytes(exported.serialize())
    flat = _flatten_params(params)
    # Fail at EXPORT time (not at Exported.call in the serving process) if the
    # params tree cannot round-trip through the "/"-joined flat layout — e.g.
    # a list/tuple node whose SequenceKey indices would rebuild as a dict of
    # string keys and only surface as a treedef mismatch at load.
    if (jax.tree_util.tree_structure(_unflatten_params(flat))
            != jax.tree_util.tree_structure(params)):
        raise ValueError(
            "params tree does not round-trip through the flat npz layout "
            "(non-dict container nodes?); refusing to write a broken artifact")
    np.savez(out / _PARAMS_FILE, **flat)

    manifest = {
        "format": "paradis_tpu.export.v1",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "input_shape": [batch_size, nlat, nlon, input_dim],
        "output_shape": [batch_size, nlat, nlon, output_dim],
        "dtype": "float32",
        "n_common": int(n_common),
        "n_time": int(cfg.dataset.n_time_inputs),
        "feature_names": feature_names,
        "config_yaml": cfg.to_yaml(),
    }

    if include_rollout:
        n_time = int(cfg.dataset.n_time_inputs)
        dyn_dim = int(n_common) * n_time
        forcing_dim = len(cfg.features.input.forcings) * n_time
        const_dim = input_dim - dyn_dim - forcing_dim
        S = int(cfg.model.forecast_steps)
        out_freq = int(cfg.forecast.output_frequency)
        exported_rollout = export_rollout(
            model, params, cfg, batch_size=batch_size, nlat=nlat, nlon=nlon,
            n_common=n_common, dyn_dim=dyn_dim, forcing_dim=forcing_dim,
            const_dim=const_dim, platforms=platforms)
        (out / _ROLLOUT_FILE).write_bytes(exported_rollout.serialize())
        t_stored = len(range(0, S, out_freq))
        manifest["rollout"] = {
            "file": _ROLLOUT_FILE,
            "forecast_steps": S,
            "output_frequency": out_freq,
            "input_shapes": {
                "input": [batch_size, nlat, nlon, dyn_dim],
                "forcings": [batch_size, S, nlat, nlon, forcing_dim],
                "constants": [batch_size, nlat, nlon, const_dim],
            },
            "output_shape": [batch_size, t_stored, nlat, nlon, output_dim],
        }
        manifest["serving_note"] = (
            "prefer rollout.shlo for multi-step forecasts (one dispatch, "
            "scan-fused); forward.shlo is the step-at-a-time fallback")
    (out / _MANIFEST_FILE).write_text(json.dumps(manifest, indent=1))
    return out


class ServingModel:
    """A loaded artifact: ``model(x)`` runs the exported forward step.

    ``step(x)`` plus the manifest's ``n_common``/``n_time`` is everything a
    serving loop needs to autoregress (``train.step.autoregress_next_input``
    semantics, reference ``trainer.py:710-729``).
    """

    def __init__(self, exported, params, manifest: dict,
                 exported_rollout=None):
        self._exported = exported
        self._exported_rollout = exported_rollout
        self.params = params
        self.manifest = manifest

    def __call__(self, x):
        return self._exported.call(self.params, x)

    @property
    def has_rollout(self) -> bool:
        return self._exported_rollout is not None

    def rollout(self, dyn_input, forcings, constants):
        """One-dispatch K-step forecast via the exported scanned rollout.

        Shapes per ``manifest["rollout"]["input_shapes"]``; returns the
        stored trajectory ``[B, T, H, W, Cout]``.
        """
        if self._exported_rollout is None:
            raise ValueError("artifact has no rollout.shlo (exported with "
                             "include_rollout=False)")
        return self._exported_rollout.call(self.params, dyn_input, forcings,
                                           constants)

    @property
    def platforms(self):
        return tuple(self._exported.platforms)


def load_artifact(artifact_dir) -> ServingModel:
    art = Path(artifact_dir)
    exported = jax_export.deserialize((art / _FORWARD_FILE).read_bytes())
    rollout_path = art / _ROLLOUT_FILE
    exported_rollout = (jax_export.deserialize(rollout_path.read_bytes())
                        if rollout_path.exists() else None)
    with np.load(art / _PARAMS_FILE) as npz:
        params = _unflatten_params({k: npz[k] for k in npz.files})
    # Commit params to the device ONCE at load: ``Exported.call`` transfers
    # host arrays on every invocation, and the flagship tree is ~240 MB — on
    # the tunnel that re-transfer alone made an artifact-driven forecast
    # 11.7x slower than the in-process rollout (BASELINE.md round-5 row).
    params = jax.tree.map(jnp.asarray, params)
    manifest = json.loads((art / _MANIFEST_FILE).read_text())
    return ServingModel(exported, params, manifest, exported_rollout)
