"""Export CLI: trained checkpoint -> serialized serving artifact.

    python -m paradis_tpu.cli.export --config cfg.yaml \
        --checkpoint-path ckpt_dir --output-dir artifact/ [--batch-size 1]

The artifact (StableHLO forward + params + manifest; see
``paradis_tpu.forecast.export``) runs forecasts without the model code.
The reference has no equivalent — its deployment unit is the Lightning
checkpoint plus the full source tree (reference ``forecast.py:62-118``).
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

from paradis_tpu.config import load_config


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export a serving artifact.")
    p.add_argument("--config", default=None, help="Path to config YAML")
    p.add_argument("--checkpoint-path", required=True)
    p.add_argument("--output-dir", required=True, help="Artifact directory")
    p.add_argument("--root-dir", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (default: current backend), "
                        "e.g. --platforms tpu cpu")
    p.add_argument("overrides", nargs="*", help="key.path=value overrides")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config, overrides=args.overrides)
    cfg.init.checkpoint_path = args.checkpoint_path
    if args.root_dir:
        cfg.dataset.root_dir = args.root_dir
    cfg.compute.use_amp = False  # serve in fp32, like the forecast CLI

    from paradis_tpu.utils.system import pin_platform

    pin_platform(cfg)

    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.forecast.export import save_artifact
    from paradis_tpu.model.paradis import Paradis
    from paradis_tpu.train.checkpoint import load_params

    dataset = ERA5Dataset(
        cfg.dataset.root_dir,
        cfg.training.dataset.start_date,
        cfg.training.dataset.end_date,
        forecast_steps=1,
        cfg=cfg,
    )
    model = Paradis.from_config(
        cfg, input_dim=dataset.num_in_features,
        output_dim=dataset.num_out_features,
        lat_deg=dataset.lat, lon_deg=dataset.lon, dtype=jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, dataset.lat_size, dataset.lon_size,
                   dataset.num_in_features)),
    )
    params = load_params(args.checkpoint_path, params)

    out = save_artifact(
        args.output_dir, model, params, cfg,
        batch_size=args.batch_size,
        nlat=dataset.lat_size, nlon=dataset.lon_size,
        input_dim=dataset.num_in_features,
        output_dim=dataset.num_out_features,
        n_common=dataset.num_common_features,
        feature_names=list(dataset.dyn_output_features),
        platforms=args.platforms,
    )
    print(f"serving artifact written: {out}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
