"""Checkpoint-migration CLI: reference torch .ckpt → paradis_tpu params.

    python -m paradis_tpu.cli.convert --ckpt ref.ckpt --out params_dir \
        --nlat 32 --nlon 64 [--config cfg.yaml] [overrides...]

The converted params directory loads with ``init.checkpoint_path`` (weights-
only) or ``--checkpoint-path`` on the forecast CLI.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert a reference torch checkpoint.")
    p.add_argument("--ckpt", required=True, help="reference .ckpt / state_dict")
    p.add_argument("--out", required=True, help="output orbax params dir")
    p.add_argument("--config", default=None)
    p.add_argument("--nlat", type=int, required=True)
    p.add_argument("--nlon", type=int, required=True)
    p.add_argument("--input-dim", type=int, default=None,
                   help="model input channels (default: derived from config)")
    p.add_argument("--output-dim", type=int, default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from paradis_tpu.config import load_config
    from paradis_tpu.model.paradis import Paradis
    from paradis_tpu.sphere.geometry import equiangular_lat_lon
    from paradis_tpu.train.checkpoint import save_params
    from paradis_tpu.train.convert import convert_torch_checkpoint

    cfg = load_config(args.config, overrides=args.overrides)
    n_levels = len(cfg.features.pressure_levels)
    n_common = (len(cfg.features.input.atmospheric) * n_levels
                + len(cfg.features.input.surface))
    n_time = int(cfg.dataset.n_time_inputs)
    input_dim = args.input_dim or (
        n_common * n_time
        + len(cfg.features.input.forcings) * n_time
        + len(cfg.features.input.constants)
    )
    output_dim = args.output_dim or (
        len(cfg.features.output.atmospheric) * n_levels
        + len(cfg.features.output.surface)
    )

    lat, lon = equiangular_lat_lon(args.nlat, args.nlon, include_poles=False)
    model = Paradis.from_config(cfg, input_dim=input_dim, output_dim=output_dim,
                                lat_deg=lat, lon_deg=lon, dtype=jnp.float32)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.nlat, args.nlon, input_dim))
    )
    params = convert_torch_checkpoint(args.ckpt, template)
    save_params(args.out, params)
    n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    print(f"converted {args.ckpt} -> {args.out} ({n:,} parameters)")


if __name__ == "__main__":
    main()
