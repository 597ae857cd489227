"""Host data-pipeline throughput: samples/sec from a preprocessed store.

Measures the full host path (native batched chunk decode, normalization, TOA
quadrature forcings, collation) feeding the training loop — run this to check
the host can keep the chip busy (the train step consumes ~18 samples/s on
v5e at the baseline workload).

    python scripts/bench_pipeline.py [--store DIR] [--samples 32]

Without --store, a 5.625°-sized synthetic store (32x64, 13 levels) is built
in a temp dir first.
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--store", default=None)
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--nlat", type=int, default=32,
                   help="synthetic store grid (128x256 = 1.40625°)")
    p.add_argument("--nlon", type=int, default=64)
    args = p.parse_args()

    from paradis_tpu.config import default_config
    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.data.pipeline import BatchLoader

    cfg = default_config().resolved()

    if args.store is None:
        from paradis_tpu.data.preprocess import preprocess
        from paradis_tpu.data.synthetic import build_raw_store

        tmp = Path(tempfile.mkdtemp(prefix="paradis_bench_"))
        print(f"building {args.nlat}x{args.nlon} synthetic store (one-time)...")
        build_raw_store(str(tmp / "raw"), nlat=args.nlat, nlon=args.nlon,
                        n_times=60, levels=tuple(cfg.features.pressure_levels))
        preprocess(str(tmp / "raw"), str(tmp / "store"), toa_time_stride=20)
        store = tmp / "store"
        start, end = "2000-01-01", "2000-01-12"
    else:
        store = Path(args.store)
        start = cfg.training.dataset.start_date
        end = cfg.training.dataset.end_date

    ds = ERA5Dataset(str(store), start, end, forecast_steps=1, cfg=cfg)
    n = min(args.samples, len(ds))
    loader = BatchLoader(ds, args.batch_size, shuffle=True, device_put=False)

    # warm caches
    _ = ds[0]
    t0 = time.perf_counter()
    seen = 0
    for batch in loader:
        seen += batch["input"].shape[0]
        if seen >= n:
            break
    dt = time.perf_counter() - t0
    print(f"host pipeline: {seen / dt:.2f} samples/s "
          f"({dt / seen * 1e3:.1f} ms/sample, {seen} samples)")


if __name__ == "__main__":
    main()
