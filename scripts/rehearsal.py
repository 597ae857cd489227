"""North-star full-dress rehearsal (VERDICT r1 missing #1 / next #3).

Exercises the COMPLETE production loop at flagship size on the real chip:

  1. synthesize a full-resolution WB2-shaped raw store (5.625°: 32x64, 13
     levels, ~14 months of 6-hourly states — train year + held-out window),
  2. preprocess it to the training layout (per-year stacked zarr + stats),
  3. train the flagship config (latent 1024 x 8 layers x 768 vels, NorMuon,
     WSD, bf16) for a few thousand real optimizer steps — in TWO segments
     with a checkpoint stop/resume in between (restart path exercised),
  4. run the reference forecast protocol (40 steps x 6 h, init every 36 h)
     over the held-out window (reference scripts/run_forecast.sh:9-27),
  5. score Z500/T850 lat-weighted RMSE at 24/72/120 h against held-out truth
     (forecast/evaluate.py).

Real-ERA5 numbers need the real WB2 archive (zero-egress environment); this
rehearsal pins the protocol, the plumbing, and the wall-clock on identically
shaped data.  Writes rehearsal_summary.json in --workdir.

Usage: python scripts/rehearsal.py --workdir /tmp/rehearsal [--steps 3000]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
LEVELS_13 = [50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000]


def sh(cmd: list[str], **kw) -> float:
    print("+", " ".join(map(str, cmd)), flush=True)
    t0 = time.perf_counter()
    subprocess.run([str(c) for c in cmd], check=True, cwd=REPO, **kw)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--times", type=int, default=None,
                    help="6-hourly states (default ~14 months; 400 highres)")
    ap.add_argument("--highres", action="store_true",
                    help="1.40625° (128x256) variant: shorter window, "
                    "gradient checkpointing, Pallas advection dispatch")
    ap.add_argument("--skip-data", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    nlat, nlon = (128, 256) if args.highres else (32, 64)
    steps = args.steps if args.steps is not None else (300 if args.highres else 3000)
    times = args.times if args.times is not None else (400 if args.highres else 1700)
    if args.highres:
        # 400 states = 100 days: train Jan-Mar 20, hold out Mar 21-Apr 10
        train_end, val_start, val_end = "2000-03-20", "2000-03-21", "2000-04-10"
        fc_start, fc_end = "2000-03-21", "2000-03-31"
    else:
        train_end, val_start, val_end = "2000-12-31", "2001-01-01", "2001-01-15"
        fc_start, fc_end = "2001-01-01", "2001-02-20"

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    summary: dict = {"steps": steps, "grid": f"{nlat}x{nlon}"}
    py = sys.executable

    # -- 1+2: data ---------------------------------------------------------------
    if not args.skip_data:
        t = sh([py, "-m", "paradis_tpu.data.synthetic", "--out", wd / "raw",
                "--nlat", nlat, "--nlon", nlon, "--times", times,
                "--levels", *LEVELS_13, "--start", "2000-01-01T00:00:00"])
        summary["synthesize_s"] = round(t, 1)
        t = sh([py, "-m", "paradis_tpu.cli.preprocess",
                "-i", wd / "raw", "-o", wd / "prep"])
        summary["preprocess_s"] = round(t, 1)

    common = [
        f"dataset.root_dir={wd / 'prep'}",
        "training.dataset.start_date=2000-01-01",
        f"training.dataset.end_date={train_end}",
        f"training.validation_dataset.start_date={val_start}",
        f"training.validation_dataset.end_date={val_end}",
        "training.validation_dataset.validation_batches=8",
        "training.scheduler.wsd.warmup=100",
        "training.scheduler.wsd.decay=0.1",
        "training.optimizer.name=normuon",
        "training.sync_every_n_steps=40",
        "training.log_every_n_steps=100",
        "training.validation_dataset.validation_every_n_steps=500",
        f"training.log_dir={wd / 'logs'}",
        "training.progress_bar=false",
        "training.max_epochs=1000",
    ]
    if args.highres:
        common += ["compute.gradient_checkpointing=true",
                   "training.sync_every_n_steps=8",
                   "training.validation_dataset.validation_every_n_steps=150"]

    # -- 3: two-segment training with restart ------------------------------------
    if not args.skip_train:
        half = steps // 2
        t = sh([py, "-m", "paradis_tpu.cli.train", *common,
                f"training.max_steps={half}"])
        summary["train_seg1_s"] = round(t, 1)
        t = sh([py, "-m", "paradis_tpu.cli.train", *common,
                f"training.max_steps={steps}",
                "init.restart=true",
                f"init.checkpoint_path={wd / 'logs' / 'checkpoints'}"])
        summary["train_seg2_s"] = round(t, 1)
        # throughput from the metrics CSV (long format: step,name,value)
        import csv

        with open(wd / "logs" / "metrics.csv") as f:
            sps = [float(r[2]) for r in csv.reader(f)
                   if len(r) == 3 and r[1] == "samples_per_sec"]
        if sps:
            summary["train_samples_per_sec"] = round(
                sum(sps[-10:]) / len(sps[-10:]), 2)

    # -- 4: forecast protocol ------------------------------------------------------
    ckpt = wd / "logs" / "checkpoints" / "last.json"
    ckpt_dir = json.loads(ckpt.read_text())["path"]
    t = sh([py, "-m", "paradis_tpu.cli.forecast",
            "--checkpoint-path", ckpt_dir,
            "--output-file", wd / "forecast.zarr",
            "--forecast-steps", 40, "--sampling-interval", "36h",
            "--start-date", fc_start, "--end-date", fc_end,
            f"dataset.root_dir={wd / 'prep'}"])
    summary["forecast_s"] = round(t, 1)

    # -- 5: score -------------------------------------------------------------------
    from paradis_tpu.forecast.evaluate import evaluate_store

    results = evaluate_store(str(wd / "forecast.zarr"), str(wd / "prep"),
                             [("geopotential", 500), ("temperature", 850)],
                             [24, 72, 120])
    summary["rmse"] = results
    (wd / "rehearsal_summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
