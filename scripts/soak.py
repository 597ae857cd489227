"""Production-loop soak: a long flagship ``cli.train`` run with a mid-run
kill + resume, and a drift/leak report (VERDICT r4 next #5).

The 3000-step rehearsal proves the loop works; the reference's production
run is 300k steps (``config/paradis_settings.yaml:92-162``) — this drives
tens of thousands of optimizer steps through the REAL CLI (real store, real
checkpoint rotation, validation cadence, WSD decay tail) and reports what
long runs actually degrade on:

  * steps/s per logging window over the whole run (throughput drift),
  * host RSS slope after warmup (leak watch; ``host_rss_mb`` metric),
  * jit cache entries after warmup (retrace watch; ``jit_cache_entries``),
  * loss continuity across a SIGKILL at ~45% + ``init.restart=true`` resume.

Usage:
  python scripts/soak.py --workdir /root/soak [--steps 20000] [--batch 4]
  python scripts/soak.py --workdir /root/soak --report-only
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LEVELS_13 = [str(v) for v in (50, 100, 150, 200, 250, 300, 400, 500, 600,
                              700, 850, 925, 1000)]


def sh(cmd, **kw):
    print("+", " ".join(str(c) for c in cmd), flush=True)
    t0 = time.perf_counter()
    subprocess.run([str(c) for c in cmd], check=True, **kw)
    return time.perf_counter() - t0


def build_store(wd: Path):
    py = sys.executable
    if (wd / "prep" / "stats").exists():
        print("store exists, skipping synthesis", flush=True)
        return
    sh([py, "-m", "paradis_tpu.data.synthetic", "--out", wd / "raw",
        "--nlat", 32, "--nlon", 64, "--times", 1700,
        "--levels", *LEVELS_13, "--start", "2000-01-01T00:00:00"])
    sh([py, "-m", "paradis_tpu.cli.preprocess", "-i", wd / "raw",
        "-o", wd / "prep"])


def train_cmd(wd: Path, steps: int, batch: int):
    return [sys.executable, "-m", "paradis_tpu.cli.train",
            f"dataset.root_dir={wd / 'prep'}",
            "training.dataset.start_date=2000-01-01",
            "training.dataset.end_date=2000-12-31",
            "training.validation_dataset.start_date=2001-01-01",
            "training.validation_dataset.end_date=2001-01-15",
            "training.validation_dataset.validation_batches=8",
            "training.validation_dataset.validation_every_n_steps=2000",
            f"training.dataset.batch_size={batch}",
            "training.dataset.preload=true",
            f"training.max_steps={steps}",
            "training.max_epochs=100000",
            "training.scheduler.wsd.warmup=1000",
            "training.scheduler.wsd.decay=0.2",
            "training.optimizer.name=normuon",
            "training.sync_every_n_steps=40",
            "training.log_every_n_steps=40",
            "training.checkpointing.enabled=true",
            "training.checkpointing.step_every=100",
            f"training.log_dir={wd / 'logs'}",
            "training.progress_bar=false"]


def metrics_rows(wd: Path):
    rows = []
    path = wd / "logs" / "metrics.csv"
    if not path.exists():
        return rows
    with open(path) as f:
        for r in csv.DictReader(f):
            rows.append(r)
    return rows


def last_step(wd: Path) -> int:
    best = 0
    for r in metrics_rows(wd):
        if r["name"] == "train_loss":
            best = max(best, int(r["step"]))
    return best


def run_until(wd: Path, steps: int, batch: int, kill_at: int | None,
              label: str) -> dict:
    """Run cli.train; if kill_at is given, SIGKILL once metrics pass it."""
    out = {"label": label}
    logf = open(wd / f"train_{label}.log", "ab")
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [str(c) for c in train_cmd(wd, steps, batch)],
        stdout=logf, stderr=subprocess.STDOUT)
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                out["exit"] = rc
                break
            if kill_at is not None and last_step(wd) >= kill_at:
                print(f"[soak] SIGKILL at metrics step {last_step(wd)}",
                      flush=True)
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                out["exit"] = "SIGKILL"
                break
            time.sleep(30)
    finally:
        logf.close()
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    out["last_step"] = last_step(wd)
    return out


def report(wd: Path, resume_step: int | None) -> dict:
    rows = metrics_rows(wd)
    by_name: dict[str, list[tuple[int, float]]] = {}
    for r in rows:
        try:
            by_name.setdefault(r["name"], []).append(
                (int(r["step"]), float(r["value"])))
        except ValueError:
            continue

    def series(name):
        return sorted(by_name.get(name, []))

    sps = series("samples_per_sec")
    rss = series("host_rss_mb")
    cache = series("jit_cache_entries")
    loss = series("train_loss")
    rep: dict = {"logged_windows": len(sps)}
    if sps:
        vals = [v for _, v in sps]
        n = len(vals)
        rep["samples_per_sec"] = {
            "first_quarter_mean": round(sum(vals[: n // 4 or 1]) / (n // 4 or 1), 2),
            "last_quarter_mean": round(sum(vals[-(n // 4 or 1):]) / (n // 4 or 1), 2),
            "max": round(max(vals), 2), "min": round(min(vals), 2),
        }
    if rss:
        # slope after warmup (first 10% dropped), MB per 1k steps
        tail = rss[max(1, len(rss) // 10):]
        if len(tail) >= 2:
            (s0, v0), (s1, v1) = tail[0], tail[-1]
            rep["rss_mb"] = {
                "after_warmup": round(v0, 1), "final": round(v1, 1),
                "mb_per_1k_steps": round((v1 - v0) / max(1, s1 - s0) * 1000, 3),
            }
    if cache:
        vals = [int(v) for _, v in cache]
        rep["jit_cache_entries"] = {"warmup": vals[min(2, len(vals) - 1)],
                                    "final": vals[-1]}
    if loss and resume_step:
        pre = [v for s, v in loss if s <= resume_step][-5:]
        post = [v for s, v in loss if s > resume_step][:5]
        rep["resume_continuity"] = {
            "kill_resume_step": resume_step,
            "pre_kill_losses": [round(v, 4) for v in pre],
            "post_resume_losses": [round(v, 4) for v in post],
        }
    if loss:
        rep["loss"] = {"first": round(loss[0][1], 4),
                       "final": round(loss[-1][1], 4)}
    val = series("val_loss")
    if val:
        rep["val_loss"] = {str(s): round(v, 4) for s, v in val}
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--kill-frac", type=float, default=0.45)
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    state_path = wd / "soak_state.json"
    if args.report_only:
        st = json.loads(state_path.read_text()) if state_path.exists() else {}
        print(json.dumps(report(wd, st.get("resume_step")), indent=1))
        return

    build_store(wd)
    kill_at = int(args.steps * args.kill_frac)
    seg1 = run_until(wd, args.steps, args.batch, kill_at, "seg1")
    resume_step = seg1["last_step"]
    state_path.write_text(json.dumps({"resume_step": resume_step}))

    # resume: full state from the checkpoints root (follows last.json)
    os.environ["PARADIS_SOAK_RESUME"] = "1"
    cmd_extra = [f"init.checkpoint_path={wd / 'logs' / 'checkpoints'}",
                 "init.restart=true"]
    logf = open(wd / "train_seg2.log", "ab")
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [str(c) for c in train_cmd(wd, args.steps, args.batch) + cmd_extra],
        stdout=logf, stderr=subprocess.STDOUT)
    rc = proc.wait()
    logf.close()
    seg2 = {"label": "seg2", "exit": rc,
            "wall_s": round(time.perf_counter() - t0, 1),
            "last_step": last_step(wd)}

    summary = {"segments": [seg1, seg2],
               "report": report(wd, resume_step)}
    (wd / "soak_summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
