"""Plot train/val loss curves from a run's metrics.csv → PNG.

Equivalent of the reference's TensorBoard-event plotter
(``scripts/print_progress.py``), reading the CSV the trainer always writes.

    python scripts/plot_progress.py --log-dir logs --out progress.png
"""

import argparse
import csv
from collections import defaultdict
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", required=True)
    p.add_argument("--out", default="progress.png")
    p.add_argument("--metrics", nargs="+", default=["train_loss", "val_loss"])
    args = p.parse_args()

    series = defaultdict(lambda: ([], []))
    with open(Path(args.log_dir) / "metrics.csv") as f:
        for row in csv.DictReader(f):
            if row["name"] in args.metrics:
                xs, ys = series[row["name"]]
                xs.append(int(row["step"]))
                ys.append(float(row["value"]))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for name, (xs, ys) in series.items():
        ax.plot(xs, ys, label=name)
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
