#!/usr/bin/env python
"""Overlay repeated-run trajectories for visual regression checking — the
analog of the reference's scripts/utils/plot_runs.py (which overlays the 10
run_bag.sh trajectories into a PDF)."""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs_dir", nargs="?", default="runs")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = sorted(glob.glob(os.path.join(args.runs_dir, "*", "trajectory.npz")))
    if not files:
        sys.exit(f"no trajectory.npz files under {args.runs_dir}")

    fig, ax = plt.subplots(figsize=(9, 9))
    for f in files:
        d = np.load(f)
        t = d["trajectory"]
        ax.plot(t[:, 0], t[:, 1], lw=0.8, alpha=0.7,
                label=os.path.basename(os.path.dirname(f)))
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(f"{len(files)} replay runs")
    if len(files) <= 12:
        ax.legend(fontsize=7)
    out = args.out or os.path.join(args.runs_dir, "overlay.pdf")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")

    # determinism report: identical runs must produce identical trajectories
    trajs = [np.load(f)["trajectory"] for f in files]
    if len(trajs) > 1 and all(t.shape == trajs[0].shape for t in trajs[1:]):
        spread = max(
            float(np.abs(t - trajs[0]).max()) for t in trajs[1:]
        )
        print(f"max trajectory spread across runs: {spread:.2e} "
              f"({'deterministic' if spread == 0 else 'non-deterministic'})")


if __name__ == "__main__":
    main()
