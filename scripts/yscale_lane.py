#!/usr/bin/env python
"""Lateral-rich DVL y-scale recovery lane (VERDICT r4 item 7).

The production bench trajectory is a ~4 deg crab where lateral body
velocity is ~7% of forward — the y-axis DVL scale is unobservable by
design there, so the basis solve's honest-y contract was only ever
demonstrated on unit fixtures (tests/test_scale_calibration.py). This lane
replays the FULL production pipeline on a 20 deg-crab survey (lateral
velocity ~36% of forward, the regime of a vehicle ferrying across a
current) over N seeds and scores per-axis scale recovery end to end.

A 20 deg crab rotates the sonar FOV off the track tangent, which degrades
revisit co-visibility (docs/ACCURACY.md measured loop-registration damage
beyond ~8 deg) — ATE is reported for honesty but the lane's contract is
scale recovery, not trajectory accuracy.

Usage: python scripts/yscale_lane.py [--seeds 3] [--tpu]
       [--out docs/YSCALE_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from dataclasses import replace

from sonar_slam_tpu.io.simulate import simulate_bag
from sonar_slam_tpu.pipeline import ate_rmse, replay
from sonar_slam_tpu.slam import FeatureConfig
from error_budget import bench_params, bench_rparams, setups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--crab", type=float, default=20.0)
    ap.add_argument("--min-hits", type=int, default=1,
                    help="FeatureConfig.min_voxel_hits (production: 1 — the "
                         "hard gate starves the count-priced gates, "
                         "docs/ACCURACY.md round 5)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    sim0, dims, kf_t = setups(True)
    sim0 = replace(sim0, crab_deg=args.crab)
    params = bench_params(dims, kf_t, full=True)
    fc = FeatureConfig(max_points=dims.max_points,
                       min_voxel_hits=max(args.min_hits, 1))
    rp = bench_rparams(True)

    per_seed = []
    for seed in range(args.seeds):
        bag = simulate_bag(replace(sim0, seed=seed))
        t0 = time.time()
        res = replay(bag, fc, params, dims, refine_params=rp)
        wall = time.time() - t0
        nk = res.num_keyframes
        truth = bag.true_pose_at_ping[res.keyframe_ping_idx][:nk]
        est = 1.0 / np.exp(np.asarray(res.carry.graph.log_scale))
        true = np.asarray(bag.true_dvl_scale)[:2]
        rec = {
            "seed": seed,
            "crab_deg": args.crab,
            "est_scale_xy": [round(float(v), 5) for v in est],
            "true_scale_xy": [round(float(v), 5) for v in true],
            "x_err_pct": round(abs(float(est[0] - true[0])) * 100, 3),
            "y_err_pct": round(abs(float(est[1] - true[1])) * 100, 3),
            "ate_cm": round(ate_rmse(res.trajectory, truth) * 100, 2),
            "loops": int(res.carry.num_loops),
            "wall_s": round(wall, 1),
        }
        per_seed.append(rec)
        print(json.dumps(rec), flush=True)

    ye = np.array([r["y_err_pct"] for r in per_seed])
    xe = np.array([r["x_err_pct"] for r in per_seed])
    summary = {
        "lane": "yscale",
        "crab_deg": args.crab,
        "seeds": args.seeds,
        "y_err_pct": {"mean": round(float(ye.mean()), 3),
                      "max": round(float(ye.max()), 3)},
        "x_err_pct": {"mean": round(float(xe.mean()), 3),
                      "max": round(float(xe.max()), 3)},
        "per_seed": per_seed,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
