#!/usr/bin/env python
"""End-to-end probe of the corroboration gate's design choices.

Sweeps (corroborate_rho, corroborate_both) over the full-config replay on
selected seeds, on the ambient device. The gate runs OUTSIDE the fused
scan program, so variants only re-dispatch the small gate op — the big
compiled replay executable is reused across all variants (see memory:
traced-param experiment economics). Used to confirm/refute rho=0.3 + OR,
the values picked from the per-point kept-fraction probe
(docs/ACCURACY.md round 5).

Usage: python scripts/corr_probe.py [--cpu] [--seeds 1,2,4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
from dataclasses import replace  # noqa: E402

from sonar_slam_tpu.pipeline import (  # noqa: E402
    ate_heading_deg, ate_rmse, replay,
)
from sonar_slam_tpu.io.simulate import simulate_bag  # noqa: E402
from sonar_slam_tpu.slam import FeatureConfig  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from error_budget import bench_params, bench_rparams, setups  # noqa: E402

VARIANTS = [
    (0.30, False),  # shipped
    (0.20, False),
    (0.45, False),
    (0.30, True),
    (0.45, True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", default="1,2,4")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    sim0, dims, kf_t = setups(full=True)
    params = bench_params(dims, kf_t, full=True)
    rparams = bench_rparams(True)

    from bench import loop_metrics

    for seed in seeds:
        bag = simulate_bag(replace(sim0, seed=seed))
        for rho, both in VARIANTS:
            fc = FeatureConfig(max_points=dims.max_points, corroborate=True,
                               corroborate_rho=rho, corroborate_both=both)
            t0 = time.time()
            res = replay(bag, fc, params, dims, refine_params=rparams)
            wall = time.time() - t0
            nk = res.num_keyframes
            truth = bag.true_pose_at_ping[res.keyframe_ping_idx][:nk]
            lm = loop_metrics(res.carry, truth, dims.nssm_min_st_sep,
                              prox_radius=0.5 * dims.max_range)
            pts_per_kf = float(np.asarray(
                res.carry.pmasks).sum(-1)[:nk].mean())
            print(json.dumps({
                "seed": seed, "rho": rho, "both": both,
                "ate_cm": round(ate_rmse(res.trajectory, truth) * 100, 2),
                "heading_deg": round(
                    ate_heading_deg(res.trajectory, truth), 3),
                "precision": lm["precision"], "recall": lm["recall"],
                "loops": int(min(int(res.carry.num_loops), dims.max_loops)),
                "pts_per_kf": round(pts_per_kf, 1),
                "wall_s": round(wall, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
