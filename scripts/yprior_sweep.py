#!/usr/bin/env python
"""Sweep the traced basis-solve scale prior (RefineParams.scale_prior_sigma)
across seeds in ONE process / ONE compile per config.

Round-4 continuation: MULTISEED_r04_tpu showed the y-axis DVL-scale estimate
landing on the WRONG side of nominal on 3/5 seeds (e.g. seed 4 est 1.012 vs
true 0.988) under the old static 0.01 prior — worse than pinning y at 1.0.
This measures whether a tighter y prior (or a full pin) improves the 5-seed
ATE distribution. Traced sweep: each variant after the first reuses the
cached program (CLAUDE.md: tpu-experiment-design).

Usage: python scripts/yprior_sweep.py [--tpu] [--seeds 5]
       [--ypriors 0.01,0.005,0.003,0.001]

Platform convention matches r4_probe.py / error_budget.py: CPU by default,
``--tpu`` keeps the ambient tunneled-TPU platform. (The imported
error_budget module flips the platform to CPU at import unless ``--tpu``
is in argv, so this script MUST use the same flag — its original ``--cpu``
opt-out silently ran the "TPU" sweep on the host CPU.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from sonar_slam_tpu.pipeline import ate_heading_deg, ate_rmse, replay
from sonar_slam_tpu.io.simulate import simulate_bag
from sonar_slam_tpu.slam import FeatureConfig

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from error_budget import (  # noqa: E402 (shared configs)
    bench_params, bench_rparams, setups,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--ypriors", default="0.01,0.005,0.003,0.001")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    ypriors = [float(v) for v in args.ypriors.split(",")]
    sim0, dims, kf_t = setups(full=True)
    params = bench_params(dims, kf_t, full=True)
    fc = FeatureConfig(max_points=dims.max_points)
    rp0 = bench_rparams(full=True)

    rows = []
    for seed in range(args.seeds):
        sim = replace(sim0, seed=seed)
        t0 = time.time()
        bag = simulate_bag(sim)
        sim_s = time.time() - t0
        truth_scale = [round(float(v), 5)
                       for v in np.asarray(bag.true_dvl_scale)[:2]]
        for yp in ypriors:
            rp = rp0._replace(scale_prior_sigma=jnp.asarray(
                [0.05, yp], jnp.float32))
            t0 = time.time()
            res = replay(bag, fc, params, dims, refine_params=rp)
            wall = time.time() - t0
            nk = res.num_keyframes
            truth = bag.true_pose_at_ping[res.keyframe_ping_idx][:nk]
            est_corr = np.exp(np.asarray(res.carry.graph.log_scale))
            row = {
                "seed": seed,
                "y_prior": yp,
                "ate_cm": round(ate_rmse(res.trajectory, truth) * 100, 2),
                "heading_deg": round(
                    ate_heading_deg(res.trajectory, truth), 3),
                "est_dvl_scale_xy": [
                    round(float(v), 5) for v in 1.0 / est_corr],
                "true_dvl_scale_xy": truth_scale,
                "wall_s": round(wall, 2),
                "sim_s": round(sim_s, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    summary = {}
    for yp in ypriors:
        ates = [r["ate_cm"] for r in rows if r["y_prior"] == yp]
        yerrs = [abs(r["est_dvl_scale_xy"][1] - r["true_dvl_scale_xy"][1])
                 for r in rows if r["y_prior"] == yp]
        summary[str(yp)] = {
            "ate_mean_cm": round(float(np.mean(ates)), 2),
            "ate_max_cm": round(float(np.max(ates)), 2),
            "ate_median_cm": round(float(np.median(ates)), 2),
            "y_scale_abs_err_mean": round(float(np.mean(yerrs)), 5),
        }
    out = {"config": "full", "seeds": args.seeds, "rows": rows,
           "summary": summary}
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
