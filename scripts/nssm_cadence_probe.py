#!/usr/bin/env python
"""Re-probe the in-scan NSSM cadence under the round-5 full config.

``nssm_every=3`` was probed best in round 3 — BEFORE ``refine_final_sweep``,
``max_loops=128``, the temporal corroboration gate, and ``cfar_edge=extend``
all reshaped the recall landscape. The in-scan NSSM+PCM block is 18.7 of the
22.9 ms/keyframe device time (scripts/profile_scan.py, round 5 on-chip), so
a sparser cadence is the single biggest traced-parameter perf lever — IF the
post-convergence sweeps now recover the recall the sparser search misses.

``nssm_every`` is a traced SlamParams field: every (cadence, seed) cell
reuses ONE compiled executable. Usage:

  python scripts/nssm_cadence_probe.py --tpu --seeds 5 --cadences 3 4 5
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from error_budget import (  # noqa: E402 (shared configs)
    bench_params, bench_rparams, setups,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--cadences", type=int, nargs="+", default=[3, 4, 5])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    sim0, dims, kf_t = setups(True)
    base = bench_params(dims, kf_t, full=True)
    fc = FeatureConfig(max_points=dims.max_points)
    rparams = bench_rparams(True)

    from bench import loop_metrics  # repo root on sys.path

    results = {}
    for seed in range(args.seeds):
        bag = simulate_bag(replace(sim0, seed=seed))
        truth_all = bag.true_pose_at_ping
        for cad in args.cadences:
            params = base._replace(nssm_every=jnp.asarray(cad, jnp.int32))
            t0 = time.time()
            res = replay(bag, fc, params, dims, refine_params=rparams)
            wall = time.time() - t0
            nk = res.num_keyframes
            truth = truth_all[res.keyframe_ping_idx][:nk]
            lm = loop_metrics(res.carry, truth, dims.nssm_min_st_sep,
                              prox_radius=0.5 * dims.max_range)
            rec = {
                "cadence": cad,
                "seed": seed,
                "ate_cm": round(ate_rmse(res.trajectory, truth) * 100, 2),
                "heading_deg": round(
                    ate_heading_deg(res.trajectory, truth), 3),
                "precision": lm["precision"],
                "recall": lm["recall"],
                "loops": int(min(int(res.carry.num_loops), dims.max_loops)),
                "wall_s": round(wall, 2),
            }
            results.setdefault(cad, []).append(rec)
            print(json.dumps(rec), flush=True)

    summary = {}
    for cad, recs in results.items():
        ates = np.array([r["ate_cm"] for r in recs])
        recalls = np.array([r["recall"] for r in recs])
        precs = np.array([r["precision"] or 0.0 for r in recs])
        walls = np.array([r["wall_s"] for r in recs])
        summary[str(cad)] = {
            "ate_cm": {"mean": round(float(ates.mean()), 2),
                       "max": round(float(ates.max()), 2)},
            "heading_deg_mean": round(float(np.mean(
                [r["heading_deg"] for r in recs])), 3),
            "recall": {"mean": round(float(recalls.mean()), 3),
                       "min": round(float(recalls.min()), 3)},
            "precision_min": round(float(precs.min()), 3),
            "wall_s_median": round(float(np.median(walls)), 2),
            "per_seed": recs,
        }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
