#!/usr/bin/env python
"""Round-4 probe matrix: sweep-topk x incremental-refinement x traced floors.

One process, one simulation per seed, every static variant compiled once and
reused across seeds (see CLAUDE.md: the remote TPU's per-process setup makes
multi-process sweeps unusable; traced RefineParams variants are ~1.5 s each
after the first).

Measures, per (variant, refine-params, seed): ATE xy/heading, loop
precision/recall (bench.loop_metrics), loop count, DVL-scale recovery, and
the replay wall (warm calls only — the first call per variant compiles).

Usage:
  python scripts/r4_probe.py --tpu --seeds 3 \
      --variants 1:0,2:0,3:0,2:1 --out /tmp/r4_probe.json
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
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from bench import loop_metrics
from sonar_slam_tpu.pipeline import ate_heading_deg, ate_rmse, replay
from sonar_slam_tpu.io.simulate import simulate_bag
from sonar_slam_tpu.slam import FeatureConfig, RefineParams
from sonar_slam_tpu.geometry import se2_between

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from error_budget import bench_params, setups  # noqa: E402


def run_one(bag, fc, params, dims, rp, truth_at_ping):
    t0 = time.time()
    res = replay(bag, fc, params, dims, refine_params=rp)
    wall = time.time() - t0
    nk = res.num_keyframes
    truth = truth_at_ping[res.keyframe_ping_idx][:nk]
    if not np.isfinite(res.trajectory).all():
        return {"error": "NaN trajectory", "wall_s": round(wall, 2),
                "nan_poses": int((~np.isfinite(res.trajectory))
                                 .any(axis=-1).sum())}
    lm = loop_metrics(res.carry, truth, dims.nssm_min_st_sep,
                      prox_radius=0.5 * dims.max_range)
    est_corr = np.exp(np.asarray(res.carry.graph.log_scale))
    return {
        "ate_cm": round(ate_rmse(res.trajectory, truth) * 100, 2),
        "heading_deg": round(ate_heading_deg(res.trajectory, truth), 3),
        "keyframes": nk,
        "loops": int(min(int(res.carry.num_loops), dims.max_loops)),
        "precision": lm["precision"],
        "recall": lm["recall"],
        "loop_err_median_cm": lm["loop_err_median_cm"],
        "est_scale_x": round(float(1.0 / est_corr[0]), 5),
        "true_scale_x": round(float(np.asarray(bag.true_dvl_scale)[0]), 5),
        "wall_s": round(wall, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-list", default="",
                    help="explicit comma list of seeds (overrides --seeds)")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--variants", default="1:0:0,2:0:0",
                    help="comma list of topk:incremental:anchor static "
                         "variants")
    ap.add_argument("--rps", default="default",
                    help="comma list of traced RefineParams presets, "
                         "applied to EVERY static variant: default, "
                         "chainF (floor sigma F cm, e.g. chain2), "
                         "norobust, chainF-norobust")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    sim0, dims0, kf_t = setups(not args.small)
    params = bench_params(dims0, kf_t, full=not args.small)
    fc = FeatureConfig(max_points=dims0.max_points)
    variants = []
    for v in args.variants.split(","):
        tk, inc, anc, ml, asig, basis = (v.split(":") + ["0"] * 4)[:6]
        variants.append((int(tk), bool(int(inc)), bool(int(anc)), int(ml),
                         int(asig), bool(int(basis))))

    def mk_rp(name):
        rp = RefineParams.default()
        for part in name.split("-"):
            if part.startswith("chain"):
                cf = float(part[5:]) / 100.0
                rp = rp._replace(chain_floor_sigmas=jnp.asarray(
                    [cf, cf, cf / 5.0], jnp.float32))
            elif part == "norobust":
                rp = rp._replace(robust=jnp.asarray(False))
            elif part.startswith("covis"):  # sweep covisibility gate
                rp = rp._replace(sweep_min_covis=jnp.asarray(
                    int(part[5:]), jnp.int32))
            elif part.startswith("sinl"):  # sweep inlier gate
                rp = rp._replace(sweep_min_inliers=jnp.asarray(
                    int(part[4:]), jnp.int32))
            elif part.startswith("sdt"):  # sweep consistency gate, cm
                rp = rp._replace(sweep_max_dt=jnp.float32(
                    float(part[3:]) / 100.0))
            elif part.startswith("sfl"):  # remeasure floor, cm
                fl = float(part[3:]) / 100.0
                rp = rp._replace(floor_sigmas=jnp.asarray(
                    [fl, fl, fl / 5.0], jnp.float32))
            elif part.startswith("swfl"):  # sweep-insertion floor, cm
                fl = float(part[4:]) / 100.0
                rp = rp._replace(sweep_floor_sigmas=jnp.asarray(
                    [fl, fl, fl / 5.0], jnp.float32))
            elif part.startswith("iref"):  # sweep inlier de-weight ref
                rp = rp._replace(sweep_cov_inlier_ref=jnp.float32(
                    float(part[4:])))
            elif part.startswith("prune"):  # consensus prune gate, cm
                pt = float(part[5:]) / 100.0
                rp = rp._replace(prune_max_dt=jnp.float32(pt),
                                 prune_max_dr=jnp.float32(pt / 3.0))
            elif part == "noprune":
                rp = rp._replace(prune_max_dt=jnp.float32(0.0))
            elif part.startswith("drgate"):  # chain-vs-DR gate, cm
                g = float(part[6:]) / 100.0
                rp = rp._replace(chain_dr_max_dt=jnp.float32(g),
                                 chain_dr_max_dr=jnp.float32(g / 4.0))
            elif part == "nodrgate":
                rp = rp._replace(chain_dr_max_dt=jnp.float32(0.0))
            elif part.startswith("rg"):  # anchor rotation gate, centirad
                rp = rp._replace(scale_max_rot=jnp.float32(
                    float(part[2:]) / 100.0))
            elif part != "default":
                raise SystemExit(f"unknown rp preset part: {part}")
        return rp

    rps = [(n, mk_rp(n)) for n in args.rps.split(",")]

    results = []
    seed_iter = ([int(s) for s in args.seed_list.split(",")]
                 if args.seed_list else range(args.seeds))
    for seed in seed_iter:
        t0 = time.time()
        bag = simulate_bag(replace(sim0, seed=seed))
        print(f"# seed {seed} sim {time.time()-t0:.0f}s", flush=True)
        truth_at_ping = bag.true_pose_at_ping
        for tk, inc, anc, ml, asig, basis in variants:
            dims = replace(dims0, refine_sweep_topk=tk,
                           refine_incremental=inc,
                           refine_scale_from_chain=anc,
                           refine_scale_basis=basis)
            if ml:  # max_loops override (max_factors derives from it)
                dims = replace(dims, max_loops=ml)
            if asig:  # anchor-pin sigma override, units of 1e-4
                dims = replace(dims, refine_scale_anchor_sigma=(
                    asig * 1e-4, dims.refine_scale_anchor_sigma[1]))
            for rp_name, rp in rps:
                try:
                    rec = run_one(bag, fc, params, dims, rp, truth_at_ping)
                except Exception as e:  # keep the matrix going
                    rec = {"error": repr(e)[:200]}
                rec.update(seed=seed, topk=tk, incremental=int(inc),
                           anchor=int(anc), basis=int(basis), rp=rp_name)
                results.append(rec)
                print(json.dumps(rec), flush=True)
                if args.out:
                    with open(args.out, "w") as f:
                        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
