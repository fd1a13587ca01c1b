#!/usr/bin/env python
"""Decompose the map-metric shortfall: what drives recall and chamfer.

Runs the small-config replay on CPU, rebuilds the occupancy grid the way
bench.py stage3 does, then reports the distance distributions behind
precision/recall/chamfer (docs/ACCURACY.md round-5 map investigation):
- d_truth quantiles (observed truth scatterer -> nearest occupied cell):
  separates "walls mapped but sparsely" (d ~ feature spacing) from
  "segments entirely missing" (d >> 1 m),
- d_cell quantiles (occupied cell -> nearest truth): how much far speckle
  cells inflate the chamfer mean.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from dataclasses import replace  # noqa: E402

from sonar_slam_tpu.pipeline import replay  # noqa: E402
from sonar_slam_tpu.io.simulate import simulate_bag  # noqa: E402
from sonar_slam_tpu.slam import FeatureConfig  # noqa: E402
from sonar_slam_tpu.mapping import (  # noqa: E402
    MappingConfig, SubmapModel, build_submap_logodds, mapping_init,
    occupancy_grid_method1, render_global_logodds,
)
from sonar_slam_tpu.mapping.metrics import (  # noqa: E402
    _nn_dists, _umeyama_se2, observed_mask, occupied_cell_centers,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from error_budget import bench_params, bench_rparams, setups  # noqa: E402


def main():
    full = "--full" in sys.argv
    sim0, dims, kf_t = setups(full)
    params = bench_params(dims, kf_t, full=full)
    fc = FeatureConfig(max_points=dims.max_points, corroborate=full)
    bag = simulate_bag(replace(sim0, seed=0))
    res = replay(bag, fc, params, dims, refine_params=bench_rparams(full))
    nk = res.num_keyframes
    truth_poses = bag.true_pose_at_ping[res.keyframe_ping_idx][:nk]

    mcfg = replace(MappingConfig(), max_keyframes=dims.max_keyframes)
    model = SubmapModel(mcfg, bag.geometry)
    logodds = jax.vmap(lambda p, m: build_submap_logodds(p, m, model))(
        res.carry.points, res.carry.pmasks)
    valid = jnp.arange(dims.max_keyframes) < nk
    poses = jnp.asarray(np.pad(
        res.trajectory, ((0, dims.max_keyframes - nk), (0, 0))))
    state = mapping_init(mcfg, model)._replace(
        kf_logodds=logodds, kf_poses=poses, kf_valid=valid,
        num_kf=jnp.asarray(nk, jnp.int32))
    grid = render_global_logodds(state, model)
    occ = np.asarray(occupancy_grid_method1(
        state._replace(grid=grid), model))

    cells = occupied_cell_centers(occ, mcfg)
    align = _umeyama_se2(res.trajectory[:, :2], truth_poses[:, :2])
    cells_w = align(cells)
    seen = observed_mask(bag.world_points.astype(np.float64), truth_poses,
                         bag.geometry.max_range,
                         0.5 * (bag.geometry.bearings[-1]
                                - bag.geometry.bearings[0]))
    truth = bag.world_points.astype(np.float64)[seen]

    d_cell = _nn_dists(cells_w, truth)
    d_truth = _nn_dists(truth, cells_w)

    # how much of the miss is "never featured": nearest FEATURE point
    feats = []
    pm = np.asarray(res.carry.pmasks)[:nk]
    pts = np.asarray(res.carry.points)[:nk]
    for k in range(nk):
        p = pts[k][pm[k]]
        c, s = np.cos(res.trajectory[k, 2]), np.sin(res.trajectory[k, 2])
        R = np.array([[c, -s], [s, c]])
        feats.append(p @ R.T + res.trajectory[k, :2])
    feats = align(np.concatenate(feats))
    d_truth_feat = _nn_dists(truth, feats)

    q = [50, 75, 90, 95, 99, 100]
    out = {
        "config": "full" if full else "small",
        "n_cells": len(cells), "n_truth": len(truth),
        "precision@0.4": round(float((d_cell <= 0.4).mean()), 3),
        "recall@0.4": round(float((d_truth <= 0.4).mean()), 3),
        "recall@0.8": round(float((d_truth <= 0.8).mean()), 3),
        "d_truth_q_m": {p: round(float(np.percentile(d_truth, p)), 2)
                        for p in q},
        "d_cell_q_m": {p: round(float(np.percentile(d_cell, p)), 2)
                       for p in q},
        "d_cell_mean_m": round(float(d_cell.mean()), 2),
        "d_truth_mean_m": round(float(d_truth.mean()), 2),
        "feat_recall@0.4": round(float((d_truth_feat <= 0.4).mean()), 3),
        "d_truth_feat_q_m": {p: round(float(np.percentile(d_truth_feat, p)),
                                      2) for p in q},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
