#!/usr/bin/env python
"""Which frontend stage loses the far/wide wall structure the map misses?

For each keyframe ping of the small-config bag, count how many truth
scatterers inside THAT ping's FOV wedge are covered (within tol) by:
  A. raw CFAR+intensity detections (pre-voxel),
  B. the voxel top-k cloud (pre-outlier-removal),
  C. the final cloud (post outlier removal),
and the voxel-occupancy count vs the max_points capacity (is the
count-ranked top-k binding?). CPU-only diagnostic.
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

from sonar_slam_tpu.io.simulate import simulate_bag  # noqa: E402
from sonar_slam_tpu.slam import FeatureConfig, FeatureExtractor  # noqa: E402
from sonar_slam_tpu.cloud import remove_outlier  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from error_budget import setups  # noqa: E402


def main():
    full = "--full" in sys.argv
    alg = "SOCA"
    pfa = None
    for i, a in enumerate(sys.argv):
        if a == "--alg":
            alg = sys.argv[i + 1]
        if a == "--pfa":
            pfa = float(sys.argv[i + 1])
    sim0, dims, _ = setups(full)
    bag = simulate_bag(replace(sim0, seed=0))
    fc = FeatureConfig(max_points=dims.max_points, alg=alg)
    if pfa is not None:
        fc = fc._replace(pfa=pfa)
    ext = FeatureExtractor(fc, bag.geometry)
    geom = bag.geometry
    half_ap = 0.5 * float(geom.bearings[-1] - geom.bearings[0])

    # every ~5th ping as a pseudo-keyframe
    sel = np.arange(0, len(bag.ping_time), 5)
    world = bag.world_points.astype(np.float64)
    tol = 0.4

    def cover(local_pts, mask, wedge_truth_local):
        if not len(wedge_truth_local) or not mask.any():
            return 0.0
        p = local_pts[mask]
        d = np.linalg.norm(
            wedge_truth_local[:, None, :] - p[None, :, :], axis=-1
        ).min(1)
        return float((d <= tol).mean())

    stats = {"A_raw": [], "B_voxel": [], "C_final": [], "n_occupied_vox": [],
             "n_wedge_truth": []}
    miss_rng, hit_rng, miss_abs_brg, hit_abs_brg = [], [], [], []
    for k in sel:
        pose = bag.true_pose_at_ping[k]
        c, s = np.cos(pose[2]), np.sin(pose[2])
        rel = world - pose[:2]
        lx = c * rel[:, 0] + s * rel[:, 1]
        ly = -s * rel[:, 0] + c * rel[:, 1]
        rng = np.hypot(lx, ly)
        brg = np.arctan2(ly, lx)
        vis = (rng > 0.5) & (rng < geom.max_range * 0.98) & (
            np.abs(brg) < half_ap)
        wt = np.stack([lx[vis], ly[vis]], -1)
        stats["n_wedge_truth"].append(len(wt))

        img = jnp.asarray(bag.ping_images[k], jnp.float32)
        det = np.asarray(ext.detections(img))
        # raw detection points at exact cell centers (polar -> xy)
        rr, cc = np.nonzero(det)
        rho = (rr + 1) * geom.range_resolution
        beta = np.asarray(geom.bearings)[cc]
        raw = np.stack([rho * np.cos(beta), rho * np.sin(beta)], -1)
        stats["A_raw"].append(cover(raw, np.ones(len(raw), bool), wt))
        if len(wt) and len(raw):
            d = np.linalg.norm(
                wt[:, None, :] - raw[None, :, :], axis=-1).min(1)
            wr, wb = rng[vis], np.abs(brg[vis])
            miss_rng.extend(wr[d > tol]); hit_rng.extend(wr[d <= tol])
            miss_abs_brg.extend(np.rad2deg(wb[d > tol]))
            hit_abs_brg.extend(np.rad2deg(wb[d <= tol]))

        # voxel stage (pre-outlier): rebuild via binner
        flat = jnp.asarray(det.reshape(-1))
        pts, mask, conf = ext._binner(
            flat & (img.reshape(-1) > fc.threshold), fc.max_points,
            img.reshape(-1), None, min_hits=1)
        pts_n, mask_n = np.asarray(pts), np.asarray(mask)
        stats["B_voxel"].append(cover(pts_n, mask_n, wt))
        stats["n_occupied_vox"].append(int(mask_n.sum()))

        mask2 = np.asarray(remove_outlier(
            pts, mask, fc.outlier_radius, fc.outlier_min_points))
        stats["C_final"].append(cover(pts_n, mask2, wt))

    out = {
        "config": "full" if full else "small",
        "max_points": fc.max_points,
        "kf_count": len(sel),
        "mean_wedge_truth": round(float(np.mean(stats["n_wedge_truth"])), 1),
        "mean_occupied_vox": round(
            float(np.mean(stats["n_occupied_vox"])), 1),
        "capacity_binding_frac": round(float(np.mean(
            np.asarray(stats["n_occupied_vox"]) >= fc.max_points)), 2),
        "coverage_A_raw": round(float(np.mean(stats["A_raw"])), 3),
        "coverage_B_voxel": round(float(np.mean(stats["B_voxel"])), 3),
        "coverage_C_final": round(float(np.mean(stats["C_final"])), 3),
        "alg": alg, "pfa": fc.pfa,
        "miss_range_med_m": round(float(np.median(miss_rng)), 1)
        if miss_rng else None,
        "hit_range_med_m": round(float(np.median(hit_rng)), 1)
        if hit_rng else None,
        "miss_absbrg_med_deg": round(float(np.median(miss_abs_brg)), 1)
        if miss_abs_brg else None,
        "hit_absbrg_med_deg": round(float(np.median(hit_abs_brg)), 1)
        if hit_abs_brg else None,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
