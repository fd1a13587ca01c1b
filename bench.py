#!/usr/bin/env python
"""Benchmark: full synthetic-bag SLAM replay throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "slam_replay_xrealtime", "value": <x real-time>,
   "unit": "x_realtime", "vs_baseline": <value / 100>}

``vs_baseline`` normalizes against the north-star target from BASELINE.md:
replay the sample BlueROV bag at >= 100x real-time on one v5e chip (the
reference's design point is 1x real-time on a laptop CPU — it has no
published numbers, BASELINE.md). So vs_baseline >= 1.0 means the target is
met; the absolute x-real-time number is the headline.

Measured work (steady state, post-compile): dead-reckoning scan over all
sensor ticks + batched CFAR feature extraction over keyframe pings + the full
fused SLAM scan (SSM + NSSM + PCM + GN smoothing) + the occupancy mapping
stage (all keyframe submaps built, the full post-loop-closure repaint render,
and the method-1 export — what `mapping_node.py:91-126` does per replay) —
i.e. everything the reference's node graph does during
`slam.launch file:=bag` except rosbag decoding (host-side, one-time,
excluded in both systems). Per-stage wall times are reported in
``extra.stages_ms``.

Usage: python bench.py [--cpu] [--small] [--json-only]
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--small", action="store_true", help="small fast config")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the fused SLAM scan is a large program and
    # this environment compiles remotely — cache makes reruns near-instant
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sonar_slam_tpu.cloud import ICPConfig
    from sonar_slam_tpu.estimators import DRConfig, dead_reckoning_scan
    from sonar_slam_tpu.geometry import pose3_to_pose2
    from sonar_slam_tpu.io.dataset import (
        SensorStreams,
        build_dr_ticks,
        match_pings_to_ticks,
    )
    from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
    from sonar_slam_tpu.pipeline import ate_rmse
    from sonar_slam_tpu.slam import (
        FeatureConfig,
        FeatureExtractor,
        KeyframeInput,
        SlamDims,
        SlamParams,
        select_keyframes,
        slam_scan,
    )

    log = (lambda *a: None) if args.json_only else (
        lambda *a: print(*a, file=sys.stderr)
    )

    # production ICP configuration (docs/ACCURACY.md): point-to-line
    # minimizer, tight correspondence gate, 12 iterations (p2l converges in
    # about half of p2p's), windowed NSSM targets + single-frame pairwise
    # loop refinement, best-start transform selection. Measured vs the
    # round-1 reference-faithful settings: half the per-keyframe cost and
    # better loop-transform accuracy.
    icp_prod = ICPConfig(max_iterations=12, min_diff_rot=1e-3,
                         min_diff_trans=1e-2, point_to_line=True,
                         outlier_max_dist=0.5)
    if args.small:
        sim = SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0,
                        num_ranges=192, num_bearings=96, loop_radius=10.0,
                        imu_rate=20.0)
        dims = SlamDims(max_keyframes=32, max_points=128, target_capacity=512,
                        nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
                        max_loops=16, gn_iters=3, icp=icp_prod,
                        nssm_target_window=2, nssm_pair_refine=True,
                        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                        pair_refine_min_inliers=25)
        # (reinit-after-select and DR-relative aggregation help only on
        #  multi-circuit surveys with accumulated drift — the full config;
        #  measured counterproductive on this short single-arc one)
        kf_translation = 2.0
    else:
        sim = SimConfig(duration=480.0, speed=0.5, sonar_rate=5.0,
                        num_ranges=512, num_bearings=256, loop_radius=18.0,
                        imu_rate=50.0)
        dims = SlamDims(max_keyframes=128, max_points=256, target_capacity=1024,
                        nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=512,
                        max_loops=32, gn_iters=3, icp=icp_prod,
                        nssm_target_window=2, nssm_pair_refine=True,
                        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                        pair_refine_min_inliers=25,
                        nssm_reinit_after_select=True, aggregate_with_dr=True,
                        estimate_dvl_scale=True, dvl_scale_prior_sigma=0.05)
        # (reinit / DR-relative aggregation / online DVL-scale calibration
        #  are multi-circuit-drift features; measured counterproductive on
        #  the short single-arc small config)
        kf_translation = 3.0

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    bag = simulate_bag(sim)
    log(f"bag simulated in {time.time()-t0:.1f}s: {len(bag.ping_time)} pings, "
        f"{sim.duration:.0f}s of data")

    # benchmark configuration: reference semantics + the proper-fusion
    # option (keep the DR factor alongside the scan-match factor) with
    # sigmas matching the synthetic sensors' actual noise
    params = SlamParams.default(dims)._replace(
        keyframe_translation=jnp.float32(kf_translation),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(20 if args.small else 50, jnp.int32),
        fuse_odometry=jnp.asarray(True),
        use_best_start_tf=jnp.asarray(True),
        odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
        # covariance floor scales with the sonar's per-point noise: the
        # small config's 15.6 cm range bins make loop transforms ~2x
        # noisier than the full config's 5.9 cm bins
        icp_odom_sigmas=jnp.asarray(
            [0.3, 0.3, 0.03] if args.small else [0.2, 0.2, 0.02],
            jnp.float32),
    )
    feature_config = FeatureConfig(max_points=dims.max_points)
    dr_config = DRConfig(roll_offset=0.0)

    # host-side alignment (excluded from timing in both systems: the
    # reference reads the rosbag on the host too)
    streams = SensorStreams(
        imu_time=bag.imu_time, imu_rpy=bag.imu_rpy,
        dvl_time=bag.dvl_time, dvl_vel=bag.dvl_vel,
        depth_time=bag.depth_time, depth=bag.depth,
    )
    bundle = build_dr_ticks(streams)
    tick_idx, sync_ok = match_pings_to_ticks(bag.ping_time, bundle.tick_time)
    ping_images = jnp.asarray(bag.ping_images)
    extractor = FeatureExtractor(feature_config, bag.geometry)

    # Two fused device programs: the tunneled remote device adds >100 ms per
    # dispatch, so the pipeline is exactly (1) DR + keyframe gate, (2) gather
    # + CFAR + SLAM scan, with one tiny host round-trip for the data-
    # dependent keyframe indices in between.
    ping_time_dev = jnp.asarray(bag.ping_time, jnp.float32)
    sync_dev = jnp.asarray(sync_ok)

    @jax.jit
    def stage1():
        _, dr3 = dead_reckoning_scan(bundle.ticks, dr_config)
        ping_dr3 = dr3[tick_idx]
        kf_mask = select_keyframes(
            ping_time_dev, pose3_to_pose2(ping_dr3), sync_dev, params
        )
        return kf_mask, ping_dr3

    # features (host-composed small jit units) and the SLAM scan stay
    # SEPARATE programs: one fused jit takes the remote compile service past
    # its request timeout, for zero steady-state benefit
    @jax.jit
    def stage2b(sel, valid, ping_dr3, pts, masks):
        frames = KeyframeInput(
            time=ping_time_dev[sel],
            dr_pose3=ping_dr3[sel],
            points=pts,
            pmask=masks & valid[:, None],
            valid=valid,
        )
        return slam_scan(frames, params, dims)

    # mapping stage (VERDICT r1 #5): the reference replay also runs the
    # mapping node (`mapping_node.py:91-126`) — per keyframe: build the
    # submap + O(n) repaint. The TPU-native equivalent is one batched
    # submap build over ALL keyframes + the full batched repaint render
    # (what update_poses does after a loop closure) + the method-1 export.
    from sonar_slam_tpu.mapping import (
        MappingConfig, SubmapModel, build_submap_logodds, mapping_init,
        occupancy_grid_method1, render_global_logodds,
    )

    from dataclasses import replace as _dc_replace

    mcfg = _dc_replace(MappingConfig(), max_keyframes=dims.max_keyframes)
    model = SubmapModel(mcfg, bag.geometry)

    @jax.jit
    def stage3_mapping(poses, points, masks, valid):
        logodds = jax.vmap(lambda p, m: build_submap_logodds(p, m, model))(
            points, masks
        )
        state = mapping_init(mcfg, model)._replace(
            kf_logodds=logodds, kf_poses=poses, kf_valid=valid,
            num_kf=jnp.sum(valid).astype(jnp.int32),
        )
        grid = render_global_logodds(state, model)  # the full repaint
        occ = occupancy_grid_method1(state._replace(grid=grid), model)
        return occ

    stage_ms = {}

    def timed(name, fn, *a):
        t = time.time()
        out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        stage_ms[name] = stage_ms.get(name, 0.0) + (time.time() - t) * 1e3
        return out

    def device_pipeline():
        stage_ms.clear()
        kf_mask, ping_dr3 = timed("dr_gate", stage1)
        kf_idx = np.nonzero(np.asarray(kf_mask))[0]
        K = dims.max_keyframes
        kf_idx = kf_idx[:K]
        valid = np.zeros(K, bool)
        valid[: len(kf_idx)] = True
        sel = np.concatenate([kf_idx, np.zeros(K - len(kf_idx), np.int64)])
        sel_d, valid_d = jnp.asarray(sel), jnp.asarray(valid)
        pts, masks = timed("features", extractor.extract_batch,
                           ping_images[sel_d])
        carry, outputs = timed("slam_scan", stage2b, sel_d, valid_d,
                               ping_dr3, pts, masks)
        occ = timed("mapping", stage3_mapping, carry.poses, carry.points,
                    carry.pmasks, valid_d)
        return carry, kf_idx, occ

    # the remote compile service in this environment sporadically drops
    # long-running compile requests — retry the first (compiling) run
    t0 = time.time()
    for attempt in range(3):
        try:
            carry, kf_idx, occ = device_pipeline()
            break
        except Exception as e:  # jax.errors.JaxRuntimeError on transport loss
            log(f"compile attempt {attempt + 1} failed: {e}")
            if attempt == 2:
                raise
            time.sleep(10)
    compile_s = time.time() - t0
    log(f"first run (incl compile): {compile_s:.1f}s")

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        carry, kf_idx, occ = device_pipeline()
        times.append(time.time() - t0)
    wall = float(np.median(times))
    occupied = int(np.sum(np.asarray(occ) > 55))

    nk = int(carry.num_kf)
    truth = bag.true_pose_at_ping[kf_idx][:nk]
    ate = ate_rmse(np.asarray(carry.poses[:nk]), truth)
    xrt = sim.duration / wall
    steps_per_sec = nk / wall
    log(f"keyframes: {nk}, loops: {int(carry.num_loops)}, wall: {wall:.3f}s, "
        f"{xrt:.1f}x real-time, {steps_per_sec:.1f} SLAM steps/s, "
        f"ATE {ate*100:.1f} cm")

    print(json.dumps({
        "metric": "slam_replay_xrealtime",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 100.0, 3),
        "extra": {
            "slam_steps_per_sec": round(steps_per_sec, 2),
            "keyframes": nk,
            "loops": int(carry.num_loops),
            "ate_m": round(ate, 4),
            "wall_s": round(wall, 3),
            "compile_s": round(compile_s, 1),
            "platform": jax.devices()[0].platform,
            "stages_ms": {k: round(v, 1) for k, v in stage_ms.items()},
            "map_occupied_cells": occupied,
            "est_dvl_scale": round(
                float(np.exp(np.asarray(carry.graph.log_scale))), 5),
        },
    }))


if __name__ == "__main__":
    main()
