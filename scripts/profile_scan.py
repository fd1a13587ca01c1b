#!/usr/bin/env python
"""In-scan device-time breakdown of the fused SLAM program (VERDICT r1 #6).

Round-1's span profiler timed standalone synthetic workloads — not the real
fused scan. This measures the ACTUAL program: because the module toggles
(ssm_enable / nssm_enable / fuse PCM path) are TRACED parameters, flipping
them selects different lax.cond branches of the SAME compiled executable —
so stage costs fall out of end-to-end runtime differences with zero
recompilation and no instrumentation distortion:

    nssm cost  = t(full)         - t(nssm off)
    ssm cost   = t(nssm off)     - t(ssm+nssm off)
    graph+base = t(ssm+nssm off)

Runs the benchmark configuration on the ambient platform (real TPU by
default; --cpu to force CPU). One TPU process at a time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--production", action="store_true",
                    help="bench.py full production dims (p2l, windows)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from sonar_slam_tpu.cloud import ICPConfig
    from sonar_slam_tpu.estimators import DRConfig, dead_reckoning_scan
    from sonar_slam_tpu.geometry import pose3_to_pose2
    from sonar_slam_tpu.io.dataset import (SensorStreams, build_dr_ticks,
                                           match_pings_to_ticks)
    from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
    from sonar_slam_tpu.slam import (FeatureConfig, FeatureExtractor,
                                     KeyframeInput, SlamDims, SlamParams,
                                     select_keyframes, slam_scan)

    if args.small:
        sim = SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0,
                        num_ranges=192, num_bearings=96, loop_radius=10.0,
                        imu_rate=20.0)
        dims = SlamDims(max_keyframes=32, max_points=128, target_capacity=512,
                        nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
                        max_loops=16, gn_iters=3,
                        icp=ICPConfig(min_diff_rot=1e-3, min_diff_trans=1e-2))
        kf_t = 2.0
    elif args.production:
        # the bench.py full production stack (p2l, windows, 12 starts)
        sim = SimConfig(duration=480.0, speed=0.5, sonar_rate=5.0,
                        num_ranges=512, num_bearings=256, loop_radius=18.0,
                        imu_rate=50.0)
        dims = SlamDims(max_keyframes=128, max_points=256,
                        target_capacity=1024, nssm_cov_samples=12,
                        ssm_sobol=64, nssm_sobol=512, max_loops=128,
                        gn_iters=3,
                        icp=ICPConfig(max_iterations=12, min_diff_rot=1e-3,
                                      min_diff_trans=1e-2, point_to_line=True,
                                      outlier_max_dist=0.5),
                        nssm_target_window=2, nssm_pair_refine=True,
                        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                        pair_refine_min_inliers=25,
                        nssm_reinit_after_select=True, aggregate_with_dr=True,
                        aggregate_with_dr_basis=True,
                        estimate_dvl_scale=True)
        kf_t = 3.0
    else:
        sim = SimConfig(duration=480.0, speed=0.5, sonar_rate=5.0,
                        num_ranges=512, num_bearings=256, loop_radius=18.0,
                        imu_rate=50.0)
        dims = SlamDims(max_keyframes=128, max_points=256,
                        target_capacity=1024, nssm_cov_samples=30,
                        ssm_sobol=64, nssm_sobol=512, max_loops=32,
                        gn_iters=3,
                        icp=ICPConfig(max_iterations=24, min_diff_rot=1e-3,
                                      min_diff_trans=1e-2))
        kf_t = 3.0

    bag = simulate_bag(sim)
    base = SlamParams.default(dims)._replace(
        keyframe_translation=jnp.float32(kf_t),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(20, jnp.int32),
        fuse_odometry=jnp.asarray(True),
        odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
        icp_odom_sigmas=jnp.asarray([0.3, 0.3, 0.03], jnp.float32))

    streams = SensorStreams(imu_time=bag.imu_time, imu_rpy=bag.imu_rpy,
                            dvl_time=bag.dvl_time, dvl_vel=bag.dvl_vel,
                            depth_time=bag.depth_time, depth=bag.depth)
    bundle = build_dr_ticks(streams)
    tick_idx, sync_ok = match_pings_to_ticks(bag.ping_time, bundle.tick_time)
    if dims.aggregate_with_dr_basis:
        from sonar_slam_tpu.estimators import dead_reckoning_with_basis_scan

        dr3, tick_basis = dead_reckoning_with_basis_scan(
            bundle.ticks, DRConfig(roll_offset=0.0))
    else:
        _, dr3 = dead_reckoning_scan(bundle.ticks, DRConfig(roll_offset=0.0))
        tick_basis = None
    ping_dr3 = dr3[tick_idx]
    kf_mask = np.asarray(select_keyframes(
        jnp.asarray(bag.ping_time), pose3_to_pose2(ping_dr3),
        jnp.asarray(sync_ok), base))
    kf_idx = np.nonzero(kf_mask)[0][: dims.max_keyframes]
    K = dims.max_keyframes
    valid = np.zeros(K, bool)
    valid[: len(kf_idx)] = True
    sel = np.concatenate([kf_idx, np.zeros(K - len(kf_idx), np.int64)])
    ex = FeatureExtractor(FeatureConfig(max_points=dims.max_points),
                          bag.geometry)
    pts, masks = ex.extract_batch(jnp.asarray(bag.ping_images[sel]))
    frames = KeyframeInput(
        time=jnp.asarray(bag.ping_time[sel], jnp.float32),
        dr_pose3=ping_dr3[sel], points=pts,
        pmask=masks & jnp.asarray(valid)[:, None],
        valid=jnp.asarray(valid))

    variants = {
        "full": base,
        "nssm_off": base._replace(nssm_enable=jnp.asarray(False)),
        "ssm_nssm_off": base._replace(nssm_enable=jnp.asarray(False),
                                      ssm_enable=jnp.asarray(False)),
        "all_off_valid_off": base._replace(
            nssm_enable=jnp.asarray(False), ssm_enable=jnp.asarray(False)),
    }

    import jax as _jax

    # ONE jitted program; params are traced so every variant below reuses
    # the same executable. (slam_scan itself is a plain function since the
    # round-4 while_loop rewrite — calling it unjitted re-traces the whole
    # fused program per call, which on this host costs ~40 s and silently
    # turns this profiler into a tracing benchmark.)
    kf_basis = (jnp.asarray(np.asarray(tick_basis)[tick_idx][sel])
                if tick_basis is not None else None)

    @_jax.jit
    def _scan(params, frames_):
        return slam_scan(frames_, params, dims, kf_basis)

    def run(params, frames_):
        carry, _ = _scan(params, frames_)
        jax.block_until_ready(carry.poses)
        return carry

    t = {}
    nk = {}
    for name, p in variants.items():
        fr = frames
        if name == "all_off_valid_off":
            # every frame masked invalid: measures the scan's fixed overhead
            fr = frames._replace(valid=jnp.zeros((K,), bool),
                                 pmask=jnp.zeros_like(frames.pmask))
        c = run(p, fr)  # compile (cached across variants: same program)
        samples = []
        for _ in range(args.repeats):
            t0 = time.time()
            c = run(p, fr)
            samples.append(time.time() - t0)
        t[name] = float(np.median(samples))
        nk[name] = int(c.num_kf)

    n = max(nk["full"], 1)
    breakdown = {
        "nssm_pcm_ms_per_kf": (t["full"] - t["nssm_off"]) / n * 1e3,
        "ssm_ms_per_kf": (t["nssm_off"] - t["ssm_nssm_off"]) / n * 1e3,
        "graph_update_ms_per_kf": (t["ssm_nssm_off"] - t["all_off_valid_off"]) / n * 1e3,
        "scan_overhead_ms_per_kf": t["all_off_valid_off"] / n * 1e3,
        "total_ms_per_kf": t["full"] / n * 1e3,
    }
    out = {
        "platform": jax.devices()[0].platform,
        "keyframes": nk["full"],
        "wall_s": {k: round(v, 4) for k, v in t.items()},
        "per_keyframe_ms": {k: round(v, 2) for k, v in breakdown.items()},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
