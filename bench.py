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
fused SLAM scan (SSM + NSSM + PCM + GN smoothing) + post-convergence loop
re-registration (slam/refine.py) + the occupancy mapping stage (all keyframe
submaps, full post-loop-closure repaint render, method-1 export — what
`mapping_node.py:91-126` does per replay) — i.e. everything the reference's
node graph does during `slam.launch file:=bag` except rosbag decoding
(host-side, one-time, excluded in both systems).

Reported extras (VERDICT r2 #3): xy ATE, heading ATE (deg), loop
precision/recall vs simulator ground truth, per-axis estimated vs injected
DVL scale, a reference-faithful parity lane (p2p ICP, radius 3.0, trim 0.8,
no production divergences), and a dual-sonar z-accuracy line (configs[3]).

Usage: python bench.py [--cpu] [--small] [--json-only] [--seed N]
                       [--no-parity] [--no-dual] [--stages]
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

import numpy as np


def loop_metrics(carry, truth_kf, min_st_sep, prox_radius, correct_tol=0.30):
    """Loop-closure precision/recall against simulator ground truth.

    * precision: fraction of logged loops whose measured transform is within
      ``correct_tol`` meters (translation) of the true relative pose.
    * recall: fraction of source keyframes that HAVE a genuine revisit
      opportunity (an eligible >= min_st_sep-older keyframe within
      ``prox_radius`` true distance) and participate in >= 1 logged loop.
    The reference's NSSM search intent covers all revisits
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:839-1001`) but
    nothing there measures how many it converts — the simulator's truth
    makes both exact.
    """
    import jax.numpy as jnp
    from sonar_slam_tpu.geometry import se2_between

    nk = int(carry.num_kf)
    nl = min(int(carry.num_loops), carry.loops_i.shape[0])
    li = np.asarray(carry.loops_i)[:nl]
    lj = np.asarray(carry.loops_j)[:nl]
    ltf = np.asarray(carry.loops_tf)[:nl]
    errs = []
    for a, b, z in zip(li, lj, ltf):
        tz = np.asarray(
            se2_between(jnp.asarray(truth_kf[a]), jnp.asarray(truth_kf[b]))
        )
        errs.append(float(np.linalg.norm(z[:2] - tz[:2])))
    errs = np.asarray(errs)
    correct = errs < correct_tol if nl else np.zeros(0, bool)

    xy = truth_kf[:nk, :2]
    d = np.linalg.norm(xy[:, None, :] - xy[None, :, :], axis=-1)
    i_idx = np.arange(nk)
    opp = ((i_idx[None, :] - i_idx[:, None]) >= min_st_sep) & (
        d < prox_radius
    )
    opp_j = opp.any(axis=0)  # source keyframes with a revisit opportunity
    det_j = np.zeros(nk, bool)
    # only CORRECT loops count toward recall (ADVICE r3) — a wrong loop on a
    # revisit keyframe must not mark the opportunity as converted
    det_j[lj[(lj < nk) & correct]] = True
    n_opp = int(opp_j.sum())
    return {
        "precision": round(float(correct.mean()), 3) if nl else None,
        "recall": round(float((det_j & opp_j).sum() / max(n_opp, 1)), 3),
        "opportunities": n_opp,
        "loops": nl,
        "loop_err_median_cm": round(float(np.median(errs)) * 100, 2)
        if nl else None,
        "loop_err_p90_cm": round(float(np.percentile(errs, 90)) * 100, 2)
        if nl else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--small", action="store_true", help="small fast config")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the reference-faithful parity lane")
    ap.add_argument("--no-dual", action="store_true",
                    help="skip the dual-sonar z-accuracy line")
    ap.add_argument("--stages", action="store_true",
                    help="(kept for compatibility; the per-stage diagnostic "
                         "repeat now always runs so stages_ms is never empty)")
    ap.add_argument("--nssm-every", type=int, default=0,
                    help="override the in-scan loop-search cadence (traced; "
                         "0 = config default)")
    ap.add_argument("--no-refine", action="store_true",
                    help="skip the post-convergence refinement stage")
    ap.add_argument("--refine-floor", type=float, default=0.0,
                    help="override the refined-loop covariance floor sigma "
                         "(m; traced, 0 = default)")
    ap.add_argument("--refine-robust", type=int, default=-1,
                    help="override Cauchy-robust refined loops (0/1, traced)")
    ap.add_argument("--refine-iters", type=int, default=0,
                    help="override refinement iterations (STATIC - "
                         "recompiles; 3 measured seed-0 ATE 14.6->13.4 cm "
                         "at ~35x throughput cost)")
    ap.add_argument("--sweep-topk", type=int, default=0,
                    help="override refine_sweep_topk (STATIC - recompiles; "
                         "0 = config default)")
    ap.add_argument("--final-sweep", type=int, default=-1,
                    help="override refine_final_sweep (post-prune sweep "
                         "pass; STATIC - recompiles; -1 = config default)")
    ap.add_argument("--refine-incremental", type=int, default=-1,
                    help="override refine_incremental (STATIC - recompiles; "
                         "-1 = config default)")
    ap.add_argument("--scale-basis", type=int, default=-1,
                    help="override refine_scale_basis (joint 2x2 DVL-scale "
                         "solve from basis integrals; STATIC - recompiles)")
    ap.add_argument("--scale-anchor", type=int, default=-1,
                    help="override refine_scale_from_chain (STATIC - "
                         "recompiles; -1 = config default)")
    ap.add_argument("--scale-prior-y", type=float, default=0.0,
                    help="override the traced y-axis basis-solve scale "
                         "prior sigma (0 keeps the config default)")
    ap.add_argument("--chain-floor", type=float, default=0.0,
                    help="override the densified-chain covariance floor "
                         "sigma (m; traced, 0 = default)")
    ap.add_argument("--dump", default="",
                    help="write trajectory/truth/loops npz for analysis")
    ap.add_argument("--conf-power", type=float, default=-1.0,
                    help="override SlamParams.conf_power (per-point "
                         "confidence weighting exponent; traced; -1 = "
                         "config default)")
    ap.add_argument("--conf-ref", type=float, default=0.0,
                    help="override SlamParams.conf_ref (count at which a "
                         "point reaches full weight; traced)")
    ap.add_argument("--corroborate", type=int, default=-1,
                    help="1/0 force the temporal speckle gate on/off "
                         "(-1 = config default: on for full, off for small)")
    ap.add_argument("--icp-floor", type=float, default=0.0,
                    help="override icp_odom_sigmas xy (SSM factor weight + "
                         "in-scan loop floor; traced)")
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
    from sonar_slam_tpu.estimators import (
        DRConfig, dead_reckoning_scan, dead_reckoning_with_basis_scan,
    )
    from sonar_slam_tpu.geometry import pose3_to_pose2
    from sonar_slam_tpu.io.dataset import (
        SensorStreams,
        build_dr_ticks,
        match_pings_to_ticks,
    )
    from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
    from sonar_slam_tpu.pipeline import ate_heading_deg, ate_rmse
    from sonar_slam_tpu.slam import (
        FeatureConfig,
        FeatureExtractor,
        KeyframeInput,
        RefineParams,
        SlamDims,
        SlamParams,
        refine_loops,
        select_keyframes,
        slam_scan,
    )

    log = (lambda *a: None) if args.json_only else (
        lambda *a: print(*a, file=sys.stderr)
    )

    # production ICP configuration (docs/ACCURACY.md): point-to-line
    # minimizer, tight correspondence gate, 12 iterations (p2l converges in
    # about half of p2p's), windowed NSSM targets + single-frame pairwise
    # loop refinement, best-start transform selection, and (round 3) sparse
    # in-scan loop-search cadence + post-convergence loop re-registration
    # with the proximity sweep (slam/refine.py) recovering recall and
    # measurement quality after the graph converges.
    icp_prod = ICPConfig(max_iterations=12, min_diff_rot=1e-3,
                         min_diff_trans=1e-2, point_to_line=True,
                         outlier_max_dist=0.5)
    if args.small:
        sim = SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0,
                        num_ranges=192, num_bearings=96, loop_radius=10.0,
                        imu_rate=20.0, seed=args.seed)
        dims = SlamDims(max_keyframes=32, max_points=128, target_capacity=512,
                        nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
                        max_loops=32, gn_iters=3, icp=icp_prod,
                        nssm_target_window=2, nssm_pair_refine=True,
                        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                        pair_refine_min_inliers=25,
                        refine_iters=2, refine_sweep=True, refine_chain=True)
        # (reinit-after-select and DR-relative aggregation help only on
        #  multi-circuit surveys with accumulated drift — the full config;
        #  measured counterproductive on this short single-arc one)
        kf_translation = 2.0
        nssm_every = 1
    else:
        sim = SimConfig(duration=480.0, speed=0.5, sonar_rate=5.0,
                        num_ranges=512, num_bearings=256, loop_radius=18.0,
                        imu_rate=50.0, seed=args.seed)
        dims = SlamDims(max_keyframes=128, max_points=256, target_capacity=1024,
                        nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=512,
                        # 64 was CAPACITY-SATURATED: every 5-seed run logged
                        # exactly 64 loops, silently capping recall at ~0.75
                        # (round-5 probes: 128 lifts recall to 0.79-0.88 at
                        # precision 1.0 and mean ATE 5.8 -> 5.4 cm)
                        max_loops=128, gn_iters=3, icp=icp_prod,
                        nssm_target_window=2, nssm_pair_refine=True,
                        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                        pair_refine_min_inliers=25,
                        nssm_reinit_after_select=True, aggregate_with_dr=True,
                        # exact through-turn scale correction of the DR
                        # window relatives from the basis integrals
                        # (VERDICT r4 weak #6)
                        aggregate_with_dr_basis=True,
                        estimate_dvl_scale=True, dvl_scale_prior_sigma=0.05,
                        refine_iters=2, refine_sweep=True, refine_chain=True,
                        # post-prune sweep + second prune (r5: ATE 5.32->5.22
                        # seed 0 / 5.38->5.34 seed 4, loop medians improve,
                        # precision 1.0 held; recall-neutral — see
                        # docs/ACCURACY.md round-5 recall note)
                        refine_final_sweep=True,
                        # direct chain-ratio scale anchor (r4 probe: seed-0
                        # ATE 14.9 -> 12.1 at equal precision/recall; small
                        # single-arc config measured worse with it — stays
                        # full-config-only like the other drift features)
                        refine_scale_from_chain=True,
                        # joint 2x2 basis-integral scale solve (r4: better
                        # on 4/5 seeds than the ratio median, honest
                        # bounded y — see docs/ACCURACY.md round 4)
                        refine_scale_basis=True,
                        # no sweep lane budget: with the loop log at 128 the
                        # eligible-pair count can exceed the old top-64 cut
                        # (round-5 recall probes ran budget 0; the halved-lane
                        # optimization only paid while the log was saturated)
                        refine_sweep_budget=0,
                        # iteration>=1 re-registers only lanes whose endpoint
                        # RELATIVE pose moved since their last registration
                        # (r4 on-chip probe, seed 0: refine 269 -> 223 ms at
                        # ATE 6.35 -> 5.79 cm — fresh sweep measurements are
                        # not pointlessly re-registered)
                        refine_incremental=True)
        # (reinit / DR-relative aggregation / online DVL-scale calibration
        #  are multi-circuit-drift features; measured counterproductive on
        #  the short single-arc small config)
        kf_translation = 3.0
        nssm_every = 5  # refine.py recovers the sparser search's recall
        # (r3 probe over {1,2,3,4,6} x 3 seeds picked 3; re-probed r5 over
        # {3,4,5} x 5 seeds on-chip AFTER refine_final_sweep + max_loops 128
        # + corroborate + cfar_edge reshaped the recall landscape: cadence 5
        # now DOMINATES — ATE mean 4.59 vs 4.63 cm, recall 0.845 vs 0.836,
        # precision 1.0 every seed, ~40% less in-scan NSSM device time.
        # Cadence 4 breaks precision on seed 2 (0.976) — attempt phasing
        # matters, sparser is not monotone. docs/NSSM_CADENCE_r05.json)
    if args.nssm_every > 0:
        nssm_every = args.nssm_every
    if args.refine_iters > 0:
        from dataclasses import replace as _dcr0

        dims = _dcr0(dims, refine_iters=args.refine_iters)
    if args.sweep_topk > 0:
        from dataclasses import replace as _dcr1

        dims = _dcr1(dims, refine_sweep_topk=args.sweep_topk)
    if args.refine_incremental >= 0:
        from dataclasses import replace as _dcr2

        dims = _dcr2(dims, refine_incremental=bool(args.refine_incremental))
    if args.final_sweep >= 0:
        from dataclasses import replace as _dcr5

        dims = _dcr5(dims, refine_final_sweep=bool(args.final_sweep))
    if args.scale_basis >= 0:
        from dataclasses import replace as _dcr4

        dims = _dcr4(dims, refine_scale_basis=bool(args.scale_basis))
    if args.scale_anchor >= 0:
        from dataclasses import replace as _dcr3

        dims = _dcr3(dims, refine_scale_from_chain=bool(args.scale_anchor))

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
        nssm_every=jnp.asarray(nssm_every, jnp.int32),
        odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
        # covariance floor scales with the sonar's per-point noise: the
        # small config's 15.6 cm range bins make loop transforms ~2x
        # noisier than the full config's 5.9 cm bins
        # xy floor scales with the sonar's per-point noise; the ROTATION
        # sigma is deliberately weak (0.1 rad): in-scan SSM rotations carry
        # the partial-overlap registration bias, and heading is already
        # well-observed by the IMU + loops — weighting SSM rotation weakly
        # measured heading ATE 0.5-0.6 -> 0.2-0.3 deg at par xy (r3 probes)
        icp_odom_sigmas=jnp.asarray(
            [0.3, 0.3, 0.1] if args.small else [0.2, 0.2, 0.1],
            jnp.float32),
    )
    if args.icp_floor > 0:
        params = params._replace(icp_odom_sigmas=jnp.asarray(
            [args.icp_floor, args.icp_floor, args.icp_floor / 10.0],
            jnp.float32))
    if args.conf_power >= 0:
        params = params._replace(conf_power=jnp.float32(args.conf_power))
    if args.conf_ref > 0:
        params = params._replace(conf_ref=jnp.float32(args.conf_ref))
    rparams = RefineParams.default()
    if not args.small:
        # finer sonar bins -> tighter consensus-prune gate (r4 probe:
        # precision 1.0 at equal ATE and better loop medians than 0.25);
        # sweep ICP-inlier gate 20 -> 15 (r5: the blocked revisit sources'
        # best candidates carry 12-19 inliers; at 15 the consistency +
        # prune gates still hold precision 1.0 and recall reaches 0.79-0.88)
        rparams = rparams._replace(prune_max_dt=jnp.float32(0.18),
                                   prune_max_dr=jnp.float32(0.06),
                                   sweep_min_inliers=jnp.asarray(15, jnp.int32))
    if args.refine_floor > 0:
        rparams = rparams._replace(floor_sigmas=jnp.asarray(
            [args.refine_floor, args.refine_floor, args.refine_floor / 5.0],
            jnp.float32))
    if args.chain_floor > 0:
        rparams = rparams._replace(chain_floor_sigmas=jnp.asarray(
            [args.chain_floor, args.chain_floor, args.chain_floor / 5.0],
            jnp.float32))
    if args.scale_prior_y > 0:
        rparams = rparams._replace(scale_prior_sigma=jnp.asarray(
            [float(rparams.scale_prior_sigma[0]), args.scale_prior_y],
            jnp.float32))
    if args.refine_robust >= 0:
        rparams = rparams._replace(robust=jnp.asarray(bool(args.refine_robust)))
    do_refine = dims.refine_iters > 0 and not args.no_refine
    # Speckle handling (docs/ACCURACY.md round 5): the in-frame count HARD
    # gate (FeatureConfig.min_voxel_hits) stays OFF — it kills the count-1
    # speckle tail but starves the density-priced gates downstream (recall
    # 0.75 -> 0.18 at the full config). The shipped mechanism is the
    # TEMPORAL corroboration gate (FeatureConfig.corroborate): adjacent-ping
    # evidence separates decorrelating speckle from persistent returns
    # without touching real far-range points. The soft confidence channel
    # (SlamParams.conf_ref/conf_power) remains available but default-off.
    feature_config = FeatureConfig(
        max_points=dims.max_points,
        corroborate=(not args.small if args.corroborate < 0
                     else bool(args.corroborate)),
    )
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

    # Fused device programs: the tunneled remote device adds >100 ms per
    # dispatch, so the pipeline is (1) DR + keyframe gate, then — after one
    # tiny host round-trip for the data-dependent keyframe indices —
    # features, the SLAM scan, loop refinement, and mapping dispatched
    # back-to-back WITHOUT intermediate blocking (async dispatch overlaps
    # the tunnel latency; the wall clock blocks once at the end).
    ping_time_dev = jnp.asarray(bag.ping_time, jnp.float32)
    sync_dev = jnp.asarray(sync_ok)
    n_pings = len(bag.ping_time)

    from sonar_slam_tpu.slam.frontend import corroborate

    @jax.jit
    def _corr_gate(pts, masks, ping_dr3, sel, np_m, nm_m, np_p, nm_p):
        dr2 = pose3_to_pose2(ping_dr3)
        neighbors = [
            (np_m, nm_m, dr2[jnp.clip(sel - 1, 0, n_pings - 1)]),
            (np_p, nm_p, dr2[jnp.clip(sel + 1, 0, n_pings - 1)]),
        ]
        return corroborate(pts, masks, dr2[sel], neighbors,
                           feature_config.corroborate_rho,
                           feature_config.corroborate_both)

    def extract_features(sel_d, ping_dr3):
        """Keyframe feature clouds; with the temporal speckle gate on, also
        extracts the two adjacent pings' clouds (reusing the SAME compiled
        K-batch programs) and keeps points either neighbor corroborates."""
        pts, masks, conf = extractor.extract_batch_conf(ping_images[sel_d])
        if feature_config.corroborate:
            pm, mm, _ = extractor.extract_batch_conf(
                ping_images[jnp.clip(sel_d - 1, 0, n_pings - 1)])
            pp, mp, _ = extractor.extract_batch_conf(
                ping_images[jnp.clip(sel_d + 1, 0, n_pings - 1)])
            masks = _corr_gate(pts, masks, ping_dr3, sel_d, pm, mm, pp, mp)
        return pts, masks, conf

    use_basis = (do_refine and dims.refine_scale_basis
                 and dims.estimate_dvl_scale) or dims.aggregate_with_dr_basis

    @jax.jit
    def stage1():
        if use_basis:
            # one fused scan: full-DR lane + both basis-integral lanes
            # vmapped into the carry (the scan is latency-bound — three
            # separate passes cost 3x the wall time for identical results)
            dr3, basis = dead_reckoning_with_basis_scan(
                bundle.ticks, dr_config)
        else:
            _, dr3 = dead_reckoning_scan(bundle.ticks, dr_config)
        ping_dr3 = dr3[tick_idx]
        kf_mask = select_keyframes(
            ping_time_dev, pose3_to_pose2(ping_dr3), sync_dev, params
        )
        # keyframe indices gathered ON DEVICE (fixed-capacity nonzero):
        # keeps the whole pipeline one async dispatch chain — the old
        # host round-trip for the indices cost a full >100 ms tunnel sync
        K = dims.max_keyframes
        sel = jnp.nonzero(kf_mask, size=K, fill_value=0)[0]
        valid = jnp.arange(K) < jnp.minimum(
            jnp.sum(kf_mask.astype(jnp.int32)), K)
        # DVL basis integrals for the refinement stage's joint scale solve
        ping_basis = (basis[tick_idx] if use_basis
                      else jnp.zeros((1, 2, 2), jnp.float32))
        return kf_mask, sel, valid, ping_dr3, ping_basis

    # features (host-composed small jit units) and the SLAM scan stay
    # SEPARATE programs: one fused jit takes the remote compile service past
    # its request timeout, for zero steady-state benefit
    @jax.jit
    def stage2b(sel, valid, ping_dr3, pts, masks, conf, kf_basis):
        frames = KeyframeInput(
            time=ping_time_dev[sel],
            dr_pose3=ping_dr3[sel],
            points=pts,
            pmask=masks & valid[:, None],
            valid=valid,
            conf=conf,
        )
        return slam_scan(frames, params, dims, kf_basis)

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

    def compiled_cost(jitted, *a):
        """FLOPs + HBM bytes of a compiled program via XLA cost analysis
        (the roofline ingredients; VERDICT r4 missing #1). AOT lower on
        already-compiled args is a cache hit — no recompile."""
        try:
            ca = jitted.lower(*a).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return (float(ca.get("flops", 0.0)),
                    float(ca.get("bytes accessed", 0.0)))
        except Exception:  # noqa: BLE001 — accounting must not kill bench
            return None, None

    stage_cost = {}

    def device_pipeline(diagnostic=False):
        if diagnostic:
            stage_ms.clear()
            kf_mask, sel_d, valid_d, ping_dr3, ping_basis = timed(
                "dr_gate", stage1)
            pts, masks, conf = timed("features", extract_features,
                                     sel_d, ping_dr3)
            basis_arg = ping_basis[sel_d] if use_basis else None
            carry, outputs = timed(
                "slam_scan", stage2b, sel_d, valid_d, ping_dr3, pts, masks,
                conf, basis_arg)
            carry_scan = carry
            if do_refine:
                carry = timed("refine", refine_loops, carry, params,
                              rparams, dims, None, basis_arg)
            occ = timed("mapping", stage3_mapping, carry.poses, carry.points,
                        carry.pmasks, valid_d)
            if not stage_cost:
                # XLA cost analysis per compiled program (roofline
                # ingredients). The Pallas feature path's Mosaic kernels
                # are opaque to XLA's analysis — features is omitted
                # rather than misreported.
                stage_cost["dr_gate"] = compiled_cost(stage1)
                stage_cost["slam_scan"] = compiled_cost(
                    stage2b, sel_d, valid_d, ping_dr3, pts, masks, conf,
                    basis_arg)
                if do_refine:
                    stage_cost["refine"] = compiled_cost(
                        refine_loops, carry_scan, params, rparams, dims,
                        None, basis_arg)
                stage_cost["mapping"] = compiled_cost(
                    stage3_mapping, carry.poses, carry.points, carry.pmasks,
                    valid_d)
        else:
            # zero host syncs until the end: every stage consumes the
            # previous stage's device arrays, so dispatch overlaps the
            # tunnel latency and the wall clock blocks exactly once
            kf_mask, sel_d, valid_d, ping_dr3, ping_basis = stage1()
            pts, masks, conf = extract_features(sel_d, ping_dr3)
            carry, outputs = stage2b(
                sel_d, valid_d, ping_dr3, pts, masks, conf,
                ping_basis[sel_d] if use_basis else None)
            if do_refine:
                carry = refine_loops(carry, params, rparams, dims, None,
                                     ping_basis[sel_d] if use_basis else None)
            occ = stage3_mapping(carry.poses, carry.points, carry.pmasks,
                                 valid_d)
            jax.block_until_ready((carry.poses, occ))
        return carry, kf_mask, occ

    # the remote compile service in this environment sporadically drops
    # long-running compile requests — retry the first (compiling) run.
    # The first run goes through the diagnostic (per-stage blocking) path so
    # the per-PROGRAM compile+first-run cost is trended (VERDICT r4 weak #7:
    # cold-compile latency was large and untracked); steady-state repeats
    # below stay non-blocking.
    t0 = time.time()
    for attempt in range(3):
        try:
            carry, kf_mask, occ = device_pipeline(diagnostic=True)
            break
        except Exception as e:  # jax.errors.JaxRuntimeError on transport loss
            log(f"compile attempt {attempt + 1} failed: {e}")
            if attempt == 2:
                raise
            time.sleep(10)
    compile_s = time.time() - t0
    compile_stages_s = {k: round(v / 1e3, 1) for k, v in stage_ms.items()}
    log(f"first run (incl compile): {compile_s:.1f}s  per-stage: "
        f"{compile_stages_s}")

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        carry, kf_mask, occ = device_pipeline()
        times.append(time.time() - t0)
    wall = float(np.median(times))
    # per-stage blocking breakdown — always run one diagnostic repeat so the
    # driver-captured JSON carries non-empty stages_ms (VERDICT r3 #6); the
    # timed repeats above stay non-blocking
    device_pipeline(diagnostic=True)
    occupied = int(np.sum(np.asarray(occ) > 55))

    nk = int(carry.num_kf)
    kf_idx = np.nonzero(np.asarray(kf_mask))[0][: dims.max_keyframes]
    truth = bag.true_pose_at_ping[kf_idx][:nk]
    # map accuracy vs the simulator's true walls (VERDICT r4 missing #3):
    # occupied-cell precision/recall + chamfer, truth-frame-aligned
    from sonar_slam_tpu.mapping import map_metrics as _map_metrics

    mm = _map_metrics(
        np.asarray(occ), mcfg, bag.world_points, truth,
        np.asarray(carry.poses[:nk]), dims.max_range, dims.half_aperture,
    )
    ate = ate_rmse(np.asarray(carry.poses[:nk]), truth)
    hdg = ate_heading_deg(np.asarray(carry.poses[:nk]), truth)
    lm = loop_metrics(carry, truth, dims.nssm_min_st_sep,
                      prox_radius=0.5 * dims.max_range)
    if args.dump:
        np.savez(args.dump,
                 trajectory=np.asarray(carry.poses[:nk]), truth=truth,
                 dr=np.asarray(carry.dr_poses[:nk]),
                 loops_i=np.asarray(carry.loops_i), loops_j=np.asarray(carry.loops_j),
                 loops_tf=np.asarray(carry.loops_tf),
                 num_loops=int(carry.num_loops),
                 log_scale=np.asarray(carry.graph.log_scale))
    xrt = sim.duration / wall
    steps_per_sec = nk / wall
    log(f"keyframes: {nk}, loops: {int(carry.num_loops)}, wall: {wall:.3f}s, "
        f"{xrt:.1f}x real-time, {steps_per_sec:.1f} SLAM steps/s, "
        f"ATE {ate*100:.1f} cm / {hdg:.3f} deg, loop metrics {lm}")

    # estimated DVL scale: exp(log_scale) is the per-axis CORRECTION factor,
    # so the estimated sensor bias is its inverse; the simulator injected
    # bag.true_dvl_scale (x, y, z)
    est_corr = np.exp(np.asarray(carry.graph.log_scale))
    est_bias = (1.0 / est_corr).tolist() if dims.estimate_dvl_scale else None
    true_bias = (
        np.asarray(bag.true_dvl_scale)[:2].tolist()
        if bag.true_dvl_scale is not None else None
    )

    extras = {
        "slam_steps_per_sec": round(steps_per_sec, 2),
        "keyframes": nk,
        "loops": int(carry.num_loops),
        "ate_m": round(ate, 4),
        "ate_heading_deg": round(hdg, 4),
        "loop_metrics": lm,
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
        "stages_ms": {k: round(v, 1) for k, v in stage_ms.items()},
        "compile_stages_s": compile_stages_s,
        # roofline accounting (VERDICT r4 missing #1): XLA-reported FLOPs +
        # HBM bytes per compiled stage, achieved FLOP/s vs the v5e bf16 MXU
        # peak (197 TFLOP/s; conservative — the geometry matmuls run
        # Precision.HIGHEST, which costs multiple MXU passes per MAC), and
        # arithmetic intensity (FLOPs/byte; the v5e knee sits at ~240 — far
        # above every stage here, so the workload is bandwidth/latency-
        # bound by construction, see docs/ROOFLINE.md)
        "stages_flops": {k: v[0] for k, v in stage_cost.items()
                         if v[0] is not None},
        "stages_bytes": {k: v[1] for k, v in stage_cost.items()
                         if v[1] is not None},
        "stages_mfu_pct": {
            k: round(100.0 * v[0] / (stage_ms[k] * 1e-3 * 197e12), 4)
            for k, v in stage_cost.items()
            if v[0] is not None and stage_ms.get(k)
        } if jax.devices()[0].platform == "tpu" else None,
        "map_metrics": mm,
        "map_occupied_cells": occupied,
        "est_dvl_scale_xy": [round(v, 5) for v in est_bias]
        if est_bias else None,
        "true_dvl_scale_xy": [round(v, 5) for v in true_bias]
        if true_bias else None,
        "seed": args.seed,
    }

    # ---- reference-faithful parity lane (VERDICT r2 weak #3) -------------
    # p2p ICP, correspondence radius 3.0, trim 0.8, 40 iterations, 30
    # covariance starts, NSSM every keyframe, no windowed targets / pair
    # refinement / reinit / DR aggregation / best-start / odometry fusion /
    # scale calibration / post-refinement — the reference's own semantics
    # (config/icp.yaml + slam.py:718-837,1003-1132) on the same bag.
    if not args.no_parity:
        try:
            pdims = SlamDims(
                max_keyframes=dims.max_keyframes, max_points=dims.max_points,
                target_capacity=dims.target_capacity,
                nssm_cov_samples=30, ssm_sobol=64,
                nssm_sobol=dims.nssm_sobol,
                max_loops=dims.max_loops, gn_iters=3, icp=ICPConfig(),
            )
            pparams = SlamParams.default(pdims)._replace(
                keyframe_translation=jnp.float32(kf_translation),
                ssm_min_points=params.ssm_min_points,
                nssm_min_points=params.nssm_min_points,
                odom_sigmas=params.odom_sigmas,
                # reference-faithful floor (slam.yaml icp_odom_sigmas
                # semantics) — NOT the production rotation-weak floor
                icp_odom_sigmas=jnp.asarray(
                    [0.3, 0.3, 0.03] if args.small else [0.2, 0.2, 0.02],
                    jnp.float32),
            )

            # params are traced, so BOTH faithful lanes — the full one (the
            # collapse regression) and the SSM-only one (the reference's own
            # supported loop-free mode, slam.py:647-650, where faithful
            # semantics WORK — the positive parity statement, VERDICT r4
            # missing #2) — share one compiled executable.
            @jax.jit
            def parity_scan(sel, valid, ping_dr3, pts, masks, pp):
                frames = KeyframeInput(
                    time=ping_time_dev[sel], dr_pose3=ping_dr3[sel],
                    points=pts, pmask=masks & valid[:, None], valid=valid,
                )
                return slam_scan(frames, pp, pdims)

            # faithful lanes get the reference's frontend semantics too:
            # strict CFAR border (no extend divergence), no temporal gate
            parity_extractor = FeatureExtractor(
                feature_config._replace(cfar_edge="strict",
                                        corroborate=False),
                bag.geometry)

            def parity_pipeline(pp):
                kf_mask, sel_d, valid_d, ping_dr3, _ = stage1()
                pts, masks = parity_extractor.extract_batch(
                    ping_images[sel_d])
                pcarry, _ = parity_scan(sel_d, valid_d, ping_dr3, pts,
                                        masks, pp)
                jax.block_until_ready(pcarry.poses)
                return pcarry, kf_mask

            def parity_eval(pcarry, pkf_mask):
                kf_idx_p = np.nonzero(np.asarray(pkf_mask))[0][
                    : dims.max_keyframes]
                pnk = int(pcarry.num_kf)
                ptruth = bag.true_pose_at_ping[kf_idx_p][:pnk]
                est = np.asarray(pcarry.poses[:pnk])
                return (round(ate_rmse(est, ptruth), 4),
                        round(ate_heading_deg(est, ptruth), 4),
                        int(pcarry.num_loops))

            t0 = time.time()
            pcarry, pkf_mask = parity_pipeline(pparams)
            parity_compile = time.time() - t0
            t0 = time.time()
            pcarry, pkf_mask = parity_pipeline(pparams)
            pwall = time.time() - t0
            p_ate, p_hdg, p_loops = parity_eval(pcarry, pkf_mask)
            # SSM-only faithful lane: same executable, nssm_enable=False
            scarry, skf_mask = parity_pipeline(
                pparams._replace(nssm_enable=jnp.asarray(False)))
            s_ate, s_hdg, _ = parity_eval(scarry, skf_mask)
            extras["parity"] = {
                # NOTE: the full-faithful collapse magnitude is chaotic by
                # mechanism (biased loop acceptance feeds back through the
                # graph; docs/PARITY.md) — the guard is DIRECTIONAL (worse
                # than DR, way above production), not a pinned value
                "ate_m": p_ate,
                "ate_heading_deg": p_hdg,
                "loops": p_loops,
                # SSM-only: faithful semantics on the supported loop-free
                # path — this one IS stable and test-pinned
                # (tests/test_parity.py)
                "ssm_only_ate_m": s_ate,
                "ssm_only_heading_deg": s_hdg,
                "xrealtime": round(sim.duration / pwall, 1),
                "wall_s": round(pwall, 3),
                "compile_s": round(parity_compile, 1),
            }
            log(f"parity lane: {extras['parity']}")
        except Exception as e:  # noqa: BLE001 — parity must not kill bench
            log(f"parity lane failed: {e}")
            extras["parity"] = {"error": str(e)[:200]}

    # ---- dual-sonar z-accuracy line (BASELINE configs[3]) ----------------
    # always at the small scale: the z metric is resolution-, not duration-,
    # limited, and the vertical render doubles bag simulation cost.
    # Round-5 production path: per-beam range centroids -> global elevation
    # grid through the optimized poses -> lift (slam/dual_sonar.py). The
    # whole lane runs as persistent fused jits like the main lane (the old
    # replay()-per-run structure re-traced the SLAM scan every call, capping
    # the lane at ~6x real-time). z truth is sampled in the TRUTH frame via
    # the same Umeyama alignment the ATE uses — the old lane sampled
    # seafloor_z at unaligned SLAM-frame coordinates, which alone accounted
    # for ~0.5 m of its reported z_RMSE.
    if not args.no_dual:
        try:
            from sonar_slam_tpu.io.simulate import seafloor_z
            from sonar_slam_tpu.geometry import (
                pose3_to_pose2 as _p32, se2_transform_points,
            )
            from sonar_slam_tpu.estimators import dead_reckoning_scan as _drs
            from sonar_slam_tpu.slam.dual_sonar import (
                ElevationSpec, fuse_frames_global,
            )
            from sonar_slam_tpu.slam import RefineParams as _RP
            from sonar_slam_tpu.slam import refine_loops as _refine
            from sonar_slam_tpu.kernels.cfar import cfar_soca2 as _soca2
            from sonar_slam_tpu.mapping.metrics import _umeyama_se2

            dsim = SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0,
                             num_ranges=192, num_bearings=96,
                             loop_radius=10.0, imu_rate=20.0,
                             vertical_sonar=True, seed=args.seed)
            dbag = simulate_bag(dsim)
            ddims = SlamDims(
                max_keyframes=32, max_points=128, target_capacity=512,
                nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
                max_loops=32, gn_iters=3, icp=icp_prod,
                nssm_target_window=2, nssm_pair_refine=True,
                pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                pair_refine_min_inliers=25,
                refine_iters=2, refine_sweep=True, refine_chain=True)
            dparams = SlamParams.default(ddims)._replace(
                keyframe_translation=jnp.float32(2.0),
                ssm_min_points=jnp.asarray(20, jnp.int32),
                nssm_min_points=jnp.asarray(20, jnp.int32),
                fuse_odometry=jnp.asarray(True),
                use_best_start_tf=jnp.asarray(True),
                odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
                icp_odom_sigmas=jnp.asarray([0.3, 0.3, 0.03], jnp.float32),
            )
            dfc = FeatureConfig(max_points=128)
            dstreams = SensorStreams(
                imu_time=dbag.imu_time, imu_rpy=dbag.imu_rpy,
                dvl_time=dbag.dvl_time, dvl_vel=dbag.dvl_vel,
                depth_time=dbag.depth_time, depth=dbag.depth,
            )
            dbundle = build_dr_ticks(dstreams)
            dtick_idx, dsync = match_pings_to_ticks(
                dbag.ping_time, dbundle.tick_time)
            d_images = jnp.asarray(dbag.ping_images)
            d_vimages = jnp.asarray(dbag.vertical_images, jnp.float32)
            d_ping_time = jnp.asarray(dbag.ping_time, jnp.float32)
            d_sync = jnp.asarray(dsync)
            d_extractor = FeatureExtractor(dfc, dbag.geometry)
            dK = ddims.max_keyframes
            half = float(ddims.max_range) * (1.0 + ddims.aggregation_extent)
            d_spec = ElevationSpec(x0=-half, y0=-half, resolution=0.5,
                                   nx=int(np.ceil(4 * half)),
                                   ny=int(np.ceil(4 * half)))
            d_tau = d_extractor.tau
            t_, g_ = dfc.ntc // 2, dfc.ngc // 2

            @jax.jit
            def dual_stage1():
                _, dr3 = _drs(dbundle.ticks, dr_config)
                ping_dr3 = dr3[dtick_idx]
                kf = select_keyframes(
                    d_ping_time, _p32(ping_dr3), d_sync, dparams)
                sel = jnp.nonzero(kf, size=dK, fill_value=0)[0]
                valid = jnp.arange(dK) < jnp.minimum(
                    jnp.sum(kf.astype(jnp.int32)), dK)
                return kf, sel, valid, ping_dr3

            @jax.jit
            def dual_stage2(sel, valid, ping_dr3, pts, masks):
                frames = KeyframeInput(
                    time=d_ping_time[sel], dr_pose3=ping_dr3[sel],
                    points=pts, pmask=masks & valid[:, None], valid=valid,
                )
                return slam_scan(frames, dparams, ddims)

            @jax.jit
            def dual_fuse(points, pmasks, poses, sel):
                vimgs = d_vimages[sel]
                vdet = jax.vmap(
                    lambda im: _soca2(im, t_, g_, d_tau)[0]
                    & (im > dfc.threshold)
                )(vimgs)
                return fuse_frames_global(
                    points, pmasks, vimgs, vdet, poses,
                    dbag.vertical_geometry, d_spec,
                )

            drp = _RP.default()

            def dual_pipeline():
                kf, sel, valid, ping_dr3 = dual_stage1()
                pts, masks = d_extractor.extract_batch(d_images[sel])
                dcarry, _ = dual_stage2(sel, valid, ping_dr3, pts, masks)
                dcarry = _refine(dcarry, dparams, drp, ddims, None, None)
                fused = dual_fuse(dcarry.points, dcarry.pmasks,
                                  dcarry.poses, sel)
                jax.block_until_ready(fused[0])
                return dcarry, kf, fused

            t0 = time.time()
            dcarry, dkf, fused = dual_pipeline()
            d_compile = time.time() - t0
            t0 = time.time()
            dcarry, dkf, fused = dual_pipeline()
            dwall = time.time() - t0
            pts3 = np.asarray(fused[0])
            p3mask = np.asarray(fused[1])
            floor3 = np.asarray(fused[2])
            floor_w = np.asarray(fused[3])
            egrid = fused[4]

            # truth-frame alignment (SLAM frame -> world) over keyframes
            nkd = int(dcarry.num_kf)
            dkf_idx = np.nonzero(np.asarray(dkf))[0][:dK][:nkd]
            dtruth = dbag.true_pose_at_ping[dkf_idx]
            align = _umeyama_se2(
                np.asarray(dcarry.poses[:nkd, :2]), dtruth[:, :2])
            poses_np = np.asarray(dcarry.poses)
            zerrs = []
            for k in range(nkd):
                pose_k = jnp.asarray(poses_np[k])
                # lifted horizontal points with vertical evidence
                m = p3mask[k] & (np.abs(pts3[k][:, 2]) > 0.1)
                if m.any():
                    g = np.asarray(se2_transform_points(
                        jnp.asarray(pts3[k][m, :2]), pose_k))
                    zt = seafloor_z(dsim, *align(g).T)
                    zerrs.append(pts3[k][m, 2] - zt)
                # per-beam floor samples (fused 3-D points themselves)
                fm = floor_w[k] > 0
                if fm.any():
                    g = np.asarray(se2_transform_points(
                        jnp.asarray(floor3[k][fm, :2]), pose_k))
                    zt = seafloor_z(dsim, *align(g).T)
                    zerrs.append(floor3[k][fm, 2] - zt)
            zerr = np.concatenate(zerrs) if zerrs else np.full(1, np.inf)
            extras["dual_sonar"] = {
                "z_rmse_m": round(float(np.sqrt(np.mean(zerr**2))), 4),
                "z_points": int(sum(len(z) for z in zerrs)),
                "elevation_cells": int((np.asarray(egrid.w) > 0).sum()),
                "wall_s": round(dwall, 3),
                "compile_s": round(d_compile, 1),
                "xrealtime": round(dsim.duration / dwall, 1),
            }
            log(f"dual-sonar lane: {extras['dual_sonar']}")
        except Exception as e:  # noqa: BLE001
            log(f"dual-sonar lane failed: {e}")
            extras["dual_sonar"] = {"error": str(e)[:200]}

    print(json.dumps({
        "metric": "slam_replay_xrealtime",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 100.0, 3),
        "extra": extras,
    }))


if __name__ == "__main__":
    main()
