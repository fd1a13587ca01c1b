#!/usr/bin/env python
"""Offline replay CLI — the `slam.launch file:=<bag>` equivalent.

The reference's offline driver pumps a rosbag through in-process node
callbacks (`/root/reference/bruce_slam/scripts/slam_node.py:8-65`) with
--file/--start/--duration flags (`utils/io.py:108-127`). Here the "bag" is
either a synthetic survey (--simulate) or an .npz bundle saved by
scripts/simulate.py / io.bag converters, and the replay is the fused TPU
pipeline. Writes trajectory/map artifacts + a summary like the reference's
npz dumps.

Usage:
  python scripts/replay.py --simulate --duration 240 --out out/
  python scripts/replay.py --file bag.npz --start 10 --duration 60 --out out/
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_npz_bag(path: str, start: float, duration: float):
    """Load a SyntheticBag-layout npz, cropped to [start, start+duration]."""
    from sonar_slam_tpu.io.simulate import SyntheticBag
    from sonar_slam_tpu.slam.sonar import SonarGeometry

    d = np.load(path, allow_pickle=False)
    end = start + duration if duration > 0 else np.inf

    def crop(tname, *arrs):
        t = d[tname]
        sel = (t >= start) & (t <= end)
        return (t[sel],) + tuple(a[sel] for a in arrs)

    imu_t, imu_rpy = crop("imu_time", d["imu_rpy"])
    dvl_t, dvl_vel = crop("dvl_time", d["dvl_vel"])
    dep_t, depth = crop("depth_time", d["depth"])
    gyr_t = gyr_d = None
    if "gyro_time" in d and len(d["gyro_time"]):
        gyr_t, gyr_d = crop("gyro_time", d["gyro_delta"])
    png_t, imgs, truth = crop("ping_time", d["ping_images"], d["true_pose_at_ping"])
    geom = SonarGeometry(
        num_ranges=int(d["num_ranges"]),
        num_bearings=int(d["num_bearings"]),
        range_resolution=float(d["range_resolution"]),
        bearings=d["bearings"],
    )
    return SyntheticBag(
        imu_time=imu_t, imu_rpy=imu_rpy, dvl_time=dvl_t, dvl_vel=dvl_vel,
        depth_time=dep_t, depth=depth, ping_time=png_t, ping_images=imgs,
        true_pose_at_ping=truth, geometry=geom,
        world_points=d.get("world_points", np.zeros((0, 2), np.float32)),
        gyro_time=gyr_t, gyro_delta=gyr_d,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", help=".npz bag bundle")
    ap.add_argument("--simulate", action="store_true")
    ap.add_argument("--start", type=float, default=0.0)
    ap.add_argument("--duration", type=float, default=0.0, help="0 = all")
    ap.add_argument("--out", default="replay_out")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--slam-config", default=None)
    ap.add_argument("--feature-config", default=None)
    ap.add_argument("--max-keyframes", type=int, default=128)
    ap.add_argument("--no-map", action="store_true")
    ap.add_argument("--intensity", action="store_true",
                    help="also export the average-intensity map")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--save-submaps", action="store_true",
                    help="write the per-submap debug dump "
                         "(step-N-submaps.npz, mapping_node.py:139-155)")
    ap.add_argument("--p2l", action="store_true",
                    help="point-to-line ICP minimizer (docs/ACCURACY.md)")
    ap.add_argument("--icp-max-dist", type=float, default=None,
                    help="override the ICP correspondence radius")
    ap.add_argument("--no-subbin", action="store_true",
                    help="disable sub-bin peak refinement in the frontend")
    ap.add_argument("--refine", type=int, default=0, metavar="N",
                    help="post-convergence loop re-registration sweeps "
                         "(slam/refine.py); 0 disables")
    ap.add_argument("--refine-sweep", action="store_true",
                    help="also run the proximity loop sweep during --refine")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    import jax.numpy as jnp

    from sonar_slam_tpu.io.config import load_feature_config, load_slam_config
    from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
    from sonar_slam_tpu.io.state import get_states, save_checkpoint
    from sonar_slam_tpu.pipeline import ate_rmse, replay
    from sonar_slam_tpu.utils import CodeTimer, loginfo

    if args.simulate:
        sim = SimConfig(duration=args.duration or 240.0)
        bag = simulate_bag(sim)
    elif args.file:
        bag = load_npz_bag(args.file, args.start, args.duration)
    else:
        ap.error("need --file or --simulate")

    params, dims, _ = load_slam_config(
        args.slam_config, dims_overrides={"max_keyframes": args.max_keyframes}
    )
    if args.p2l or args.icp_max_dist is not None:
        from dataclasses import replace as _dcr

        icp_over = {}
        if args.p2l:
            icp_over["point_to_line"] = True
        if args.icp_max_dist is not None:
            icp_over["outlier_max_dist"] = args.icp_max_dist
        dims = _dcr(dims, icp=dims.icp._replace(**icp_over))
    feat = load_feature_config(args.feature_config, max_points=dims.max_points)
    if args.no_subbin:
        feat = feat._replace(subbin=False)
    if args.refine > 0:
        from dataclasses import replace as _dcr2

        dims = _dcr2(dims, refine_iters=args.refine,
                     refine_sweep=args.refine_sweep)

    with CodeTimer("replay (incl compile)"):
        t0 = time.time()
        res = replay(bag, feat, params, dims)
        wall = time.time() - t0

    os.makedirs(args.out, exist_ok=True)
    states = get_states(res.carry, dims)
    np.savez(
        os.path.join(args.out, "trajectory.npz"),
        states=states,
        trajectory=res.trajectory,
        dr_trajectory=res.dr_trajectory,
        keyframe_times=res.keyframe_times,
        loops_i=np.asarray(res.carry.loops_i[: int(res.carry.num_loops)]),
        loops_j=np.asarray(res.carry.loops_j[: int(res.carry.num_loops)]),
    )
    save_checkpoint(os.path.join(args.out, "slam_carry.npz"), res.carry)

    truth = bag.true_pose_at_ping[res.keyframe_ping_idx]
    ate = ate_rmse(res.trajectory, truth)
    loginfo(
        f"{res.num_keyframes} keyframes, {int(res.carry.num_loops)} loops, "
        f"ATE {ate*100:.1f} cm, wall {wall:.1f}s "
        f"({(bag.ping_time[-1]-bag.ping_time[0])/max(wall,1e-9):.1f}x real-time)"
    )

    if not args.no_map:
        import jax.numpy as _jnp

        from sonar_slam_tpu.mapping import (
            MappingConfig, SubmapModel, add_keyframe, mapping_init,
            occupancy_grid_method1, intensity_grid, submap_intensity,
        )

        mcfg = MappingConfig(max_keyframes=dims.max_keyframes)
        model = SubmapModel(mcfg, bag.geometry)
        mst = mapping_init(mcfg, model)
        kf_int = np.zeros(
            (mcfg.max_keyframes, model.sonar_xy.shape[0]), np.float32
        )
        with CodeTimer("mapping"):
            for k in range(res.num_keyframes):
                mst = add_keyframe(
                    mst, k, res.trajectory[k],
                    res.carry.points[k], res.carry.pmasks[k], model,
                )
                if args.intensity:
                    ping = bag.ping_images[res.keyframe_ping_idx[k]]
                    kf_int[k] = np.asarray(
                        submap_intensity(_jnp.asarray(ping), model)
                    )
            occ = np.asarray(occupancy_grid_method1(mst, model))
        arts = {"occ": occ}
        if args.intensity:
            arts["intensity"] = np.asarray(
                intensity_grid(mst, model, _jnp.asarray(kf_int))
            )
        np.savez_compressed(os.path.join(args.out, "occupancy.npz"), **arts)
        if args.save_submaps:
            from sonar_slam_tpu.mapping import save_submaps

            save_submaps(
                os.path.join(args.out, f"step-{res.num_keyframes - 1}"
                                       "-submaps.npz"),
                mcfg, mst, model,
            )

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from sonar_slam_tpu.utils.viz import plot_constraints, plot_trajectory

        fig, ax = plt.subplots(figsize=(8, 8))
        plot_trajectory(truth, ax=ax, color_by_index=False, color="k",
                        label="truth")
        plot_trajectory(res.dr_trajectory, ax=ax, color_by_index=False,
                        color="orange", label="dead reckoning")
        plot_constraints(
            res.trajectory,
            res.carry.loops_i[: int(res.carry.num_loops)],
            res.carry.loops_j[: int(res.carry.num_loops)],
            ax=ax,
        )
        ax.legend()
        ax.set_aspect("equal")
        fig.savefig(os.path.join(args.out, "trajectory.png"), dpi=120)
        loginfo(f"wrote {args.out}/trajectory.png")


if __name__ == "__main__":
    main()
