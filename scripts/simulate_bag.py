#!/usr/bin/env python
"""Generate a synthetic survey bag as an .npz bundle for scripts/replay.py."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="survey.npz")
    ap.add_argument("--duration", type=float, default=240.0)
    ap.add_argument("--speed", type=float, default=0.4)
    ap.add_argument("--sonar-rate", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag

    bag = simulate_bag(
        SimConfig(duration=args.duration, speed=args.speed,
                  sonar_rate=args.sonar_rate, seed=args.seed)
    )
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(
        args.out,
        imu_time=bag.imu_time, imu_rpy=bag.imu_rpy,
        dvl_time=bag.dvl_time, dvl_vel=bag.dvl_vel,
        depth_time=bag.depth_time, depth=bag.depth,
        gyro_time=bag.gyro_time, gyro_delta=bag.gyro_delta,
        ping_time=bag.ping_time, ping_images=bag.ping_images,
        true_pose_at_ping=bag.true_pose_at_ping,
        world_points=bag.world_points,
        num_ranges=bag.geometry.num_ranges,
        num_bearings=bag.geometry.num_bearings,
        range_resolution=bag.geometry.range_resolution,
        bearings=bag.geometry.bearings,
    )
    print(f"wrote {args.out}: {len(bag.ping_time)} pings over {args.duration}s")


if __name__ == "__main__":
    main()
