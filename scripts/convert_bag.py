#!/usr/bin/env python
"""Convert a BlueROV ROS1 bag into the framework's .npz bundle.

Uses the native ROS-free bag reader (`sonar_slam_tpu.io.rosbag`) to decode
the reference's raw sensor topics, reassembles OculusPing images (raw, or
JPEG-compressed via PIL, applying the fire-msg gamma decompression of
`utils/conversions.py:217-247`), and writes the same bundle layout
`scripts/replay.py` consumes.

Usage: python scripts/convert_bag.py input.bag --out survey.npz
"""

from __future__ import annotations

import argparse
import io as _io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decode_ping_image(ping: dict, gamma_decompress) -> np.ndarray | None:
    """OculusPing dict -> (R, C) float32 polar image."""
    img_msg = ping.get("ping")
    if isinstance(img_msg, dict) and "data" in img_msg:
        data = np.asarray(img_msg["data"], np.uint8)
        h = int(img_msg.get("height", 0))
        w = int(img_msg.get("width", 0))
        fmt = img_msg.get("format", "")
        if fmt or h == 0:  # CompressedImage (jpeg/png)
            try:
                from PIL import Image

                im = Image.open(_io.BytesIO(data.tobytes())).convert("L")
                img = np.asarray(im, np.uint8)
            except Exception:
                return None
        else:
            img = data.reshape(h, w)
    else:
        return None
    gamma = float(ping.get("fire_msg", {}).get("gamma", 0)) or 255.0
    return gamma_decompress(img, gamma)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("--out", default=None)
    ap.add_argument("--imu-version", type=int, default=1)
    args = ap.parse_args()

    from sonar_slam_tpu.io.rosbag import bag_to_streams
    from sonar_slam_tpu.slam.sonar import SonarGeometry

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native"),
    )
    import runtime as native

    streams, pings = bag_to_streams(args.bag, imu_version=args.imu_version)
    if not pings:
        sys.exit("no sonar pings found in bag")

    # geometry from the first decodable ping (OculusProperty.configure analog)
    first = pings[0]
    bearings = np.asarray(first["bearings"], np.float32) / 100.0
    bearings = np.radians(bearings)
    geom = SonarGeometry(
        num_ranges=int(first["num_ranges"]),
        num_bearings=len(bearings),
        range_resolution=float(first["range_resolution"]),
        bearings=bearings,
    )

    times, imgs = [], []
    skipped = 0
    for p in pings:
        img = decode_ping_image(p, native.gamma_decompress)
        if img is None or img.shape != (geom.num_ranges, geom.num_bearings):
            skipped += 1
            continue
        times.append(p.get("header", {}).get("stamp", p["_t"]))
        imgs.append(img.astype(np.float32))
    if not imgs:
        sys.exit("no decodable ping images (compressed without PIL support?)")
    print(f"{len(imgs)} pings decoded ({skipped} skipped)")

    t0 = min(
        streams.imu_time.min() if len(streams.imu_time) else np.inf,
        streams.dvl_time.min() if len(streams.dvl_time) else np.inf,
        min(times),
    )
    out = args.out or os.path.splitext(args.bag)[0] + ".npz"
    np.savez_compressed(
        out,
        imu_time=(streams.imu_time - t0).astype(np.float32),
        imu_rpy=streams.imu_rpy,
        dvl_time=(streams.dvl_time - t0).astype(np.float32),
        dvl_vel=streams.dvl_vel,
        depth_time=(streams.depth_time - t0).astype(np.float32),
        depth=streams.depth,
        ping_time=(np.asarray(times) - t0).astype(np.float32),
        ping_images=np.stack(imgs),
        true_pose_at_ping=np.zeros((len(imgs), 3), np.float32),  # unknown
        world_points=np.zeros((0, 2), np.float32),
        num_ranges=geom.num_ranges,
        num_bearings=geom.num_bearings,
        range_resolution=geom.range_resolution,
        bearings=geom.bearings,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
