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


def _gamma_decompress_float(x255: np.ndarray, gamma: float) -> np.ndarray:
    """Float-domain analog of the native uint8 LUT: clip(pow(x/255,
    255/gamma) * 255). Needed for 16-bit payloads, whose 65536 levels do
    not fit the 256-entry LUT."""
    out = np.power(np.clip(x255, 0.0, 255.0) / 255.0, 255.0 / gamma) * 255.0
    return np.clip(out, 0.0, 255.0).astype(np.float32)


def decode_ping_image(ping: dict, gamma_decompress) -> np.ndarray | None:
    """OculusPing dict -> (R, C) float32 polar image.

    16-bit payloads (fire-msg flag bit 0x02, `sonar.py:22`, or a mono16/
    16UC1 Image encoding) are decoded as little-endian uint16 and rescaled
    to the 8-bit intensity domain (/257: 0..65535 -> 0..255 exactly at the
    endpoints) before gamma decompression, so downstream processing sees
    the same scale regardless of wire depth."""
    img_msg = ping.get("ping")
    if not (isinstance(img_msg, dict) and "data" in img_msg):
        return None
    data = np.asarray(img_msg["data"], np.uint8)
    h = int(img_msg.get("height", 0))
    w = int(img_msg.get("width", 0))
    fmt = img_msg.get("format", "")
    flags = int(ping.get("fire_msg", {}).get("flags", 0))
    enc = str(img_msg.get("encoding", "")).lower()
    is16 = bool(flags & 0x02) or enc in ("mono16", "16uc1")
    img16 = None
    if fmt or h == 0:  # CompressedImage (jpeg/png)
        try:
            from PIL import Image

            im = Image.open(_io.BytesIO(data.tobytes()))
            if im.mode in ("I;16", "I;16B", "I"):  # 16-bit png
                img16 = np.asarray(im, np.uint16 if "16" in im.mode
                                   else np.int32).astype(np.uint16)
            else:
                img = np.asarray(im.convert("L"), np.uint8)
        except Exception:
            return None
    elif is16:
        if data.size != 2 * h * w:
            return None
        img16 = data.view("<u2").reshape(h, w)
    else:
        if data.size != h * w:
            return None
        img = data.reshape(h, w)
    gamma = float(ping.get("fire_msg", {}).get("gamma", 0)) or 255.0
    if img16 is not None:
        return _gamma_decompress_float(img16.astype(np.float32) / 257.0,
                                       gamma)
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
