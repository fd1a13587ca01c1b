import numpy as np
import jax.numpy as jnp

from sonar_slam_tpu.slam.dual_sonar import (
    vertical_cell_xz,
    elevation_profile,
    fuse_vertical,
    fuse_frames,
)
from sonar_slam_tpu.slam.sonar import SonarGeometry

GEOM_V = SonarGeometry.make(
    num_ranges=128, num_bearings=64, max_range=20.0,
    horizontal_aperture=float(np.radians(24.0)), model="M1200d", mode=2,
)


def make_vertical_detection(x_target, z_target):
    """Detection mask with returns at (x_target, z_target)."""
    det = np.zeros((GEOM_V.num_ranges, GEOM_V.num_bearings), bool)
    rho = np.hypot(x_target, z_target)
    phi = np.arctan2(z_target, x_target)
    r = int(round(rho / GEOM_V.range_resolution - 1))
    c = int(np.interp(phi, GEOM_V.bearings, np.arange(GEOM_V.num_bearings)))
    det[r - 1 : r + 2, c] = True
    return det


def test_vertical_cell_geometry():
    cells = np.asarray(vertical_cell_xz(GEOM_V))
    # zero-elevation column has z ~ 0 and x ~ range
    mid = GEOM_V.num_bearings // 2
    np.testing.assert_allclose(cells[:, mid, 1], 0.0, atol=0.25)
    np.testing.assert_allclose(cells[-1, mid, 0], GEOM_V.max_range, atol=0.3)


def test_elevation_profile_recovers_height():
    det = make_vertical_detection(x_target=10.0, z_target=1.5)
    z, ok = elevation_profile(jnp.asarray(det), GEOM_V, num_bins=40, max_x=20.0)
    z, ok = np.asarray(z), np.asarray(ok)
    b = int(10.0 / (20.0 / 40))
    assert ok[b - 1 : b + 2].any()
    got = z[b - 1 : b + 2][ok[b - 1 : b + 2]]
    np.testing.assert_allclose(got.mean(), 1.5, atol=0.3)


def test_fuse_vertical_assigns_z():
    det = make_vertical_detection(10.0, 1.5)
    z, ok = elevation_profile(jnp.asarray(det), GEOM_V, num_bins=40, max_x=20.0)
    h_pts = jnp.asarray([[10.0, 0.0], [10.0, 2.0], [3.0, 0.0], [0, 0]], jnp.float32)
    h_mask = jnp.asarray([True, True, True, False])
    p3, m = fuse_vertical(h_pts, h_mask, z, ok, 20.0)
    p3 = np.asarray(p3)
    # points at forward distance ~10 get the measured height
    np.testing.assert_allclose(p3[0, 2], 1.5, atol=0.3)
    # distance sqrt(104) ~ 10.2 falls in a nearby bin; same height zone
    assert abs(p3[1, 2] - 1.5) < 0.5 or p3[1, 2] == 0.0
    # unmatched forward distance -> planar z = 0
    np.testing.assert_allclose(p3[2, 2], 0.0)
    # masked point zeroed
    np.testing.assert_allclose(p3[3], 0.0)


def test_fuse_frames_batched():
    det = make_vertical_detection(8.0, -1.0)
    h_pts = np.zeros((2, 4, 2), np.float32)
    h_pts[:, 0] = [8.0, 0.0]
    h_mask = np.zeros((2, 4), bool)
    h_mask[:, 0] = True
    p3, m = fuse_frames(
        jnp.asarray(h_pts), jnp.asarray(h_mask),
        jnp.asarray(np.stack([det, det])), GEOM_V,
    )
    assert p3.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(p3)[:, 0, 2], -1.0, atol=0.35)
