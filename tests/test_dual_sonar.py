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


# ---------------------------------------------------------------------------
# round-5 production path: per-beam centroids + global elevation grid
# ---------------------------------------------------------------------------

from sonar_slam_tpu.slam.dual_sonar import (  # noqa: E402
    ElevationSpec,
    accumulate_elevation,
    beam_floor_samples,
    fuse_frames_global,
    lift_from_grid,
)


TILTED = SonarGeometry(
    num_ranges=GEOM_V.num_ranges, num_bearings=GEOM_V.num_bearings,
    range_resolution=GEOM_V.range_resolution,
    bearings=(np.asarray(GEOM_V.bearings) + np.radians(25.0)).astype(
        np.float32),
    model=GEOM_V.model, vertical_aperture=GEOM_V.vertical_aperture,
)


def render_floor(z_of_x, noise=0.0, seed=0):
    """Vertical frame imaging a seafloor profile z(x): per beam, a 3-row
    intensity band at the range where the (tilted) beam meets the floor
    (the simulator's vertical render, io/simulate.py::_render_vertical)."""
    rng = np.random.default_rng(seed)
    img = (rng.exponential(scale=10.0, size=(TILTED.num_ranges,
                                             TILTED.num_bearings))
           if noise else np.zeros((TILTED.num_ranges, TILTED.num_bearings)))
    for c, phi in enumerate(np.asarray(TILTED.bearings)):
        if phi <= 0.05:
            continue
        r = 5.0 / np.sin(phi)
        for _ in range(8):  # converge the ray/floor intersection
            z = z_of_x(r * np.cos(phi))
            r = z / np.sin(phi)
        if 0.5 < r < TILTED.max_range * 0.95:
            row = int(round(r / TILTED.range_resolution - 1))
            img[max(row - 1, 0): row + 2, c] = 220.0
    return np.clip(img, 0, 255).astype(np.float32)


def test_beam_floor_samples_recover_sloped_floor():
    """Slope-geometry pin (VERDICT r4 item 3): per-beam centroids must
    recover a SLOPED seafloor to centimeters — the mean-bin profile cannot
    (its error is the bin width)."""
    slope = lambda x: 5.0 + 0.15 * x
    img = render_floor(slope)
    det = jnp.asarray(img > 100.0)
    xz, w = beam_floor_samples(jnp.asarray(img), det, TILTED)
    xz, w = np.asarray(xz), np.asarray(w)
    got = xz[w > 0]
    assert len(got) >= 10
    err = got[:, 1] - slope(got[:, 0])
    assert np.sqrt((err ** 2).mean()) < 0.08, err


def test_elevation_grid_accumulate_and_lift():
    spec = ElevationSpec(x0=-10.0, y0=-10.0, resolution=0.5, nx=40, ny=40)
    xy = jnp.asarray([[0.0, 0.0], [0.1, 0.1], [5.0, 5.0], [100.0, 0.0]],
                     jnp.float32)
    z = jnp.asarray([2.0, 2.2, 4.0, 9.0], jnp.float32)
    w = jnp.asarray([1.0, 1.0, 2.0, 1.0], jnp.float32)
    grid = accumulate_elevation(xy, z, w, spec)
    # out-of-grid sample dropped
    assert float(np.asarray(grid.w).sum()) == 4.0
    zq, ok = lift_from_grid(
        jnp.asarray([[0.05, 0.05], [5.0, 5.0], [-9.0, -9.0]], jnp.float32),
        grid, spec)
    zq, ok = np.asarray(zq), np.asarray(ok)
    assert ok[0] and ok[1] and not ok[2]
    np.testing.assert_allclose(zq[0], 2.1, atol=0.05)
    np.testing.assert_allclose(zq[1], 4.0, atol=0.05)
    assert zq[2] == 0.0


def test_fuse_frames_global_cross_frame_lift():
    """A horizontal point in frame A gets its z from frame B's strip when
    B's fan crossed it — the cross-keyframe fusion the per-frame path
    cannot do."""
    flat = lambda x: 5.0
    img = render_floor(flat)
    det = img > 100.0
    F, N, C = 2, 4, GEOM_V.num_bearings
    # frame 0 at origin heading +x; frame 1 displaced sideways, heading +y
    poses = jnp.asarray([[0.0, 0.0, 0.0], [3.0, -2.0, np.pi / 2]],
                        jnp.float32)
    h_pts = np.zeros((F, N, 2), np.float32)
    # frame 1's point at local (x=4, y=-1): global ~(4, 2) — inside frame
    # 0's strip (along global +x)? frame0 strip covers global y=0 line;
    # use a frame-1 local point mapping onto global (8, 0):
    # global = pose1 + R(90deg) @ local -> local (2, -5) -> (3+5, -2+2)=(8,0)
    h_pts[1, 0] = [2.0, -5.0]
    h_mask = np.zeros((F, N), bool)
    h_mask[1, 0] = True
    spec = ElevationSpec(x0=-20.0, y0=-20.0, resolution=0.5, nx=80, ny=80)
    vimgs = jnp.asarray(np.stack([img, np.zeros_like(img)]))
    vdets = jnp.asarray(np.stack([det, np.zeros_like(det)]))
    pts3, mask, floor3, floor_w, grid = fuse_frames_global(
        jnp.asarray(h_pts), jnp.asarray(h_mask), vimgs, vdets, poses,
        TILTED, spec)
    pts3 = np.asarray(pts3)
    # frame 1's point got z from frame 0's samples
    assert abs(pts3[1, 0, 2] - 5.0) < 0.15, pts3[1, 0]
    # floor samples are exported as fused 3-D points with weights
    assert (np.asarray(floor_w)[0] > 0).sum() >= 10
    assert (np.asarray(floor_w)[1] > 0).sum() == 0
