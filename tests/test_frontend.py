"""Feature-extraction front end unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.slam import FeatureConfig, FeatureExtractor, SonarGeometry

GEOM = SonarGeometry.make(num_ranges=256, num_bearings=128, max_range=30.0)
rng = np.random.default_rng(44)


def wall_ping(x_wall=15.0):
    img = rng.exponential(scale=10.0, size=(256, 128)).astype(np.float32)
    wall_r = x_wall / np.cos(GEOM.bearings)
    rows = np.clip(np.round(wall_r / GEOM.range_resolution - 1).astype(int),
                   0, 255)
    for c, r in enumerate(rows):
        if wall_r[c] < 29:
            img[r, c] = 230.0
    return np.clip(img, 0, 255)


@pytest.mark.parametrize("alg", ["SOCA", "CA", "GOCA", "OS"])
def test_extractor_finds_wall(alg):
    ext = FeatureExtractor(FeatureConfig(alg=alg, max_points=256), GEOM)
    pts, mask = ext.extract(jnp.asarray(wall_ping()))
    pts = np.asarray(pts)[np.asarray(mask)]
    assert len(pts) > 20, f"{alg}: {len(pts)} points"
    # most points on the wall plane x ~ 15
    frac_on_wall = (np.abs(pts[:, 0] - 15.0) < 1.0).mean()
    assert frac_on_wall > 0.8, f"{alg}: {frac_on_wall}"


def test_extractor_voxel_spacing():
    # the voxel-spacing invariant holds for the raw binner (subbin=False);
    # sub-bin refinement may legitimately pull two adjacent voxels' centroids
    # to the same physical peak at a voxel boundary
    cfg = FeatureConfig(resolution=0.5, max_points=256, subbin=False)
    ext = FeatureExtractor(cfg, GEOM)
    pts, mask = ext.extract(jnp.asarray(wall_ping()))
    pts = np.asarray(pts)[np.asarray(mask)]
    # no two kept points closer than ~half the voxel size
    from scipy.spatial.distance import pdist

    if len(pts) > 1:
        assert pdist(pts).min() > 0.2


def test_subbin_refinement_bounded():
    """Refinement must move each output point by less than one polar cell
    (offsets are clipped to half a cell along each axis)."""
    base = FeatureExtractor(
        FeatureConfig(resolution=0.5, max_points=256, subbin=False), GEOM)
    fine = FeatureExtractor(
        FeatureConfig(resolution=0.5, max_points=256, subbin=True), GEOM)
    img = jnp.asarray(wall_ping())
    p0, m0 = base.extract(img)
    p1, m1 = fine.extract(img)
    m0, m1 = np.asarray(m0), np.asarray(m1)
    # voxel ranking (hit counts) is unchanged, so slot i is the same voxel;
    # the radius-outlier filter sees shifted positions, so masks may differ
    # on a few boundary points
    assert (m0 == m1).mean() > 0.95
    both = m0 & m1
    d = np.linalg.norm(np.asarray(p1 - p0), axis=-1)[both]
    # cell size: range_resolution radially, r*dtheta tangentially (~<= 0.5 m
    # at max range for this geometry)
    assert d.max() <= 0.5, d.max()


@pytest.mark.parametrize("edge", ["row0", "row-1", "col0", "col-1"])
def test_subbin_zero_offset_at_image_boundary(edge):
    """ADVICE r2 item 1: boundary rows/cols have no 3-point neighborhood;
    jnp.roll would wrap the opposite edge in as a fake neighbor, shifting
    every inward-decreasing boundary peak by up to half a cell outward.
    Detections ON the image boundary must keep exactly their static cell
    position (zero sub-bin offset along BOTH axes)."""
    ext = FeatureExtractor(
        FeatureConfig(resolution=0.5, max_points=256, subbin=True), GEOM)
    R, C = GEOM.num_ranges, GEOM.num_bearings
    img = np.full((R, C), 2.0, np.float32)
    # a bright peak sitting on the chosen boundary, decreasing inward —
    # exactly the shape the wrapped-roll bug displaced
    if edge == "row0":
        r, c = 0, C // 2
        img[r, c], img[r + 1, c] = 240.0, 60.0
    elif edge == "row-1":
        r, c = R - 1, C // 2
        img[r, c], img[r - 1, c] = 240.0, 60.0
    elif edge == "col0":
        r, c = R // 2, 0
        img[r, c], img[r, c + 1] = 240.0, 60.0
    else:
        r, c = R // 2, C - 1
        img[r, c], img[r, c - 1] = 240.0, 60.0
    refined = np.asarray(ext._subbin_xy(jnp.asarray(img)))
    static = np.asarray(ext._cells)
    cell = r * C + c
    np.testing.assert_array_equal(refined[cell], static[cell])
    # and the interior neighbor DOES refine (the interpolator is active)
    if edge.startswith("row"):
        inner = (r + (1 if edge == "row0" else -1)) * C + c
    else:
        inner = r * C + (c + (1 if edge == "col0" else -1))
    assert np.any(refined[inner] != static[inner])


def test_extractor_batch_matches_single():
    ext = FeatureConfig(max_points=128)
    ext = FeatureExtractor(FeatureConfig(max_points=128), GEOM)
    imgs = np.stack([wall_ping(10.0), wall_ping(20.0)])
    bp, bm = ext.extract_batch(jnp.asarray(imgs))
    for i in range(2):
        sp, sm = ext.extract(jnp.asarray(imgs[i]))
        np.testing.assert_allclose(
            np.asarray(bp[i]), np.asarray(sp), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(bm[i]), np.asarray(sm))


def test_empty_ping_yields_nothing():
    ext = FeatureExtractor(
        FeatureConfig(max_points=128, outlier_min_points=5), GEOM
    )
    flat = np.full((256, 128), 50.0, np.float32)  # constant image: no CFAR hits
    pts, mask = ext.extract(jnp.asarray(flat))
    assert int(jnp.sum(mask)) == 0


def test_detections_mask_shape():
    ext = FeatureExtractor(FeatureConfig(max_points=128), GEOM)
    det = ext.detections(jnp.asarray(wall_ping()))
    assert det.shape == (256, 128)
    assert bool(det.any())


def test_corroboration_gate_semantics():
    """Temporal speckle gate (FeatureConfig.corroborate): a point survives
    iff SOME masked neighbor point lands within rho after motion comp."""
    from sonar_slam_tpu.slam.frontend import corroboration_gate

    # keyframe at origin; neighbor ping taken 0.2 m ahead along +x
    pose = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    nb_pose = jnp.asarray([[0.2, 0.0, 0.0]], jnp.float32)
    # keyframe body points: a wall point at (10, 0) and speckle at (5, -8)
    pts = jnp.asarray([[[10.0, 0.0], [5.0, -8.0], [0.0, 0.0]]], jnp.float32)
    masks = jnp.asarray([[True, True, False]])
    # neighbor sees the SAME wall point -> (9.8, 0) in ITS body frame, plus
    # its own speckle far from everything; a masked-out point sitting right
    # on the speckle must NOT corroborate it
    nb_pts = jnp.asarray(
        [[[9.8, 0.0], [-3.0, 12.0], [4.8, -8.0]]], jnp.float32)
    nb_masks = jnp.asarray([[True, True, False]])
    out = corroboration_gate(pts, masks, pose, nb_pts, nb_masks, nb_pose,
                             rho=0.3)
    np.testing.assert_array_equal(np.asarray(out), [[True, False, False]])
    # widen rho past the speckle->masked-neighbor gap: still False (masked
    # witnesses never corroborate), but a REAL witness at 0.25 m would pass
    out2 = corroboration_gate(pts, masks, pose, nb_pts, nb_masks, nb_pose,
                              rho=20.0)
    assert bool(out2[0, 0]) and bool(out2[0, 1])  # nb speckle now in range
    assert not bool(out2[0, 2])  # input mask always respected


def test_corroborate_or_vs_and_composition():
    """`corroborate` (the composition pipeline.replay/bench share): OR keeps
    a point seen by either neighbor; AND requires both."""
    from sonar_slam_tpu.slam.frontend import corroborate

    pose = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    pts = jnp.asarray([[[10.0, 0.0], [5.0, 5.0]]], jnp.float32)
    masks = jnp.asarray([[True, True]])
    # neighbor A sees only point 0; neighbor B sees both
    nb_a = (jnp.asarray([[[10.0, 0.05]]], jnp.float32),
            jnp.asarray([[True]]), pose)
    nb_b = (jnp.asarray([[[10.0, -0.05], [5.0, 5.1]]], jnp.float32),
            jnp.asarray([[True, True]]), pose)
    out_or = corroborate(pts, masks, pose, [nb_a, nb_b], rho=0.3)
    np.testing.assert_array_equal(np.asarray(out_or), [[True, True]])
    out_and = corroborate(pts, masks, pose, [nb_a, nb_b], rho=0.3,
                          both=True)
    np.testing.assert_array_equal(np.asarray(out_and), [[True, False]])


def test_corroboration_rotation_motion_comp():
    """The gate must compensate rotation: a 10-m point seen under a 5-deg
    yaw change moves ~0.87 m in the body frame — far beyond rho — yet must
    corroborate after compensation."""
    from sonar_slam_tpu.slam.frontend import corroboration_gate

    th = np.deg2rad(5.0)
    pose = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    nb_pose = jnp.asarray([[0.0, 0.0, th]], jnp.float32)
    world_pt = np.array([10.0, 0.0])
    # neighbor body frame: rotate world point by -th
    c, s = np.cos(-th), np.sin(-th)
    nb_body = np.array([c * world_pt[0] - s * world_pt[1],
                        s * world_pt[0] + c * world_pt[1]])
    pts = jnp.asarray([[world_pt.tolist()]], jnp.float32)
    masks = jnp.asarray([[True]])
    nb_pts = jnp.asarray([[nb_body.tolist()]], jnp.float32)
    nb_masks = jnp.asarray([[True]])
    out = corroboration_gate(pts, masks, pose, nb_pts, nb_masks, nb_pose,
                             rho=0.05)
    assert bool(out[0, 0])
