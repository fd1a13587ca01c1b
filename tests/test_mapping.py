import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.mapping import (
    MappingConfig,
    SubmapModel,
    mapping_init,
    build_submap_logodds,
    add_keyframe,
    update_poses,
    render_global_logodds,
    occupancy_grid_method1,
    occupancy_grid_method2,
    grow,
)
from sonar_slam_tpu.slam.sonar import SonarGeometry
from jax.scipy.special import logit

CFG = MappingConfig(
    x0=-40.0, y0=-40.0, width=80.0, height=80.0, resolution=0.5,
    outlier_filter_min_points=1, max_keyframes=8,
)
GEOM = SonarGeometry.make(num_ranges=128, num_bearings=64, max_range=20.0)


@pytest.fixture(scope="module")
def model():
    return SubmapModel(CFG, GEOM)


def wall_points(x=10.0, n=40, cap=64):
    ys = np.linspace(-4, 4, n)
    pts = np.zeros((cap, 2), np.float32)
    pts[:n] = np.stack([np.full(n, x), ys], -1)
    m = np.zeros(cap, bool)
    m[:n] = True
    return jnp.asarray(pts), jnp.asarray(m)


def test_submap_hit_miss_structure(model):
    pts, m = wall_points()
    lo = np.asarray(build_submap_logodds(pts, m, model)).reshape(model.shape)
    hit_lo = logit(CFG.hit_prob)
    miss_lo = float(logit(CFG.miss_prob))
    # some cells reach (close to) the hit log-odds
    assert lo.max() > 0.5 * hit_lo
    # free space before the wall is carved as miss
    wall_row = int(round(10.0 / GEOM.range_resolution - 1)) // model.r_skip
    center_col = model.shape[1] // 2
    np.testing.assert_allclose(lo[: wall_row - 3, center_col], miss_lo, atol=1e-4)
    # cells beyond the wall stay unknown (log-odds 0)
    assert abs(lo[wall_row + 5 :, center_col]).max() < 1e-4


def test_submap_empty_frame_all_miss(model):
    pts = jnp.zeros((64, 2), jnp.float32)
    m = jnp.zeros(64, bool)
    lo = np.asarray(build_submap_logodds(pts, m, model))
    np.testing.assert_allclose(lo, float(logit(CFG.miss_prob)), atol=1e-4)


def test_add_keyframe_updates_grid(model):
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    st = add_keyframe(st, 0, jnp.zeros(3, jnp.float32), pts, m, model)
    grid = np.asarray(st.grid)
    # occupied at the wall location (world x=10, y=0) -> col index
    c = int(round((10.0 - CFG.x0) / CFG.resolution))
    r = int(round((0.0 - CFG.y0) / CFG.resolution))
    assert grid[r, c - 1 : c + 2].max() > 0.2
    # free space carved between sensor and wall
    c_free = int(round((5.0 - CFG.x0) / CFG.resolution))
    assert grid[r, c_free] < 0
    occ = np.asarray(occupancy_grid_method1(st, model))
    assert occ[r, c - 1 : c + 2].max() > 50
    assert occ[r, c_free] < 50


def test_incremental_matches_full_render(model):
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    poses = [
        jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
        jnp.asarray([2.0, 1.0, 0.3], jnp.float32),
        jnp.asarray([4.0, 2.0, 0.6], jnp.float32),
    ]
    for k, p in enumerate(poses):
        st = add_keyframe(st, k, p, pts, m, model)
    full = np.asarray(render_global_logodds(st, model))
    np.testing.assert_allclose(np.asarray(st.grid), full, atol=1e-4)


def test_update_poses_repaints(model):
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    st = add_keyframe(st, 0, jnp.zeros(3, jnp.float32), pts, m, model)
    st = add_keyframe(st, 1, jnp.asarray([1.0, 0.0, 0.0], jnp.float32), pts, m, model)
    # move keyframe 1 by 3 m (beyond min_translation) -> repaint
    new_poses = jnp.asarray([[0.0, 0.0, 0.0], [4.0, 0.0, 0.0]] + [[0, 0, 0]] * 6,
                            jnp.float32)
    st2 = update_poses(st, new_poses, model)
    # wall of kf1 moved from x=11 to x=14
    r = int(round((0.0 - CFG.y0) / CFG.resolution))
    c_new = int(round((14.0 - CFG.x0) / CFG.resolution))
    assert np.asarray(st2.grid)[r, c_new - 1 : c_new + 2].max() > 0.2
    # small move below thresholds -> no repaint
    small = jnp.asarray([[0.1, 0.0, 0.0], [1.05, 0.0, 0.0]] + [[0, 0, 0]] * 6,
                        jnp.float32)
    st3 = update_poses(st, small, model)
    np.testing.assert_allclose(np.asarray(st3.grid), np.asarray(st.grid), atol=1e-4)


def test_occupancy_method2(model):
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    st = add_keyframe(st, 0, jnp.zeros(3, jnp.float32), pts, m, model)
    occ = np.asarray(occupancy_grid_method2(st, model, pts, m))
    r = int(round((0.0 - CFG.y0) / CFG.resolution))
    c = int(round((10.0 - CFG.x0) / CFG.resolution))
    assert occ[r, c] == 100
    c_free = int(round((5.0 - CFG.x0) / CFG.resolution))
    assert occ[r, c_free] == 0
    # far corner unobserved
    assert occ[2, 2] == -1


def test_grow(model):
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    st = add_keyframe(st, 0, jnp.zeros(3, jnp.float32), pts, m, model)
    new_cfg, new_st = grow(CFG, st, pad_m=10.0)
    assert new_cfg.rows == CFG.rows + 2 * 20
    assert new_cfg.x0 == CFG.x0 - 10.0
    # content preserved at shifted location
    r = int(round((0.0 - CFG.y0) / CFG.resolution))
    c = int(round((10.0 - CFG.x0) / CFG.resolution))
    old = np.asarray(st.grid)[r, c]
    new = np.asarray(new_st.grid)[r + 20, c + 20]
    np.testing.assert_allclose(old, new)


def test_intensity_grid(model):
    from sonar_slam_tpu.mapping import intensity_grid, submap_intensity
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    st = add_keyframe(st, 0, jnp.zeros(3, jnp.float32), pts, m, model)
    img = np.full((GEOM.num_ranges, GEOM.num_bearings), 128.0, np.float32)
    inten = submap_intensity(jnp.asarray(img), model)
    kf_int = jnp.zeros((CFG.max_keyframes, inten.shape[0]), jnp.float32)
    kf_int = kf_int.at[0].set(inten)
    grid = np.asarray(intensity_grid(st, model, kf_int))
    r = int(round((0.0 - CFG.y0) / CFG.resolution))
    c = int(round((10.0 - CFG.x0) / CFG.resolution))
    # observed cells hold round(128/255*100) = 50; unobserved -1
    assert grid[r, c] == 50
    assert grid[2, 2] == -1


def test_get_occupancy_map_service(model):
    from sonar_slam_tpu.mapping import get_occupancy_map
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    st = add_keyframe(st, 0, jnp.zeros(3, jnp.float32), pts, m, model)
    st = add_keyframe(st, 1, jnp.asarray([3.0, 0.0, 0.0], jnp.float32), pts, m, model)
    # subset: only keyframe 0
    frames = jnp.asarray([True] + [False] * (CFG.max_keyframes - 1))
    occ, res = get_occupancy_map(st, model, frames=frames)
    assert res == CFG.resolution
    r = int(round((0.0 - CFG.y0) / CFG.resolution))
    c0 = int(round((10.0 - CFG.x0) / CFG.resolution))
    c1 = int(round((13.0 - CFG.x0) / CFG.resolution))
    assert np.asarray(occ)[r, c0 - 1 : c0 + 2].max() > 50
    # keyframe 1's wall (x=13) must NOT appear in the subset render
    assert np.asarray(occ)[r, c1 - 1 : c1 + 2].max() <= 50
    # coarser resolution resample
    occ2, res2 = get_occupancy_map(st, model, resolution=1.0)
    assert res2 == 1.0
    assert occ2.shape[0] == CFG.rows // 2


def test_save_submaps_roundtrip(model, tmp_path):
    """Per-submap debug dump (ref mapping_node.py:139-155 save_submaps)."""
    from sonar_slam_tpu.mapping import save_submaps
    st = mapping_init(CFG, model)
    pts, m = wall_points()
    st = add_keyframe(st, 0, jnp.zeros(3, jnp.float32), pts, m, model)
    st = add_keyframe(st, 1, jnp.asarray([3.0, 1.0, 0.1], jnp.float32), pts, m, model)
    path = str(tmp_path / "step-1-submaps.npz")
    save_submaps(path, CFG, st, model)
    d = np.load(path)
    assert d["poses"].shape == (2, 3)
    np.testing.assert_allclose(d["poses"][1], [3.0, 1.0, 0.1], atol=1e-6)
    assert d["logodds"].shape == (2, model.sonar_xy.shape[0])
    np.testing.assert_allclose(d["logodds"][0], np.asarray(st.kf_logodds[0]))
    assert d["cell_xy"].shape == (model.sonar_xy.shape[0], 2)
    np.testing.assert_allclose(
        d["map_size"],
        [CFG.x0, CFG.y0, CFG.width, CFG.height, CFG.resolution])


def test_map_metrics_scores_against_true_walls(model):
    """Map accuracy metric (VERDICT r4 missing #3): occupied-cell
    precision/recall + chamfer vs the known wall, with FOV-gated recall."""
    from sonar_slam_tpu.mapping import map_metrics, observed_mask

    st = mapping_init(CFG, model)
    pts, m = wall_points()  # wall at x=10, y in [-4, 4], identity pose
    poses = np.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]], np.float32)
    for k, p in enumerate(poses):
        st = add_keyframe(st, k, jnp.asarray(p), pts, m, model)
    occ = np.asarray(occupancy_grid_method1(st, model))

    ys = np.linspace(-4, 4, 40)
    wall = np.stack([np.full_like(ys, 10.0), ys], -1)
    # an unobserved decoy wall BEHIND the sensor must not count as missed
    decoy = np.stack([np.full_like(ys, -15.0), ys], -1)
    world = np.concatenate([wall, decoy])

    seen = observed_mask(world, poses, max_range=20.0,
                         half_aperture=float(GEOM.bearings[-1]))
    assert seen[: len(wall)].all()
    assert not seen[len(wall):].any()

    mm = map_metrics(occ, CFG, world, poses, poses,
                     max_range=20.0,
                     half_aperture=float(GEOM.bearings[-1]))
    assert mm["observed_truth_points"] == len(wall)
    assert mm["recall"] >= 0.9, mm
    assert mm["precision"] >= 0.7, mm  # inflation widens the wall ~1 cell
    assert mm["chamfer_cm"] < 50, mm

    # a fabricated occupied blob far from any wall must tank precision
    occ_bad = occ.copy()
    rr = int(round((15.0 - CFG.y0) / CFG.resolution))
    cc = int(round((-20.0 - CFG.x0) / CFG.resolution))
    occ_bad[rr - 4 : rr + 4, cc - 4 : cc + 4] = 100
    mm_bad = map_metrics(occ_bad, CFG, world, poses, poses,
                         max_range=20.0,
                         half_aperture=float(GEOM.bearings[-1]))
    assert mm_bad["precision"] < mm["precision"] - 0.1, (mm, mm_bad)
