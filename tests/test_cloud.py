import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.cloud import (
    pairwise_sq_dists,
    nn_match,
    count_overlap,
    VoxelGridSpec,
    voxel_downsample,
    voxel_downsample_with_keys,
    remove_outlier,
    density_filter,
)

rng = np.random.default_rng(7)


def padded(points, capacity):
    n = len(points)
    out = np.zeros((capacity, 2), np.float32)
    out[:n] = points
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


def test_pairwise_sq_dists():
    a = rng.normal(size=(17, 2)).astype(np.float32)
    b = rng.normal(size=(23, 2)).astype(np.float32)
    d2 = np.asarray(pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, ref, atol=1e-4)


def test_nn_match_brute_force():
    ref = rng.normal(size=(40, 2)).astype(np.float32) * 5
    query = rng.normal(size=(25, 2)).astype(np.float32) * 5
    rp, rm = padded(ref, 64)
    qp, qm = padded(query, 32)
    idx, d2 = nn_match(rp, rm, qp, qm, 2.0)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    for i, q in enumerate(query):
        dists = ((ref - q) ** 2).sum(-1)
        j = dists.argmin()
        if dists[j] <= 4.0:
            assert idx[i] == j
            np.testing.assert_allclose(d2[i], dists[j], atol=1e-4)
        else:
            assert idx[i] == -1
    # padded queries unmatched
    assert (idx[25:] == -1).all()


def test_count_overlap():
    pts = rng.uniform(-10, 10, size=(50, 2)).astype(np.float32)
    sp, sm = padded(pts, 64)
    tp, tm = padded(pts + 0.05, 64)
    assert int(count_overlap(sp, sm, tp, tm, 0.5)) == 50
    assert int(count_overlap(sp, sm, tp + 100.0, tm, 0.5)) == 0


def test_voxel_downsample_centroids():
    # two clusters inside separate cells + an out-of-grid point
    pts = np.array(
        [[0.1, 0.1], [0.2, 0.2], [0.3, 0.1], [5.1, 5.2], [5.3, 5.1], [999, 999]],
        np.float32,
    )
    p, m = padded(pts, 8)
    spec = VoxelGridSpec(x0=-10.0, y0=-10.0, resolution=1.0, nx=20, ny=20)
    out, mask = voxel_downsample(p, m, spec, max_out=4)
    out, mask = np.asarray(out), np.asarray(mask)
    assert mask.sum() == 2
    got = sorted(out[mask].tolist())
    np.testing.assert_allclose(got[0], [0.2, 4.0 / 30], atol=1e-5)
    np.testing.assert_allclose(got[1], pts[3:5].mean(0), atol=1e-5)


def test_voxel_downsample_spacing():
    pts = rng.uniform(-8, 8, size=(300, 2)).astype(np.float32)
    p, m = padded(pts, 512)
    spec = VoxelGridSpec(x0=-10.0, y0=-10.0, resolution=0.5, nx=40, ny=40)
    out, mask = voxel_downsample(p, m, spec, max_out=256)
    out = np.asarray(out)[np.asarray(mask)]
    # each input point must have an output representative within a cell diagonal
    for q in pts:
        d = np.linalg.norm(out - q, axis=1).min()
        assert d <= 0.5 * np.sqrt(2) + 1e-5


def test_voxel_downsample_with_keys():
    pts = np.array([[0.1, 0.1], [0.15, 0.12], [3.0, 3.0]], np.float32)
    keys = jnp.asarray(np.array([4, 7, 9], np.int32))
    p, m = padded(pts, 4)
    keys = jnp.concatenate([keys, jnp.zeros(1, jnp.int32)])
    spec = VoxelGridSpec(x0=0.0, y0=0.0, resolution=1.0, nx=8, ny=8)
    out, okeys, mask = voxel_downsample_with_keys(p, m, keys, spec, max_out=4)
    mask = np.asarray(mask)
    assert mask.sum() == 2
    kept = sorted(np.asarray(okeys)[mask].tolist())
    assert kept == [4, 9]  # first contributing point's key wins


def test_remove_outlier():
    cluster = rng.normal(scale=0.2, size=(30, 2)).astype(np.float32)
    lone = np.array([[50.0, 50.0]], np.float32)
    p, m = padded(np.concatenate([cluster, lone]), 64)
    new_mask = np.asarray(remove_outlier(p, m, radius=1.0, min_points=5))
    assert new_mask[:30].all()
    assert not new_mask[30]
    assert not new_mask[31:].any()


def test_density_filter():
    dense = rng.normal(scale=0.1, size=(40, 2)).astype(np.float32)
    sparse = rng.uniform(20, 100, size=(5, 2)).astype(np.float32)
    p, m = padded(np.concatenate([dense, sparse]), 64)
    new_mask = np.asarray(density_filter(p, m, knn=5, min_density=1.0, max_density=1e9))
    assert new_mask[:40].all()
    assert not new_mask[40:45].any()
