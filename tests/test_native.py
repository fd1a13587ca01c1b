"""Native C++ runtime vs NumPy/JAX reference implementations."""

import sys
import os

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"))
import runtime as native  # noqa: E402

from sonar_slam_tpu.io.dataset import _nearest_np, _last_at_or_before_np
from sonar_slam_tpu.kernels import cfar_soca2, cfar_ca2, cfar_goca2, cfar_os2
from sonar_slam_tpu.cloud import VoxelGridSpec, voxel_downsample

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)

rng = np.random.default_rng(21)


def test_align_nearest_matches_numpy():
    ref = np.sort(rng.uniform(0, 100, 500))
    q = np.sort(rng.uniform(-5, 105, 300))
    ni, nd = native.align_nearest(ref, q)
    pi, pd = _nearest_np(ref, q)
    np.testing.assert_array_equal(ni, pi)
    np.testing.assert_allclose(nd, pd, atol=1e-12)


def test_align_last_before_matches_numpy():
    ref = np.sort(rng.uniform(0, 100, 200))
    q = np.sort(rng.uniform(-5, 105, 300))
    np.testing.assert_array_equal(
        native.align_last_before(ref, q), _last_at_or_before_np(ref, q)
    )


def test_gamma_decompress():
    img = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
    out = native.gamma_decompress(img, gamma=127.0)
    ref = np.clip(np.power(img / 255.0, 255.0 / 127.0) * 255.0, 0, 255)
    np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.parametrize("mode", ["CA", "SOCA", "GOCA"])
def test_native_cfar_matches_tpu_kernels(mode):
    img = rng.exponential(scale=20.0, size=(128, 16)).astype(np.float32)
    img[40, 3] += 500
    t, g, tau = 10, 2, 3.0
    det_native = native.cfar_detect(img, t, g, tau, mode)
    fn = {"CA": cfar_ca2, "SOCA": cfar_soca2, "GOCA": cfar_goca2}[mode]
    det_jax, _ = fn(jnp.asarray(img), t, g, tau)
    np.testing.assert_array_equal(det_native, np.asarray(det_jax))


def test_native_os_cfar_matches_tpu_kernel():
    img = rng.exponential(scale=20.0, size=(96, 12)).astype(np.float32)
    img[50, 5] += 500
    t, g, k, tau = 8, 2, 5, 2.5
    det_native = native.cfar_detect(img, t, g, tau, "OS", rank=k)
    det_jax, _ = cfar_os2(jnp.asarray(img), t, g, k, tau)
    np.testing.assert_array_equal(det_native, np.asarray(det_jax))


def test_native_voxel_matches_jax():
    pts = rng.uniform(-8, 8, size=(500, 2)).astype(np.float32)
    spec = VoxelGridSpec(x0=-10.0, y0=-10.0, resolution=0.5, nx=40, ny=40)
    out_native = native.voxel_downsample(
        pts, spec.resolution, spec.x0, spec.y0, spec.nx, spec.ny, 512
    )
    p = jnp.asarray(np.concatenate([pts, np.zeros((12, 2), np.float32)]))
    m = jnp.asarray(np.r_[np.ones(500, bool), np.zeros(12, bool)])
    out_jax, mask = voxel_downsample(p, m, spec, 512)
    out_jax = np.asarray(out_jax)[np.asarray(mask)]
    # same cells, same centroids (order may differ) -> compare sorted sets
    a = np.array(sorted(map(tuple, np.round(out_native, 4))))
    b = np.array(sorted(map(tuple, np.round(out_jax, 4))))
    np.testing.assert_allclose(a, b, atol=1e-3)
