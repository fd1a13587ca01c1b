"""Pallas CFAR kernel vs the XLA reference kernels (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.kernels import cfar_ca2, cfar_soca2, cfar_goca2

rng = np.random.default_rng(33)


def run_pallas(imgs, t, g, tau, mode, thresh=None, rank=7):
    # interpret mode so the kernel runs under the CPU test platform
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        from sonar_slam_tpu.kernels.cfar_pallas import cfar_pallas_batch

        return cfar_pallas_batch(
            imgs, t, g, tau, mode, intensity_threshold=thresh, rank=rank
        )


@pytest.mark.parametrize("mode,fn", [
    ("CA", cfar_ca2), ("SOCA", cfar_soca2), ("GOCA", cfar_goca2),
])
def test_pallas_matches_xla(mode, fn):
    t, g, tau = 10, 2, 3.3
    imgs = rng.exponential(scale=20.0, size=(2, 96, 40)).astype(np.float32)
    imgs[0, 40, 7] += 700
    imgs[1, 60, 20] += 700
    det, thr = run_pallas(jnp.asarray(imgs), t, g, tau, mode)
    for b in range(2):
        det_ref, thr_ref = fn(jnp.asarray(imgs[b]), t, g, tau)
        np.testing.assert_array_equal(np.asarray(det[b]), np.asarray(det_ref))
        np.testing.assert_allclose(
            np.asarray(thr[b]), np.asarray(thr_ref), rtol=1e-5, atol=1e-3
        )


def test_pallas_fused_intensity_gate():
    t, g, tau = 8, 2, 3.0
    imgs = rng.exponential(scale=20.0, size=(1, 64, 16)).astype(np.float32)
    imgs[0, 30, 5] += 500
    det_gated, _ = run_pallas(jnp.asarray(imgs), t, g, tau, "SOCA", thresh=65.0)
    det_raw, _ = run_pallas(jnp.asarray(imgs), t, g, tau, "SOCA")
    ref = np.asarray(det_raw[0]) & (imgs[0] > 65.0)
    np.testing.assert_array_equal(np.asarray(det_gated[0]), ref)


def test_pallas_os_matches_xla_on_integer_images():
    from sonar_slam_tpu.kernels import cfar_os2

    t, g, k, tau = 10, 2, 7, 2.5
    # integer-valued intensities (decoded uint8), where OS binary search is exact
    imgs = np.floor(rng.exponential(scale=20.0, size=(2, 96, 40))).clip(0, 255)
    imgs = imgs.astype(np.float32)
    imgs[0, 40, 7] += 200
    det, thr = run_pallas(jnp.asarray(imgs), t, g, tau, "OS")
    for b in range(2):
        det_ref, thr_ref = cfar_os2(jnp.asarray(imgs[b]), t, g, k, tau)
        np.testing.assert_array_equal(np.asarray(det[b]), np.asarray(det_ref))
        np.testing.assert_allclose(
            np.asarray(thr[b]), np.asarray(thr_ref), rtol=1e-5, atol=1e-3
        )


def test_pallas_edge_extend_matches_xla():
    """edge="extend" agrees between the Pallas and XLA paths (and detects
    inside the strict border band)."""
    from unittest import mock
    from jax.experimental import pallas as pl

    imgs = rng.exponential(10.0, (2, 48, 130)).astype(np.float32)
    imgs[0, 2, 10] = 500.0   # inside the border band
    imgs[1, 45, 100] = 500.0
    t, g, tau = 6, 2, 1.9

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        from sonar_slam_tpu.kernels.cfar_pallas import cfar_pallas_batch

        det_p, thr_p = cfar_pallas_batch(imgs, t, g, tau, "SOCA",
                                         edge="extend")
    det_x = np.stack([
        np.asarray(cfar_soca2(jnp.asarray(im), t, g, tau, "extend")[0])
        for im in imgs
    ])
    np.testing.assert_array_equal(np.asarray(det_p), det_x)
    assert bool(det_p[0, 2, 10]) and bool(det_p[1, 45, 100])
