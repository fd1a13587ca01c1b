"""CFAR kernels vs. independent brute-force NumPy references.

The brute-force implementations below follow the reference algorithm
description (per-column sliding window along the range axis, guard/train
half-windows — `/root/reference/bruce_slam/src/bruce_slam/cpp/cfar.cpp`) but
are written directly from that spec in NumPy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.kernels import (
    CFAR,
    cfar_ca2,
    cfar_soca2,
    cfar_goca2,
    cfar_os2,
    threshold_factor_ca,
    threshold_factor_soca,
    threshold_factor_goca,
    threshold_factor_os,
)

rng = np.random.default_rng(42)


def brute_force(img, t, g, tau, mode, k=0):
    R, C = img.shape
    det = np.zeros((R, C), bool)
    thr = np.zeros((R, C), np.float32)
    hw = t + g
    for c in range(C):
        for r in range(hw, R - hw):
            lead = img[r - g - t : r - g, c]
            lag = img[r + g + 1 : r + g + t + 1, c]
            if mode == "CA":
                stat = (lead.sum() + lag.sum()) / (2.0 * t)
            elif mode == "SOCA":
                stat = min(lead.sum(), lag.sum()) / t
            elif mode == "GOCA":
                stat = max(lead.sum(), lag.sum()) / t
            elif mode == "OS":
                train = np.sort(np.concatenate([lead, lag]))
                stat = train[k]
            thr[r, c] = tau * stat
            det[r, c] = img[r, c] > thr[r, c]
    return det, thr


@pytest.fixture(scope="module")
def img():
    base = rng.exponential(scale=20.0, size=(96, 24)).astype(np.float32)
    # plant a few bright targets
    for r, c in [(30, 5), (60, 12), (80, 20)]:
        base[r, c] += 600.0
    return base


@pytest.mark.parametrize(
    "mode,fn",
    [
        ("CA", lambda im, t, g, tau: cfar_ca2(im, t, g, tau)),
        ("SOCA", lambda im, t, g, tau: cfar_soca2(im, t, g, tau)),
        ("GOCA", lambda im, t, g, tau: cfar_goca2(im, t, g, tau)),
    ],
)
def test_cfar_matches_brute_force(img, mode, fn):
    t, g, tau = 10, 2, 3.7
    det, thr = fn(jnp.asarray(img), t, g, tau)
    det_ref, thr_ref = brute_force(img, t, g, tau, mode)
    np.testing.assert_array_equal(np.asarray(det), det_ref)
    np.testing.assert_allclose(np.asarray(thr), thr_ref, rtol=1e-5, atol=1e-3)


def test_os_cfar_matches_brute_force(img):
    t, g, k, tau = 10, 2, 7, 2.5
    det, thr = cfar_os2(jnp.asarray(img), t, g, k, tau)
    det_ref, thr_ref = brute_force(img, t, g, tau, "OS", k=k)
    np.testing.assert_array_equal(np.asarray(det), det_ref)
    np.testing.assert_allclose(np.asarray(thr), thr_ref, rtol=1e-5, atol=1e-3)


def test_border_rows_never_detect(img):
    t, g = 10, 2
    det, thr = cfar_ca2(jnp.asarray(img * 0 + 1e6), t, g, 0.0)
    hw = t + g
    assert not np.asarray(det)[:hw].any()
    assert not np.asarray(det)[-hw:].any()
    assert (np.asarray(thr)[:hw] == 0).all()


def test_threshold_factor_ca_closed_form():
    # Pfa = (1 + tau/N)^-N must hold exactly
    ntc, pfa = 40, 0.1
    tau = threshold_factor_ca(ntc, pfa)
    np.testing.assert_allclose((1 + tau / ntc) ** -ntc, pfa, rtol=1e-12)


@pytest.mark.parametrize("ntc,pfa", [(40, 0.1), (20, 1e-2), (16, 1e-3)])
def test_threshold_factors_monte_carlo(ntc, pfa):
    """The solved tau must reproduce Pfa on synthetic exponential noise."""
    n = 400_000
    cells = rng.exponential(size=(n, ntc))
    cut = rng.exponential(size=n)
    half = ntc // 2

    tau = threshold_factor_soca(ntc, pfa)
    stat = np.minimum(cells[:, :half].sum(1), cells[:, half:].sum(1)) / half
    rate = (cut > tau * stat).mean()
    np.testing.assert_allclose(rate, pfa, rtol=0.15)

    tau = threshold_factor_goca(ntc, pfa)
    stat = np.maximum(cells[:, :half].sum(1), cells[:, half:].sum(1)) / half
    rate = (cut > tau * stat).mean()
    np.testing.assert_allclose(rate, pfa, rtol=0.15)

    # OS formula is for the 1-indexed k-th smallest (the detector itself
    # deliberately reproduces the reference's 0-indexed off-by-one).
    k = int(0.75 * ntc)
    tau = threshold_factor_os(ntc, k, pfa)
    stat = np.sort(cells, axis=1)[:, k - 1]
    rate = (cut > tau * stat).mean()
    np.testing.assert_allclose(rate, pfa, rtol=0.15)


def test_cfar_class_dispatch(img):
    det = CFAR(20, 4, 0.1, rank=7)
    for alg in ["CA", "SOCA", "GOCA", "OS"]:
        mask, thr = det.detect2(jnp.asarray(img), alg)
        mask2 = det.detect(jnp.asarray(img), alg)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask2))
        assert mask.shape == img.shape
        assert np.asarray(mask).any(), alg  # planted targets must fire


def test_cfar_class_validation():
    with pytest.raises(ValueError):
        CFAR(41, 10, 0.1)
    with pytest.raises(ValueError):
        CFAR(40, 10, 0.1, rank=40)


# ---------------------------------------------------------------------------
# edge="extend" (production border policy; kernels/cfar.py docstring)


def _edge_brute_force(img, t, g, tau, mode, k=0):
    """Brute force on an edge-replicate padded image, cropped back."""
    hw = t + g
    padded = np.pad(img, ((hw, hw), (0, 0)), mode="edge")
    det, thr = brute_force(padded, t, g, tau, mode, k)
    return det[hw:-hw], thr[hw:-hw]


@pytest.mark.parametrize("mode", ["CA", "SOCA", "GOCA", "OS"])
def test_cfar_edge_extend_matches_brute_force(mode):
    img = rng.exponential(10.0, (64, 8)).astype(np.float32)
    img[3, 2] = 500.0    # target INSIDE the strict border band
    img[60, 5] = 500.0   # and near the far edge
    img[30, 1] = 500.0   # interior target
    t, g, k = 8, 2, 5
    tau = 2.0
    if mode == "CA":
        det, thr = cfar_ca2(jnp.asarray(img), t, g, tau, "extend")
    elif mode == "SOCA":
        det, thr = cfar_soca2(jnp.asarray(img), t, g, tau, "extend")
    elif mode == "GOCA":
        det, thr = cfar_goca2(jnp.asarray(img), t, g, tau, "extend")
    else:
        det, thr = cfar_os2(jnp.asarray(img), t, g, k, tau, "extend")
    bf_det, bf_thr = _edge_brute_force(img, t, g, tau, mode, k)
    np.testing.assert_array_equal(np.asarray(det), bf_det)
    np.testing.assert_allclose(np.asarray(thr), bf_thr, rtol=1e-5)
    # the border targets must now be detectable (strict blinds them)
    assert bool(det[3, 2]) and bool(det[60, 5]) and bool(det[30, 1])
    strict = cfar_soca2(jnp.asarray(img), t, g, tau, "strict")[0]
    assert not bool(strict[3, 2]) and not bool(strict[60, 5])


def test_cfar_edge_extend_interior_equals_strict():
    """Away from the border band the two policies are bit-identical."""
    img = rng.exponential(10.0, (96, 16)).astype(np.float32)
    img[rng.integers(20, 76, 12), rng.integers(0, 16, 12)] = 400.0
    t, g = 10, 2
    hw = t + g
    for fn, args in [(cfar_ca2, (2.1,)), (cfar_soca2, (1.8,)),
                     (cfar_goca2, (2.4,)), (cfar_os2, (7, 2.0))]:
        d_s, t_s = fn(jnp.asarray(img), t, g, *args, "strict")
        d_e, t_e = fn(jnp.asarray(img), t, g, *args, "extend")
        np.testing.assert_array_equal(
            np.asarray(d_s)[hw:-hw], np.asarray(d_e)[hw:-hw])
        # thresholds agree to fp: the padded prefix sum reassociates the
        # same training-cell additions
        np.testing.assert_allclose(
            np.asarray(t_s)[hw:-hw], np.asarray(t_e)[hw:-hw], rtol=1e-4)
