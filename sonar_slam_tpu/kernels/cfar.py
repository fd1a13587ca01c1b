"""CFAR detectors over polar sonar images, as pure JAX ops.

TPU-native replacement of the reference's native detector
(`/root/reference/bruce_slam/src/bruce_slam/cpp/cfar.cpp:10-204`). Semantics
are bit-matched to the reference:

* The sliding window runs along the **range axis (rows), per bearing column**.
* ``train_hs`` / ``guard_hs`` are half-window sizes; the training cells for a
  row ``r`` are rows ``i`` with ``guard_hs < |i - r| <= guard_hs + train_hs``.
* ``edge="strict"`` (the reference semantics): rows closer than
  ``train_hs + guard_hs`` to either border are never detected (and their
  threshold-map entries are 0). This silently blinds the detector to the
  outer ``(train_hs + guard_hs) * range_resolution`` meters of every ping —
  measured on the simulator: ALL returns beyond ~88% of max range are
  dropped, capping map recall at 0.44-0.65 (docs/ACCURACY.md round 5).
* ``edge="extend"`` (production default via ``FeatureConfig.cfar_edge``):
  the image is edge-replicate padded by the half-window before the SAME
  kernel runs, so every real row has a full training window (out-of-image
  training cells assume border-valued noise) and the whole swath can
  detect. A deliberate divergence from `cfar.cpp` — documented, tested.
* CA compares against ``tau * (leading + lagging) / (2 * train_hs)``;
  SOCA/GOCA against ``tau * min/max(leading, lagging) / train_hs``;
  OS against ``tau * kth_smallest(train cells)`` (0-indexed rank ``k``).

Instead of the reference's per-pixel C++ loops, windowed sums are computed with
prefix sums (two gathers + a subtract per window) and the OS rank statistic
with a vectorized sort over the stacked window — both map onto the TPU VPU and
batch over frames with ``vmap``. See ``cfar_pallas.py`` for the fused Pallas
kernel used on the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cfar_factors import (
    threshold_factor_ca,
    threshold_factor_goca,
    threshold_factor_os,
    threshold_factor_soca,
)


def _leading_lagging_sums(img: jax.Array, train_hs: int, guard_hs: int):
    """Per-pixel leading/lagging training sums along the row (range) axis.

    img: [R, C] float. Returns (leading, lagging), each [R, C].
    leading[r] = sum(img[r - g - t : r - g]); lagging[r] = sum(img[r+g+1 : r+g+t+1]).
    Border rows contain garbage — callers mask them via the valid-row window.
    """
    R = img.shape[0]
    g, t = guard_hs, train_hs
    prefix = jnp.concatenate(
        [jnp.zeros((1,) + img.shape[1:], img.dtype), jnp.cumsum(img, axis=0)],
        axis=0,
    )  # prefix[i] = sum img[:i]
    rows = jnp.arange(R)
    lead_hi = jnp.clip(rows - g, 0, R)
    lead_lo = jnp.clip(rows - g - t, 0, R)
    lag_hi = jnp.clip(rows + g + t + 1, 0, R)
    lag_lo = jnp.clip(rows + g + 1, 0, R)
    leading = prefix[lead_hi] - prefix[lead_lo]
    lagging = prefix[lag_hi] - prefix[lag_lo]
    return leading, lagging


def _valid_rows(R: int, train_hs: int, guard_hs: int) -> jax.Array:
    rows = jnp.arange(R)
    hw = train_hs + guard_hs
    return (rows >= hw) & (rows < R - hw)


def _finish(img, threshold, valid):
    valid = valid[:, None]
    det = (img > threshold) & valid
    thr = jnp.where(valid, threshold, 0.0)
    return det, thr


def _edge_extend(fn):
    """Run a strict-edge CFAR on an edge-replicate padded image and crop.

    Every real row then has a full training window (out-of-image cells
    assume border-valued noise), so the detector covers the whole swath.
    Works for every variant because the kernels themselves are untouched.
    """

    def run(img, train_hs, guard_hs, *args):
        hw = train_hs + guard_hs
        padded = jnp.pad(img, ((hw, hw), (0, 0)), mode="edge")
        det, thr = fn(padded, train_hs, guard_hs, *args)
        return det[hw:-hw], thr[hw:-hw]

    return run


def _dispatch_edge(strict_fn, edge):
    if edge == "strict":
        return strict_fn
    if edge == "extend":
        return _edge_extend(strict_fn)
    raise ValueError(f"unknown CFAR edge mode {edge!r}")


@functools.partial(jax.jit, static_argnums=(1, 2, 4))
def cfar_ca2(img: jax.Array, train_hs: int, guard_hs: int, tau: float,
             edge: str = "strict"):
    """Cell-averaging CFAR; returns (detections[bool], threshold_map[float])."""

    def strict(img, train_hs, guard_hs, tau):
        img = img.astype(jnp.float32)
        leading, lagging = _leading_lagging_sums(img, train_hs, guard_hs)
        threshold = tau * (leading + lagging) / (2.0 * train_hs)
        return _finish(
            img, threshold, _valid_rows(img.shape[0], train_hs, guard_hs))

    return _dispatch_edge(strict, edge)(img, train_hs, guard_hs, tau)


@functools.partial(jax.jit, static_argnums=(1, 2, 4))
def cfar_soca2(img: jax.Array, train_hs: int, guard_hs: int, tau: float,
               edge: str = "strict"):
    """Smallest-of cell-averaging CFAR."""

    def strict(img, train_hs, guard_hs, tau):
        img = img.astype(jnp.float32)
        leading, lagging = _leading_lagging_sums(img, train_hs, guard_hs)
        threshold = tau * jnp.minimum(leading, lagging) / train_hs
        return _finish(
            img, threshold, _valid_rows(img.shape[0], train_hs, guard_hs))

    return _dispatch_edge(strict, edge)(img, train_hs, guard_hs, tau)


@functools.partial(jax.jit, static_argnums=(1, 2, 4))
def cfar_goca2(img: jax.Array, train_hs: int, guard_hs: int, tau: float,
               edge: str = "strict"):
    """Greatest-of cell-averaging CFAR."""

    def strict(img, train_hs, guard_hs, tau):
        img = img.astype(jnp.float32)
        leading, lagging = _leading_lagging_sums(img, train_hs, guard_hs)
        threshold = tau * jnp.maximum(leading, lagging) / train_hs
        return _finish(
            img, threshold, _valid_rows(img.shape[0], train_hs, guard_hs))

    return _dispatch_edge(strict, edge)(img, train_hs, guard_hs, tau)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 5))
def cfar_os2(img: jax.Array, train_hs: int, guard_hs: int, k: int, tau: float,
             edge: str = "strict"):
    """Order-statistic CFAR: threshold from the k-th smallest training cell.

    Builds the [R, C, 2*train_hs] training-window tensor from static shifted
    slices of a border-padded image, then takes the rank statistic with a
    vectorized sort (the window is small — <= ~40 — so a full sort on the VPU
    beats any per-pixel selection network).
    """

    def strict(img, train_hs, guard_hs, k, tau):
        img = img.astype(jnp.float32)
        R = img.shape[0]
        g, t = guard_hs, train_hs
        hw = g + t
        padded = jnp.pad(img, ((hw, hw), (0, 0)))
        offsets = [o for o in range(-hw, hw + 1) if abs(o) > g]
        windows = jnp.stack(
            [padded[hw + o : hw + o + R] for o in offsets], axis=-1)
        kth = jnp.sort(windows, axis=-1)[..., k]
        threshold = tau * kth
        return _finish(img, threshold, _valid_rows(R, t, g))

    return _dispatch_edge(strict, edge)(img, train_hs, guard_hs, k, tau)


def cfar_ca(img, train_hs, guard_hs, tau, edge: str = "strict"):
    return cfar_ca2(img, train_hs, guard_hs, tau, edge)[0]


def cfar_soca(img, train_hs, guard_hs, tau, edge: str = "strict"):
    return cfar_soca2(img, train_hs, guard_hs, tau, edge)[0]


def cfar_goca(img, train_hs, guard_hs, tau, edge: str = "strict"):
    return cfar_goca2(img, train_hs, guard_hs, tau, edge)[0]


def cfar_os(img, train_hs, guard_hs, k, tau, edge: str = "strict"):
    return cfar_os2(img, train_hs, guard_hs, k, tau, edge)[0]


class CFAR:
    """Detector front end: threshold-factor math + variant dispatch.

    API-compatible rebuild of `bruce_slam.CFAR.CFAR`
    (`/root/reference/bruce_slam/src/bruce_slam/CFAR.py:9-133`): construct with
    (Ntc, Ngc, Pfa, rank) and call ``detect(img, alg)`` / ``detect2(img, alg)``
    with ``alg`` in {"CA", "SOCA", "GOCA", "OS"}. The returned detection mask
    is a JAX bool array; ``detect`` is jit-compiled and vmappable over frames.
    """

    def __init__(self, Ntc: int, Ngc: int, Pfa: float, rank: int | None = None,
                 edge: str = "strict"):
        if Ntc % 2 != 0 or Ngc % 2 != 0:
            raise ValueError("Ntc and Ngc must be even")
        self.Ntc, self.Ngc, self.Pfa = Ntc, Ngc, Pfa
        self.rank = int(Ntc / 2) if rank is None else int(rank)
        if not 0 <= self.rank < Ntc:
            raise ValueError("rank must be in [0, Ntc)")
        self.edge = edge

        self.threshold_factor_CA = threshold_factor_ca(Ntc, Pfa)
        self.threshold_factor_SOCA = threshold_factor_soca(Ntc, Pfa)
        self.threshold_factor_GOCA = threshold_factor_goca(Ntc, Pfa)
        self.threshold_factor_OS = threshold_factor_os(Ntc, self.rank, Pfa)

        t, g = Ntc // 2, Ngc // 2
        self._dispatch2 = {
            "CA": lambda img: cfar_ca2(
                img, t, g, self.threshold_factor_CA, edge),
            "SOCA": lambda img: cfar_soca2(
                img, t, g, self.threshold_factor_SOCA, edge),
            "GOCA": lambda img: cfar_goca2(
                img, t, g, self.threshold_factor_GOCA, edge),
            "OS": lambda img: cfar_os2(
                img, t, g, self.rank, self.threshold_factor_OS, edge
            ),
        }

    def detect(self, img, alg: str = "CA"):
        """Detection mask for one polar frame [R, C]."""
        return self._dispatch2[alg](img)[0]

    def detect2(self, img, alg: str = "CA"):
        """(detection mask, threshold map) for one polar frame."""
        return self._dispatch2[alg](img)

    def __str__(self) -> str:
        return (
            "CFAR detector: Ntc={} Ngc={} Pfa={} rank={} | tau CA={:.3f} "
            "SOCA={:.3f} GOCA={:.3f} OS={:.3f}".format(
                self.Ntc, self.Ngc, self.Pfa, self.rank,
                self.threshold_factor_CA, self.threshold_factor_SOCA,
                self.threshold_factor_GOCA, self.threshold_factor_OS,
            )
        )
