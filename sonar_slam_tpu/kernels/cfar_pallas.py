"""Fused Pallas TPU kernel for the sum-based CFAR variants (CA/SOCA/GOCA).

The XLA version in ``cfar.py`` materializes a prefix-sum tensor in HBM and
performs four gathers; this kernel keeps each (R, 128-beam) tile resident in
VMEM and forms the leading/lagging training sums with ``2 * train_hs``
unrolled sublane rolls + adds — pure VPU work with a single HBM read of the
image and a single write of (mask, threshold). The detection compare and the
downstream intensity gate (``img > threshold`` from feature.yaml) are fused
into the same kernel, so the whole front-end detector is one memory pass.

Grid: (num_frames, num_beam_tiles); each program handles one (R, 128) tile of
one frame. Row-border semantics identical to cfar.py / cfar.cpp (rows within
train_hs + guard_hs of either edge never detect). OS-CFAR is fused too
(``_cfar_os_kernel``): the windowed rank statistic is found by a binary
search over the intensity range (counting training cells <= mid with the
same sublane rolls) — exact for integer-valued images, i.e. the decoded
uint8 sonar intensities this pipeline feeds it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _cfar_kernel(img_ref, det_ref, thr_ref, *, train_hs, guard_hs, tau,
                 mode, intensity_threshold, rows):
    x = img_ref[0]  # (R_pad, 128) f32 (leading frame axis is a unit block)
    lead = jnp.zeros_like(x)
    lag = jnp.zeros_like(x)
    n_rows = x.shape[0]
    for j in range(guard_hs + 1, guard_hs + train_hs + 1):
        # training cell at row r - j (leading) / r + j (lagging); rolls wrap,
        # but wrapped rows only affect the border band that is masked below.
        # pltpu.roll requires non-negative shifts: roll(-j) == roll(n - j).
        lead = lead + pltpu.roll(x, j, axis=0)
        lag = lag + pltpu.roll(x, n_rows - j, axis=0)
    if mode == "CA":
        stat = (lead + lag) / (2.0 * train_hs)
    elif mode == "SOCA":
        stat = jnp.minimum(lead, lag) / train_hs
    else:  # GOCA
        stat = jnp.maximum(lead, lag) / train_hs
    thr = tau * stat

    hw = train_hs + guard_hs
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = (row_ids >= hw) & (row_ids < rows - hw)

    det = (x > thr) & valid
    if intensity_threshold is not None:
        det = det & (x > intensity_threshold)
    det_ref[0] = det.astype(jnp.uint8)
    thr_ref[0] = jnp.where(valid, thr, 0.0)


def _cfar_os_kernel(img_ref, det_ref, thr_ref, *, train_hs, guard_hs, k, tau,
                    intensity_threshold, rows, float_refine_steps):
    """OS-CFAR: per-pixel k-th smallest (0-indexed) of the training window.

    Instead of materializing and sorting the (R, 128, 2*train_hs) window
    tensor, the rank statistic is found by binary search over the [0, 256)
    intensity range: each step counts training cells <= mid with
    2*train_hs sublane rolls. Phase 1 (8 integer-floor steps) is EXACT for
    integer-valued images (decoded uint8 sonar intensities) and brackets the
    k-th value within one level otherwise; phase 2
    (``float_refine_steps`` continuous bisections) narrows float inputs to
    256/2^(8+steps) — fp-level agreement with a true windowed sort, closing
    the one-level float divergence flagged in round 1. Pure VPU work, one
    image read.
    """
    x = img_ref[0]
    n_rows = x.shape[0]

    def window_count_leq(v):
        cnt = jnp.zeros_like(x)
        for j in range(guard_hs + 1, guard_hs + train_hs + 1):
            cnt = cnt + (pltpu.roll(x, j, axis=0) <= v).astype(jnp.float32)
            cnt = cnt + (pltpu.roll(x, n_rows - j, axis=0) <= v).astype(
                jnp.float32
            )
        return cnt

    lo = jnp.full_like(x, -1.0)
    hi = jnp.full_like(x, 255.0)
    for _ in range(8):
        mid = jnp.floor(0.5 * (lo + hi))
        ge = window_count_leq(mid) >= (k + 1)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid)
    # continuous refinement inside the bracketed unit interval: a no-op for
    # integer images (hi already equals the k-th value; mids below it never
    # reach count k+1), convergent for float images
    for _ in range(float_refine_steps):
        mid = 0.5 * (lo + hi)
        ge = window_count_leq(mid) >= (k + 1)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid)
    kth = hi
    thr = tau * kth

    hw = train_hs + guard_hs
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = (row_ids >= hw) & (row_ids < rows - hw)
    det = (x > thr) & valid
    if intensity_threshold is not None:
        det = det & (x > intensity_threshold)
    det_ref[0] = det.astype(jnp.uint8)
    thr_ref[0] = jnp.where(valid, thr, 0.0)


@functools.partial(
    jax.jit, static_argnames=("train_hs", "guard_hs", "tau", "mode",
                              "intensity_threshold", "rank",
                              "os_float_refine_steps", "edge"),
)
def cfar_pallas_batch(
    imgs: jax.Array,  # (B, R, C) float32 polar frames
    train_hs: int,
    guard_hs: int,
    tau: float,
    mode: str = "SOCA",
    intensity_threshold: float | None = None,
    rank: int = 0,
    os_float_refine_steps: int = 14,
    edge: str = "strict",
):
    """Batched fused CFAR: returns (detections (B,R,C) bool, thresholds f32).

    ``intensity_threshold`` fuses the reference's ``peaks &= img > threshold``
    gate (`feature_extraction.py:223-224`) into the kernel. ``mode`` "OS"
    uses ``rank`` (0-indexed k, cfar.cpp:91-92 semantics) and assumes
    integer-valued intensities (see _cfar_os_kernel). ``edge="extend"``
    edge-replicate pads the rows by the half-window before the SAME kernel
    runs and crops after, so the whole swath can detect (matches
    cfar.py::cfar_*2 extend semantics; the strict border blinding is
    measured in docs/ACCURACY.md round 5).
    """
    B, R, C = imgs.shape
    imgs = imgs.astype(jnp.float32)
    hw_edge = 0
    if edge == "extend":
        hw_edge = train_hs + guard_hs
        imgs = jnp.pad(imgs, ((0, 0), (hw_edge, hw_edge), (0, 0)),
                       mode="edge")
        R = R + 2 * hw_edge
    elif edge != "strict":
        raise ValueError(f"unknown CFAR edge mode {edge!r}")
    r_pad = (8 - R % 8) % 8
    c_pad = (_LANE - C % _LANE) % _LANE
    x = jnp.pad(imgs, ((0, 0), (0, r_pad), (0, c_pad)))
    Rp, Cp = R + r_pad, C + c_pad

    if mode == "OS":
        kernel = functools.partial(
            _cfar_os_kernel,
            train_hs=train_hs,
            guard_hs=guard_hs,
            k=rank,
            tau=tau,
            intensity_threshold=intensity_threshold,
            rows=R,
            float_refine_steps=os_float_refine_steps,
        )
    else:
        kernel = functools.partial(
            _cfar_kernel,
            train_hs=train_hs,
            guard_hs=guard_hs,
            tau=tau,
            mode=mode,
            intensity_threshold=intensity_threshold,
            rows=R,
        )
    det, thr = pl.pallas_call(
        kernel,
        grid=(B, Cp // _LANE),
        in_specs=[
            pl.BlockSpec((1, Rp, _LANE), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Rp, _LANE), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, _LANE), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Rp, Cp), jnp.uint8),
            jax.ShapeDtypeStruct((B, Rp, Cp), jnp.float32),
        ),
    )(x)
    lo = hw_edge
    hi = R - hw_edge
    return det[:, lo:hi, :C].astype(bool), thr[:, lo:hi, :C]
