"""Component profiling with the reference's span names.

The reference instruments exactly four expensive blocks with ``CodeTimer``
(SURVEY.md §5.1; `slam.py:668,744,926,1026`):

    "SLAM - sequential scan matching - sampling"
    "SLAM - sequential scan matching - ICP"
    "SLAM - nonsequential scan matching - sampling"
    "SLAM - nonsequential scan matching - ICP"

In the fused TPU scan those blocks are inlined into one program and cannot
be timed in place; this module times the same four computations standalone
(with synthetic workloads at the configured capacities) so the numbers stay
comparable with the reference's logs. Each is device-synced.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..cloud import icp, icp_multistart
from ..slam.scan_matching import global_initialize, sobol_unit_samples
from .timing import CodeTimer


def profile_slam_components(dims, params, repeats: int = 3):
    """Time the four reference spans at the configured capacities.

    Returns {span_name: seconds} (median of ``repeats`` warm runs).
    """
    rng = np.random.default_rng(0)
    N, M = dims.max_points, dims.target_capacity
    src = jnp.asarray(rng.uniform(0, 20, (N, 2)), jnp.float32)
    smask = jnp.ones((N,), bool)
    tgt = jnp.asarray(rng.uniform(0, 20, (M, 2)), jnp.float32)
    tmask = jnp.ones((M,), bool)
    zero = jnp.zeros(3, jnp.float32)

    ssm_sob = jnp.asarray(sobol_unit_samples(dims.ssm_sobol))
    nssm_sob = jnp.asarray(sobol_unit_samples(dims.nssm_sobol))
    src_big = jnp.asarray(rng.uniform(0, 20, (M, 2)), jnp.float32)
    sbig_mask = jnp.ones((M,), bool)

    def ssm_sampling():
        return global_initialize(
            src, smask, tgt, tmask, zero, zero,
            bounds=5.0 * params.odom_sigmas, unit_samples=ssm_sob,
            point_noise=params.point_noise,
            num_guesses=max(dims.ssm_cov_samples, 1),
        ).best_delta

    def ssm_icp():
        return icp(src, smask, tgt, tmask, zero, dims.icp).pose

    def nssm_sampling():
        return global_initialize(
            src_big, sbig_mask, tgt, tmask, zero, zero,
            bounds=jnp.asarray([2.0, 2.0, 0.5], jnp.float32),
            unit_samples=nssm_sob, point_noise=params.point_noise,
            num_guesses=max(dims.nssm_cov_samples, 1),
        ).best_delta

    guesses = jnp.asarray(
        rng.normal(scale=0.2, size=(max(dims.nssm_cov_samples, 1), 3)),
        jnp.float32,
    )
    gmask = jnp.ones((guesses.shape[0],), bool)

    def nssm_icp():
        return icp_multistart(
            src_big, sbig_mask, tgt, tmask, guesses, gmask, dims.icp
        ).pose

    spans = {
        "SLAM - sequential scan matching - sampling": jax.jit(ssm_sampling),
        "SLAM - sequential scan matching - ICP": jax.jit(ssm_icp),
        "SLAM - nonsequential scan matching - sampling": jax.jit(nssm_sampling),
        "SLAM - nonsequential scan matching - ICP": jax.jit(nssm_icp),
    }
    out = {}
    for name, fn in spans.items():
        jax.block_until_ready(fn())  # compile
        times = []
        for _ in range(repeats):
            with CodeTimer(name, silent=True, sync=None) as t:
                jax.block_until_ready(fn())
            times.append(t.took)
        out[name] = float(np.median(times))
    return out
