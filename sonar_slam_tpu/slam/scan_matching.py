"""Global scan-matching initialization + robust ICP covariance.

Rebuilds the reference's scipy.shgo-based global alignment
(`/root/reference/bruce_slam/src/bruce_slam/slam.py:461-570,668-716,926-973`)
and its MinCovDet multi-start covariance estimator (`slam.py:325-387`) as
batched TPU ops:

* The shgo Sobol sampler + dilated-grid overlap cost collapses into ONE
  batched evaluation: S deterministic Sobol pose samples, each scored by how
  many transformed source points fall within ``point_noise`` of any target
  point. The reference rasterizes the target cloud at noise/10 resolution and
  dilates by an ellipse of radius ``point_noise`` (`slam.py:506-526`) — the
  continuous distance test is the same predicate without quantization
  (documented divergence). Each sample is an (N, M) masked distance reduce,
  so all S samples are one (S*N, M) MXU matmul.
* The sample list is then sorted by cost and epsilon-deduplicated into
  multi-start ICP guesses, exactly as ``ICPResult.__init__``
  (`slam_objects.py:287-300`).
* ``estimate_pose_covariance`` replaces sklearn MinCovDet with deterministic
  C-step iterations (support fraction 0.8) over the batched ICP solutions,
  including the reference's rotation to the local frame and the
  determinant floor against the fixed ICP noise model (`slam.py:374-386`).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import (
    se2_between,
    se2_compose,
    se2_rotmat,
    se2_transform_points,
)
from ..cloud.knn import pairwise_sq_dists


def sobol_unit_samples(n: int, dim: int = 3, seed: int = 0) -> np.ndarray:
    """Deterministic Sobol points in [0, 1]^dim (host-side, config-time).

    The reference relies on scipy.shgo's Sobol sampling (`slam.py:692-701`);
    we precompute the same kind of low-discrepancy set once and fold it into
    the config as a constant.
    """
    from scipy.stats import qmc

    s = qmc.Sobol(d=dim, scramble=False, seed=seed)
    return s.random(n).astype(np.float32)


def match_count_costs(
    source_points: jax.Array,  # (N, 2) in source-local frame
    source_mask: jax.Array,
    target_points: jax.Array,  # (M, 2) in target-local frame
    target_mask: jax.Array,
    source_pose: jax.Array,  # (3,)
    target_pose: jax.Array,  # (3,)
    deltas: jax.Array,  # (S, 3) pose perturbations applied to source_pose
    point_noise: jax.Array,
):
    """Cost of every candidate delta: minus the overlap count.

    For each sample: sample_source_pose = source_pose ∘ delta;
    sample_transform = target_pose⁻¹ ∘ sample_source_pose; cost = -#{source
    points within point_noise of a target point} (`slam.py:536-568`).
    Returns (costs (S,), transforms (S, 3) target->sampled-source).
    """
    sample_source_pose = jax.vmap(lambda d: se2_compose(source_pose, d))(deltas)
    transforms = jax.vmap(lambda p: se2_between(target_pose, p))(sample_source_pose)
    S = transforms.shape[0]
    N = source_points.shape[0]

    # chunk the sample axis: the full (S*N, M) distance matrix can reach
    # gigabytes at NSSM sizes; 32-sample chunks keep the working set
    # ~134 MB at the largest config while halving the sequential chunk
    # chain vs 16 (the per-keyframe NSSM cost is serial-latency-bound)
    chunk = 32
    pad = (-S) % chunk
    tf_pad = jnp.concatenate([transforms, jnp.zeros((pad, 3), transforms.dtype)])

    def chunk_counts(tf_chunk):
        moved = jax.vmap(lambda t: se2_transform_points(source_points, t))(tf_chunk)
        d2 = pairwise_sq_dists(moved.reshape(chunk * N, 2), target_points)
        d2 = jnp.where(target_mask[None, :], d2, 1e30)
        near = (jnp.min(d2, axis=-1) <= point_noise**2).reshape(chunk, N)
        return jnp.sum(near & source_mask[None, :], axis=-1)

    counts = jax.lax.map(
        chunk_counts, tf_pad.reshape(-1, chunk, 3)
    ).reshape(-1)[:S]
    return -counts.astype(jnp.float32), transforms


class GlobalInitResult(NamedTuple):
    best_delta: jax.Array  # (3,) best perturbation of source_pose
    best_cost: jax.Array  # scalar (negative overlap count)
    guess_poses: jax.Array  # (G, 3) deduped sampled source poses, best first
    guess_mask: jax.Array  # (G,)

    def guesses_vs(self, target_pose: jax.Array) -> jax.Array:
        """ICP initial transforms relative to a target pose.

        The reference dedups transforms ``target.between(sample)``
        (`slam_objects.py:287-300`), but the pairwise distance used for the
        epsilon test is target-independent (between(t⁻¹a, t⁻¹b) = a⁻¹b), so
        we dedup sample poses once and can re-target the guesses after the
        NSSM overlap-based target re-selection (`slam.py:975-999`).
        """
        return jax.vmap(lambda p: se2_between(target_pose, p))(self.guess_poses)


def global_initialize(
    source_points,
    source_mask,
    target_points,
    target_mask,
    source_pose,
    target_pose,
    bounds: jax.Array,  # (3,) half-widths: search in ±bounds (5 sigma rule)
    unit_samples: jax.Array,  # (S, 3) Sobol points in [0,1]^3
    point_noise,
    num_guesses: int,
    dedup_eps: float = 0.01,
) -> GlobalInitResult:
    """Sobol global search + guess-list construction.

    Mirrors `initialize_sequential_scan_matching` / `..nonsequential..`
    sampling (`slam.py:668-716,926-973`): bounds are ±5 sigma boxes, the best
    sample seeds ICP, and the cost-sorted, eps-deduplicated sample transforms
    become the multi-start guesses (`slam_objects.py:287-300`).
    """
    deltas = (2.0 * unit_samples - 1.0) * bounds[None, :]
    # always include the zero delta (shgo's local phase would recover it)
    deltas = jnp.concatenate([jnp.zeros((1, 3), deltas.dtype), deltas], axis=0)
    costs, transforms = match_count_costs(
        source_points,
        source_mask,
        target_points,
        target_mask,
        source_pose,
        target_pose,
        deltas,
        point_noise,
    )
    order = jnp.argsort(costs)  # ascending cost = best first
    sample_poses = jax.vmap(lambda d: se2_compose(source_pose, d))(deltas)
    sorted_poses = sample_poses[order]
    best = order[0]

    # epsilon-dedup of the cost-sorted samples. The reference walks the list
    # sequentially, comparing against the LAST KEPT entry
    # (slam_objects.py:287-300); a literal port is a length-S sequential scan
    # (~30 ms/keyframe at NSSM sizes on TPU). We keep sample i iff no
    # better-ranked sample lies within eps — one causal (S, S) pairwise
    # test, fully parallel. This is a (very slightly) stricter dedup: it can
    # drop a sample the reference keeps when the nearby better sample was
    # itself dropped — immaterial for multi-start seeding, and strictly more
    # diverse guesses.
    S = sorted_poses.shape[0]
    rel = jax.vmap(
        lambda a: jax.vmap(lambda b: se2_between(a, b))(sorted_poses)
    )(sorted_poses)
    dist = jnp.linalg.norm(rel, axis=-1)
    causal_close = (dist < dedup_eps) & (
        jnp.arange(S)[:, None] < jnp.arange(S)[None, :]
    )
    keeps = ~jnp.any(causal_close, axis=0)
    total = jnp.sum(keeps.astype(jnp.int32))

    # compact the kept samples to the front, take first num_guesses
    kept_rank = jnp.cumsum(keeps.astype(jnp.int32)) - 1
    G = num_guesses
    # scatter kept samples into their rank slot; out-of-range writes drop
    slot = jnp.where(keeps, kept_rank, G)
    out = jnp.zeros((G, 3), jnp.float32).at[slot].set(sorted_poses, mode="drop")
    guess_mask = jnp.arange(G) < jnp.minimum(total, G)
    return GlobalInitResult(
        best_delta=deltas[best],
        best_cost=costs[best],
        guess_poses=out,
        guess_mask=guess_mask,
    )


def max_eig_2x2(m: jax.Array) -> jax.Array:
    """Largest eigenvalue of a symmetric 2x2, closed form.

    jnp.linalg.eigvalsh lowers to an enormous QDWH/Jacobi HLO program on TPU
    (minutes of compile time); for the 2x2 covariance blocks used by the
    5-sigma NSSM gates (`slam.py:885,929`) the quadratic formula suffices.
    """
    a, b, c = m[0, 0], m[0, 1], m[1, 1]
    h = 0.5 * (a + c)
    d = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    return h + d


def _logdet_psd_3x3(m: jax.Array) -> jax.Array:
    """log(det) of a (ridged) PSD 3x3 via Cholesky: 2*sum(log(diag(L))).

    Avoids eigvalsh (TPU compile blow-up) and both failure modes of a raw
    det(): fp32 sign flips on ill-conditioned matrices and catastrophic
    cancellation of the cofactor expansion for tiny determinants. Non-PD
    inputs (NaN diagonal) map to +inf so they lose the argmin.
    """
    L = jnp.linalg.cholesky(m)
    d = jnp.diagonal(L)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.clip(d, 1e-20, None)))
    return jnp.where(jnp.isnan(logdet), jnp.inf, logdet)


def estimate_pose_covariance(
    samples: jax.Array,  # (G, 3) successful ICP transforms
    sample_mask: jax.Array,  # (G,)
    support_fraction: float = 0.8,
    c_steps: int = 8,
    num_starts: int = 8,
):
    """Robust (FastMCD-style) mean + covariance of pose samples.

    Deterministic replacement for ``MinCovDet(support_fraction=0.8)``
    (`slam.py:365-371`). Like FastMCD: several elemental starts (strided
    4-sample subsets plus the full-sample start, deterministic rather than
    random), each refined by C-steps — re-estimate from the h = ceil(0.8 n)
    samples with the smallest Mahalanobis distance — and the start with the
    smallest h-subset covariance determinant wins. Multi-start is essential:
    a single C-step chain can be captured by a tight cluster of identical
    wrong ICP solutions (multiple guesses falling into the same wrong basin).
    All starts run as one vmap. Returns (mean (3,), cov (3,3), n_valid).
    No small-sample consistency factor is applied (documented divergence from
    sklearn; the covariance floor downstream dominates).
    """
    G = samples.shape[0]
    n = jnp.sum(sample_mask)
    h = jnp.ceil(support_fraction * n.astype(jnp.float32)).astype(jnp.int32)
    ridge = 1e-9 * jnp.eye(3)

    def mean_cov(w):
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mu = jnp.sum(samples * w[:, None], axis=0) / wsum
        d = (samples - mu) * w[:, None]
        cov = jnp.matmul(d.T, samples - mu,
                         precision=jax.lax.Precision.HIGHEST) / wsum
        return mu, cov

    def c_step(w, _):
        mu, cov = mean_cov(w)
        inv = jnp.linalg.inv(cov + ridge)
        md = jnp.einsum("gi,ij,gj->g", samples - mu, inv, samples - mu,
                        precision=jax.lax.Precision.HIGHEST)
        md = jnp.where(sample_mask, md, 1e30)
        thresh = jnp.sort(md)[jnp.clip(h - 1, 0, G - 1)]
        return (md <= thresh).astype(jnp.float32) * sample_mask, None

    def run_from(w0):
        w, _ = jax.lax.scan(c_step, w0, None, length=c_steps)
        mu, cov = mean_cov(w)
        # objective: clamped log-det — a raw fp32 det() of an ill-conditioned
        # covariance can round negative and hijack the argmin
        logdet = _logdet_psd_3x3(cov + ridge)
        # degenerate supports (duplicate cluster) are valid MCD minima only
        # when they cover h true samples; guard collapsed subsets
        return mu, cov, jnp.where(
            jnp.sum(w) >= h.astype(jnp.float32), logdet, 1e30
        )

    # elemental starts: strided 4-sample subsets over the valid entries
    valid_idx = jnp.argsort(~sample_mask)  # valid indices first, stable
    starts = []
    for s in range(num_starts):
        picks = valid_idx[(s + jnp.arange(4) * num_starts) % jnp.maximum(n, 1)]
        w = jnp.zeros((G,), jnp.float32).at[picks].set(1.0)
        starts.append(w * sample_mask.astype(jnp.float32))
    starts.append(sample_mask.astype(jnp.float32))
    mus, covs, dets = jax.vmap(run_from)(jnp.stack(starts))
    best = jnp.argmin(dets)
    return mus[best], covs[best], n


def localize_covariance(cov: jax.Array, mean_pose: jax.Array) -> jax.Array:
    """Unrotate a sample covariance into the local frame of the mean pose
    (`slam.py:377-380`)."""
    R = se2_rotmat(mean_pose[2])
    out = cov
    hp = jax.lax.Precision.HIGHEST
    out = out.at[:2, :].set(jnp.matmul(R.T, out[:2, :], precision=hp))
    out = out.at[:, :2].set(jnp.matmul(out[:, :2], R, precision=hp))
    return out


def apply_covariance_floor(cov: jax.Array, icp_odom_sigmas: jax.Array):
    """If det(cov) < det(diag(sigmas)^2) use the fixed model
    (`slam.py:382-386`). Returns (cov, used_floor)."""
    default = jnp.diag(jnp.asarray(icp_odom_sigmas) ** 2)
    small = jnp.linalg.det(cov) < jnp.linalg.det(default)
    return jnp.where(small, default, cov), small
