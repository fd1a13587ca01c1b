"""Pairwise Consistent Measurement (PCM) loop-closure vetting.

Rebuild of `/root/reference/bruce_slam/src/bruce_slam/slam.py:1243-1331`
(`verify_pcm`/`find_cliques`): candidate loop closures enter a sliding queue;
a pair of loops (i->l) and (j->k) is consistent when the pose-graph cycle
      pjk2 = pj⁻¹ ∘ (pi ∘ pil ∘ plk)
agrees with the measured pjk1 under the loop's covariance — Mahalanobis
distance below chi2.ppf(0.99, 3) = 11.34. Accepted loops are the maximum
clique of the consistency graph, if it reaches ``min_pcm``.

The reference queue holds <= 5 entries (`slam.yaml` pcm_queue_size), so
instead of Bron–Kerbosch we enumerate all 2^Q subsets entirely inside jit —
a (2^Q, Q) boolean table against the (Q, Q) consistency matrix. For host-side
use with larger queues, `max_clique_host` implements the classic recursive
search.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se2_between, se2_compose, se2_logmap

CHI2_99_3DOF = 11.34  # chi2.ppf(0.99, 3), as in slam.py:1270-1271


def pairwise_consistency_matrix(
    source_poses: jax.Array,  # (Q, 3) current pose of each loop's source key
    target_poses: jax.Array,  # (Q, 3) current pose of each loop's target key
    transforms: jax.Array,  # (Q, 3) measured target->source transforms
    covs: jax.Array,  # (Q, 3, 3) loop covariances
    valid: jax.Array,  # (Q,) queue-slot validity
    chi2_gate: float = CHI2_99_3DOF,
) -> jax.Array:
    """(Q, Q) bool: entry [a, b] true iff loops a and b are pairwise consistent."""

    def consistency(a, b):
        pi = target_poses[a]
        pj = target_poses[b]
        pil = transforms[a]
        plk = se2_between(source_poses[a], source_poses[b])
        pjk1 = transforms[b]
        pjk2 = se2_between(pj, se2_compose(se2_compose(pi, pil), plk))
        err = se2_logmap(se2_between(pjk1, pjk2))
        hp = jax.lax.Precision.HIGHEST
        md = jnp.matmul(err, jnp.matmul(jnp.linalg.inv(covs[b]), err,
                                        precision=hp), precision=hp)
        return md < chi2_gate

    Q = source_poses.shape[0]
    idx = jnp.arange(Q)
    mat = jax.vmap(lambda a: jax.vmap(lambda b: consistency(a, b))(idx))(idx)
    mat = mat & valid[:, None] & valid[None, :]
    return mat & ~jnp.eye(Q, dtype=bool)


def _subset_table(q: int) -> np.ndarray:
    """(2^q, q) membership table, a static constant folded into the program."""
    return np.array(
        [[(s >> b) & 1 for b in range(q)] for s in range(2**q)], dtype=bool
    )


@functools.partial(jax.jit, static_argnums=(2,))
def max_clique_mask(consistency: jax.Array, valid: jax.Array, min_size: int):
    """Maximum clique of the consistency graph, by exhaustive subset scan.

    Returns (member_mask (Q,), size int32); mask is all-False when the best
    clique is smaller than ``min_size`` (reference `slam.py:1283-1287`).
    Ties resolve to the lowest subset index — deterministic.
    """
    Q = consistency.shape[0]
    subsets = jnp.asarray(_subset_table(Q))  # (S, Q)
    # a subset is a clique iff every internal pair is consistent and all valid
    pair_ok = consistency | ~(
        subsets[:, :, None] & subsets[:, None, :]
    ) | jnp.eye(Q, dtype=bool)[None]
    is_clique = pair_ok.all(axis=(1, 2)) & (subsets <= valid[None, :]).all(axis=1)
    sizes = subsets.sum(axis=1)
    score = jnp.where(is_clique, sizes, -1)
    best = jnp.argmax(score)
    best_size = sizes[best]
    ok = (score[best] >= 0) & (best_size >= min_size)
    return jnp.where(ok, subsets[best], False), jnp.where(ok, best_size, 0)


def pcm_select(
    source_poses,
    target_poses,
    transforms,
    covs,
    valid,
    min_pcm: int,
    chi2_gate: float = CHI2_99_3DOF,
):
    """End-to-end PCM: consistency matrix + max clique -> accepted-loop mask.

    Jit-friendly equivalent of ``SLAM.verify_pcm`` (`slam.py:1243-1287`).
    """
    mat = pairwise_consistency_matrix(
        source_poses, target_poses, transforms, covs, valid, chi2_gate
    )
    return max_clique_mask(mat, valid, min_pcm)


def max_clique_host(adjacency: dict[int, set[int]]) -> list[int]:
    """Host-side maximal-clique search for arbitrary queue sizes (API parity
    with ``SLAM.find_cliques``, `slam.py:1289-1331`). Returns the largest
    clique's vertex list (empty if graph empty)."""
    best: list[int] = []
    nodes = sorted(adjacency)

    def expand(clique, candidates):
        nonlocal best
        if not candidates:
            if len(clique) > len(best):
                best = list(clique)
            return
        for v in list(candidates):
            expand(clique + [v], candidates & adjacency[v])
            candidates = candidates - {v}
            if len(clique) + len(candidates) <= len(best):
                return

    expand([], set(nodes))
    return best
