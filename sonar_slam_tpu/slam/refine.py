"""Post-convergence loop re-registration + proximity loop sweep.

The reference re-POSES its PCM queue entries after each ISAM2 update
(`/root/reference/bruce_slam/src/bruce_slam/slam.py:1237-1241`) but never
re-MEASURES a loop: every loop factor keeps the ICP transform measured
against whatever drifted pose estimates existed when the loop was found.
The round-2 error budget (docs/ACCURACY.md) measured that gap directly:
in-scan loop measurements were ~17 cm median (seed 0, full config) while the
same pairs re-registered in isolation against final-quality poses achieve
~4.6 cm. This module converts that measured headroom into ATE — a TPU-native
capability the fixed-capacity graph makes cheap (one vmapped ICP batch +
one dense GN solve per refinement sweep; no incremental-update bookkeeping
to invalidate, unlike ISAM2 where changing a factor's measurement would
force a Bayes-tree re-elimination).

Two mechanisms, iterated:

1. **Re-measurement** (``_remeasure``): every logged loop (i=target,
   j=source, factor slot recorded by the scan in ``SlamCarry.loops_slot``)
   is re-registered — windowed submaps aggregated with the CURRENT optimized
   poses, ICP seeded by the converged relative pose, then the in-scan
   two-stage single-frame consistency refinement — and the factor's
   ``f_z``/``f_sqrt_info`` are replaced in place (Censi covariance + the
   reference's covariance floor). A consistency gate keeps the old
   measurement when re-registration diverges.
2. **Proximity sweep** (``_sweep``): for every source keyframe, the nearest
   eligible (``>= nssm_min_st_sep`` older) target within ``prox_radius`` is
   registered single-frame from the converged relative pose; confident,
   consistent fits are inserted as NEW loop factors (and appended to the
   loop log so subsequent re-measurement sweeps cover them). This recovers
   the recall an intentionally sparse in-scan search cadence
   (``SlamParams.nssm_every``) gives up, and catches revisits the NSSM
   target-selection heuristic missed (reference search intent:
   `slam.py:839-1001`).

All of it is one jitted program over the scan's own carry pytree; gates are
traced (``RefineParams``) so tuning never recompiles.

**Multi-device**: both fan-outs — L loop re-registrations, K sweep
registrations — are embarrassingly parallel, so passing a
``jax.sharding.Mesh`` shards their lane axis over the mesh with
``shard_map`` (the carry is replicated; only the tiny per-lane results
gather back). This is the keyframe-axis scaling of SURVEY.md §5.7 wired
into the PRODUCTION pipeline (reference scale axis: `slam.py:870-899,
1227-1230`), not a side gallery: ``pipeline.replay(mesh=...)`` and
``scripts/sharded_replay.py`` run it end to end, equality-pinned against
the single-device path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..cloud import icp
from ..cloud.icp import censi_covariance
from ..geometry import se2_between
from ..graph.factor_graph import cov_to_sqrt_info, optimize
from .core import (
    SlamCarry,
    SlamDims,
    SlamParams,
    _aggregate_window,
    conf_weight,
)
from .scan_matching import apply_covariance_floor, localize_covariance


class RefineParams(NamedTuple):
    """Traced numeric gates for the refinement passes."""

    max_dt: jax.Array  # re-measurement consistency gate vs current guess (m)
    max_dr: jax.Array  # (rad)
    min_inliers: jax.Array  # int32: minimum ICP inlier correspondences
    sweep_max_dt: jax.Array  # sweep acceptance gate vs converged guess (m)
    sweep_max_dr: jax.Array  # (rad)
    prox_radius: jax.Array  # sweep pairing radius (m)
    # covariance floor for REFINED loop factors. The in-scan floor
    # (SlamParams.icp_odom_sigmas, reference slam.py:382-386) prices the
    # biased drift-seeded measurements the scan produces; post-convergence
    # re-registration is measured at 2-3 cm median (BENCH_r03), and keeping
    # the in-scan floor (20 cm full config) would leave those measurements
    # too weak to pull the graph. Cauchy-robustified (`robust`) so the
    # occasional bad re-registration cannot dominate at the tighter weight.
    floor_sigmas: jax.Array  # (3,)
    robust: jax.Array  # bool: Cauchy-robustify refined/swept loop factors
    # incremental re-measurement (dims.refine_incremental): a lane is
    # re-registered on iterations >= 1 only when the RELATIVE pose of its
    # endpoints changed by more than this since the lane's last registration
    # (rigid drifts of the whole graph leave the measurement invariant, so
    # relative motion — not absolute — is the right invalidation signal)
    move_gate_t: jax.Array  # (m)
    move_gate_r: jax.Array  # (rad)
    # separate covariance floor for the densified CHAIN factors: consecutive
    # ~90%-overlap registrations are the best-conditioned measurements in
    # the graph and can carry a tighter floor than re-measured loops
    chain_floor_sigmas: jax.Array  # (3,)
    # direct chain-ratio scale measurement (dims.refine_scale_from_chain):
    # only intervals with at least this much per-axis raw-DR displacement
    # contribute a log-ratio sample (m)
    scale_min_axis_disp: jax.Array
    # sweep pair-eligibility gates, decoupled from the in-scan NSSM gates.
    # The in-scan search re-uses ``nssm_min_points`` (50 at the full config)
    # as its covisibility threshold, which silently caps sweep recall:
    # measured on seed 0 (round 4), 17 of 20 missed revisit sources had top
    # co-visibility counts of 12-47 — never attempted — and over half of
    # them register at 0.5-5 cm when tried. The bad fits among them are
    # rejected by the sweep_max_dt/dr consistency gates, not by point count,
    # so the sweep can run much leaner gates at the same precision.
    sweep_min_covis: jax.Array  # int32: minimum mutual in-FOV point count
    sweep_min_inliers: jax.Array  # int32: sweep's own ICP-inlier gate
    # the sweep's single-frame low-covisibility registrations are honest but
    # noisier than windowed re-measurements (10-25 cm error tails measured on
    # seed 0) — applying the tight remeasure floor to them over-weights the
    # tail and can DEGRADE ATE even at precision 1.0. They get their own
    # floor; loops that later survive the windowed re-measurement pass (the
    # next refine iteration re-registers every logged loop) earn
    # ``floor_sigmas`` then.
    sweep_floor_sigmas: jax.Array  # (3,)
    # additional inlier-count de-weighting for sweep insertions: covariance
    # sigmas scale by clip(ref/inliers, 1, 4); 0 disables
    sweep_cov_inlier_ref: jax.Array  # float32
    # chain-vs-dead-reckoning deviation gate: a consecutive chain
    # registration that disagrees with the (scale-corrected) raw DR delta
    # over the same interval is wrong — DR is cm-accurate over one 3 m
    # keyframe interval, so this is a far tighter independent check than
    # the 35 cm pose-guess consistency gate. Catches the single tens-of-cm
    # biased link that, under a tight chain floor, Cauchy lets dominate the
    # whole graph (seed 0: ATE 13 -> 37 cm at any chain floor < 5 cm).
    # <= 0 disables (traced).
    chain_dr_max_dt: jax.Array  # (m)
    chain_dr_max_dr: jax.Array  # (rad)
    # post-convergence loop prune: after the final optimize, any logged loop
    # whose measurement disagrees with the converged relative pose by more
    # than these gates is zero-weighted (sqrt_info := 0) and compacted out
    # of the loop log, then the graph re-optimizes once. Catches the rare
    # lean-gate sweep insertion that registered >25 cm off truth yet passed
    # its guess-consistency gate because the local graph was equally off.
    # <= 0 disables (traced).
    prune_max_dt: jax.Array  # (m)
    prune_max_dr: jax.Array  # (rad)
    # scale-anchor sample gate on interval rotation: the per-axis ratio
    # model z_chain[a]/z_dr[a] ~ exp(-log_scale[a]) only holds while the
    # body axes stay aligned over the interval — on turning intervals the
    # DVL stretch rotates through the interval and the per-axis ratios mix
    # both axes (exactly where |z_y| is large enough to pass the
    # displacement gate, so unstretched turn samples would otherwise
    # dominate the y anchor). <= 0 disables (traced).
    scale_max_rot: jax.Array  # (rad)
    # per-axis Gaussian prior sigma on the basis scale solve
    # (``solve_scale_from_basis``). Traced so the prior strength — the one
    # knob governing how far the weakly-observed lateral axis may move from
    # nominal — can be swept without recompiling (round-4: the measured y
    # estimates landed on the WRONG side of nominal on 3/5 seeds at the old
    # static 0.01 prior). Defaults mirror the former SlamDims values.
    scale_prior_sigma: jax.Array  # (2,)

    @staticmethod
    def default() -> "RefineParams":
        f = jnp.float32
        return RefineParams(
            max_dt=f(0.6),
            max_dr=f(0.12),
            min_inliers=jnp.asarray(25, jnp.int32),
            sweep_max_dt=f(0.5),
            sweep_max_dr=f(0.1),
            prox_radius=f(20.0),
            floor_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
            robust=jnp.asarray(True),
            move_gate_t=f(0.01),
            move_gate_r=f(0.002),
            chain_floor_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
            scale_min_axis_disp=f(0.5),
            sweep_min_covis=jnp.asarray(12, jnp.int32),
            sweep_min_inliers=jnp.asarray(20, jnp.int32),
            sweep_floor_sigmas=jnp.asarray([0.1, 0.1, 0.02], jnp.float32),
            sweep_cov_inlier_ref=f(0.0),
            chain_dr_max_dt=f(0.12),
            chain_dr_max_dr=f(0.03),
            # default scales with the coarser small-config sonar bins; the
            # full production config overrides to 0.18/0.06 (bench.py) —
            # like the covariance floor, the right gate tracks bin size
            prune_max_dt=f(0.25),
            prune_max_dr=f(0.08),
            scale_max_rot=f(0.0),
            scale_prior_sigma=jnp.asarray([0.05, 0.01], jnp.float32),
        )


def _register_pair(
    carry: SlamCarry,
    i: jax.Array,  # target key
    j: jax.Array,  # source key
    params: SlamParams,
    rp: RefineParams,
    dims: SlamDims,
):
    """Windowed re-registration of loop (i, j) from the converged guess.

    Returns (ok, z (3,), cov (3,3)): the measured target->source transform in
    the BetweenFactor convention used by the scan (core.py with_loop).
    """
    spec = dims.agg_spec()
    M = dims.target_capacity
    K = carry.points.shape[0]
    si = jnp.clip(i, 0, K - 1)
    sj = jnp.clip(j, 0, K - 1)
    guess = se2_between(carry.poses[si], carry.poses[sj])

    # source submap: trailing window ending at j (the in-scan convention)
    src_pts, src_mask, src_conf = _aggregate_window(
        carry, carry.poses[sj], sj - dims.nssm_source_frames + 1,
        dims.nssm_source_frames, spec, M,
        ref_key=sj, use_dr_relatives=dims.aggregate_with_dr,
        use_basis=dims.aggregate_with_dr_basis,
    )
    # target submap: centered window around i
    tw = dims.refine_target_window
    tgt_pts, tgt_mask, tgt_conf = _aggregate_window(
        carry, carry.poses[si], si - tw, 2 * tw + 1, spec, M,
        ref_key=si, use_dr_relatives=dims.aggregate_with_dr,
        use_basis=dims.aggregate_with_dr_basis,
    )

    res = icp(src_pts, src_mask, tgt_pts, tgt_mask, guess, dims.icp,
              conf_weight(src_conf, params), conf_weight(tgt_conf, params))
    d = se2_between(guess, res.pose)
    in_gate = (jnp.linalg.norm(d[:2]) <= rp.max_dt) & (
        jnp.abs(d[2]) <= rp.max_dr
    )
    z, info, mse = res.pose, res.info, res.mse

    # two-stage single-frame consistency refinement (the in-scan
    # nssm_pair_refine mechanism, applied with converged seeds)
    rr = icp(
        carry.points[sj], carry.pmasks[sj],
        carry.points[si], carry.pmasks[si], z, dims.icp,
        conf_weight(carry.pconf[sj], params),
        conf_weight(carry.pconf[si], params),
    )
    dd = se2_between(z, rr.pose)
    pair_ok = (
        rr.ok
        & (jnp.linalg.norm(dd[:2]) <= dims.pair_refine_max_dt)
        & (jnp.abs(dd[2]) <= dims.pair_refine_max_dr)
        & (rr.inliers >= dims.pair_refine_min_inliers)
    )
    z = jnp.where(pair_ok, rr.pose, z)
    info = jnp.where(pair_ok, rr.info, info)
    mse = jnp.where(pair_ok, rr.mse, mse)

    # accept when the measurement stayed consistent with the converged
    # geometry AND either stage had enough correspondence support (the
    # voxelized coarse windows can be sparse while the raw single-frame
    # pair is dense — and vice versa)
    ok = (
        res.ok
        & in_gate
        & ((res.inliers >= rp.min_inliers) | pair_ok)
    )
    cov = localize_covariance(censi_covariance(info, mse, z), z)
    cov, _ = apply_covariance_floor(cov, rp.floor_sigmas)
    # a non-finite measurement/covariance must never reach the factor table
    # (one NaN factor poisons every GN solve downstream)
    ok = ok & jnp.all(jnp.isfinite(z)) & jnp.all(jnp.isfinite(cov))
    return ok, z, cov


def _lane_map(fn, carry, lane_args, mesh: Mesh | None):
    """``vmap(fn(carry, *lane))`` over a lane axis; with a mesh, the lanes
    are sharded over its (single) axis via shard_map with the carry
    replicated — each device registers its slice, only the tiny per-lane
    results gather back."""
    if mesh is None:
        return jax.vmap(lambda *a: fn(carry, *a))(*lane_args)
    axis = mesh.axis_names[0]
    run = shard_map(
        lambda c, *a: jax.vmap(lambda *b: fn(c, *b))(*a),
        mesh=mesh,
        in_specs=(P(),) + tuple(P(axis) for _ in lane_args),
        out_specs=P(axis),
        check_vma=False,
    )
    return run(carry, *lane_args)


def _remeasure(
    carry: SlamCarry, params, rp, dims: SlamDims, mesh: Mesh | None = None
) -> SlamCarry:
    """Re-register every logged loop; replace factor measurements in place."""
    Lcap = dims.max_loops
    lane = jnp.arange(Lcap)
    valid = lane < jnp.minimum(carry.num_loops, Lcap)

    ok, z, cov = _lane_map(
        lambda c, l: _register_pair(
            c, c.loops_i[l], c.loops_j[l], params, rp, dims
        ),
        carry, (lane,), mesh,
    )
    use = ok & valid
    sq = jax.vmap(cov_to_sqrt_info)(cov)

    g = carry.graph
    # disabled lanes scatter out of bounds and drop (a clipped index could
    # alias a real factor slot)
    safe = jnp.where(use, carry.loops_slot, g.f_z.shape[0])
    f_z = g.f_z.at[safe].set(z, mode="drop")
    f_sq = g.f_sqrt_info.at[safe].set(sq, mode="drop")
    f_rb = g.f_robust.at[safe].set(
        jnp.broadcast_to(rp.robust, use.shape), mode="drop"
    )
    return carry._replace(
        graph=g._replace(f_z=f_z, f_sqrt_info=f_sq, f_robust=f_rb),
        loops_tf=jnp.where(use[:, None], z, carry.loops_tf),
    )


def _loops_between(carry: SlamCarry) -> jax.Array:
    """(Lcap, 3) current relative pose of each logged loop's endpoints."""
    K = carry.points.shape[0]
    si = jnp.clip(carry.loops_i, 0, K - 1)
    sj = jnp.clip(carry.loops_j, 0, K - 1)
    return jax.vmap(se2_between)(carry.poses[si], carry.poses[sj])


def _remeasure_moved(
    carry: SlamCarry,
    reg_between: jax.Array,  # (Lcap, 3) endpoint relative pose at last reg
    params,
    rp,
    dims: SlamDims,
    mesh: Mesh | None = None,
):
    """Incremental re-measurement: re-register only the loop lanes whose
    endpoint RELATIVE pose moved beyond the gate since their last
    registration, compacted to a static ``max_loops // 2`` budget.

    Rigid motion of the whole graph leaves every loop measurement exactly
    valid, so relative — not absolute — endpoint motion is the invalidation
    signal. Compaction (top-k gather into a half-size batch) is what makes
    this a real saving on TPU: a masked lane inside vmap still burns its
    full ICP compute. Returns (carry, reg_between) with the snapshot
    refreshed for successfully re-registered lanes."""
    Lcap = dims.max_loops
    B = max(1, Lcap // 2)
    lane = jnp.arange(Lcap)
    valid = lane < jnp.minimum(carry.num_loops, Lcap)

    now = _loops_between(carry)
    d = jax.vmap(se2_between)(reg_between, now)
    dt = jnp.linalg.norm(d[:, :2], axis=-1)
    dr = jnp.abs(d[:, 2])
    moved = valid & ((dt > rp.move_gate_t) | (dr > rp.move_gate_r))
    # rank by movement (rotation priced at ~5 m/rad — mid-range lever arm)
    score = jnp.where(moved, dt + 5.0 * dr, -1.0)
    _, sel = jax.lax.top_k(score, B)
    active = jnp.take(score, sel) > 0.0

    ok, z, cov = _lane_map(
        lambda c, l: _register_pair(
            c, c.loops_i[l], c.loops_j[l], params, rp, dims
        ),
        carry, (sel,), mesh,
    )
    use = ok & active
    sq = jax.vmap(cov_to_sqrt_info)(cov)

    g = carry.graph
    F = g.f_z.shape[0]
    safe = jnp.where(use, carry.loops_slot[sel], F)
    g = g._replace(
        f_z=g.f_z.at[safe].set(z, mode="drop"),
        f_sqrt_info=g.f_sqrt_info.at[safe].set(sq, mode="drop"),
        f_robust=g.f_robust.at[safe].set(
            jnp.broadcast_to(rp.robust, use.shape), mode="drop"
        ),
    )
    safe_lane = jnp.where(use, sel, Lcap)
    carry = carry._replace(
        graph=g,
        loops_tf=carry.loops_tf.at[safe_lane].set(z, mode="drop"),
    )
    reg_between = reg_between.at[safe_lane].set(now[sel], mode="drop")
    return carry, reg_between


def _covisibility(carry: SlamCarry, dims: SlamDims) -> jax.Array:
    """(K, K) mutual co-visibility counts under the current poses:
    ``C[a, b] = #points of frame b inside frame a's FOV wedge``, symmetrized
    by min. Proximity alone is the wrong pairing signal for a forward-looking
    sonar — two nearby keyframes heading apart share nothing (measured: every
    min-distance pair on the small survey registers with 0 inliers). This is
    the sweep's analog of the NSSM gated-point target selection
    (`slam.py:901-916`), computed for ALL pairs in one batched op."""
    from ..geometry import se2_inverse, se2_transform_points

    gpts = jax.vmap(se2_transform_points)(carry.points, carry.poses)
    flat = gpts.reshape(-1, 2)  # (K*N, 2)
    K, N = carry.pmasks.shape

    def per_viewer(pose):
        local = se2_transform_points(flat, se2_inverse(pose))
        rng = jnp.linalg.norm(local, axis=-1)
        brg = jnp.arctan2(local[:, 1], local[:, 0])
        infov = (rng < dims.max_range) & (
            jnp.abs(brg) < dims.half_aperture
        )
        return jnp.sum(
            (infov.reshape(K, N)) & carry.pmasks, axis=1
        ).astype(jnp.int32)

    C = jax.vmap(per_viewer)(carry.poses)  # (viewer a, viewed b)
    return jnp.minimum(C, C.T)


def _densify_chain(
    carry: SlamCarry, params, rp, dims: SlamDims, mesh: Mesh | None = None
) -> SlamCarry:
    """Re-register every CONSECUTIVE keyframe pair from the converged poses;
    REPLACE the in-scan SSM measurement where one exists, add a tight
    sequential factor where SSM fell back to odometry.

    Two measured reasons. (1) Weight: the in-scan SSM factors carry the
    reference's fixed covariance floor (`icp_odom_sigmas`, 20 cm at the
    full config — slam.py:382-386), priced for drift-seeded measurements;
    tightening that floor in-scan is catastrophic (shared with the in-scan
    loop floor, 13-25x ATE blowup), while the converged-seed registrations
    deserve centimeter weights. (2) Bias: in-scan SSM registers a fresh
    keyframe against the trailing WINDOW — a partial-overlap pairing whose
    boundary pull biases translations ~0.5% short and rotations with it
    (disabling SSM factors entirely measured heading ATE 0.62 -> 0.21 deg
    and consistently moved the DVL-scale estimate toward truth); the
    consecutive single-frame pairs here overlap ~90%, so the bias mechanism
    is absent. Replacement keeps in-scan drift control AND removes the
    biased measurements from the converged graph."""
    K = dims.max_keyframes
    idx = jnp.arange(K)

    def one(c, k):
        prev = jnp.maximum(k - 1, 0)
        guess = se2_between(c.poses[prev], c.poses[k])
        rr = icp(
            c.points[k], c.pmasks[k],
            c.points[prev], c.pmasks[prev], guess, dims.icp,
            conf_weight(c.pconf[k], params),
            conf_weight(c.pconf[prev], params),
        )
        dd = se2_between(guess, rr.pose)
        # independent cross-check vs the scale-corrected raw DR delta over
        # the same interval (see RefineParams.chain_dr_max_*)
        if dims.aggregate_with_dr_basis:
            from .core import scaled_dr_between

            zd = scaled_dr_between(c, prev, k, jnp.exp(c.graph.log_scale))
        else:
            zd = se2_between(c.dr_poses[prev], c.dr_poses[k])
            zd = zd.at[:2].multiply(jnp.exp(c.graph.log_scale))
        dr_dev_t = jnp.linalg.norm(rr.pose[:2] - zd[:2])
        dr_dev_r = jnp.abs(
            jnp.mod(rr.pose[2] - zd[2] + jnp.pi, 2 * jnp.pi) - jnp.pi
        )
        dr_ok = (
            (rp.chain_dr_max_dt <= 0)
            | ((dr_dev_t <= rp.chain_dr_max_dt)
               & (dr_dev_r <= rp.chain_dr_max_dr))
        )
        ok = (
            (k >= 1)
            & (k < c.num_kf)
            & rr.ok
            & dr_ok
            & (rr.inliers >= rp.min_inliers)
            & (jnp.linalg.norm(dd[:2]) <= dims.pair_refine_max_dt)
            & (jnp.abs(dd[2]) <= dims.pair_refine_max_dr)
        )
        cov = localize_covariance(
            censi_covariance(rr.info, rr.mse, rr.pose), rr.pose
        )
        cov, _ = apply_covariance_floor(cov, rp.chain_floor_sigmas)
        ok = ok & jnp.all(jnp.isfinite(rr.pose)) & jnp.all(jnp.isfinite(cov))
        return ok, rr.pose, cov

    ok, z, cov = _lane_map(one, carry, (idx,), mesh)
    sq = jax.vmap(cov_to_sqrt_info)(cov)

    # replace in place where an in-scan SSM factor exists (disabled lanes
    # scatter out of bounds and drop — a clipped index could alias slot 0)
    g = carry.graph
    have_ssm = carry.ssm_slot >= 0
    rep = ok & have_ssm
    F = g.f_z.shape[0]
    safe = jnp.where(rep, carry.ssm_slot, F)
    g = g._replace(
        f_z=g.f_z.at[safe].set(z, mode="drop"),
        f_sqrt_info=g.f_sqrt_info.at[safe].set(sq, mode="drop"),
        f_robust=g.f_robust.at[safe].set(
            jnp.broadcast_to(rp.robust, rep.shape), mode="drop"
        ),
    )
    carry = carry._replace(graph=g)

    from ..graph.factor_graph import add_between

    def insert_one(c: SlamCarry, k):
        g2 = add_between(
            c.graph, k - 1, k, z[k], cov_to_sqrt_info(cov[k]),
            robust=rp.robust, enabled=ok[k] & ~have_ssm[k],
        )
        return c._replace(graph=g2), None

    carry, _ = jax.lax.scan(insert_one, carry, idx)
    return carry, ok, z


def solve_scale_from_basis(
    chain_ok: jax.Array,  # (K,) accepted chain registrations
    chain_z: jax.Array,  # (K, 3) measurements (frame k-1 -> k, prev body)
    basis: jax.Array,  # (K, 2, 2) cumulative DVL basis at keyframes
    dr_heading: jax.Array,  # (K,) raw-DR heading at keyframes
    prior_sigma: tuple,  # per-axis Gaussian prior sigma on the correction
    meas_sigma: float = 0.02,  # chain-registration noise (m)
    min_n: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Joint per-axis DVL-scale correction from the refined chain and the
    DVL basis integrals (``estimators.dead_reckoning.dvl_basis_scan``).

    Per interval k the raw-DR planar delta decomposes EXACTLY by velocity
    axis: ``dr_delta_k(c) = cx*a_k + cy*b_k`` with ``a_k = basis[k,0] -
    basis[k-1,0]`` (world frame), so the metric chain registration gives
    one 2-equation row ``z_k ≈ cx*ā_k + cy*b̄_k`` (bars: rotated into the
    interval-start body frame, where ``z_k`` lives). Solving the 2x2
    weighted least squares over ALL accepted intervals uses turning
    intervals CORRECTLY — they are where the y axis is observable, and
    they are exactly where the pre-round-4 per-axis ratio median broke
    (the stretch rotates through the interval and the per-axis ratios mix
    axes; measured: y anchors off by ±4%, gating turns away lost x
    accuracy too). A Gaussian prior on each axis keeps the solve sane when
    the trajectory has no turns at all.

    Returns ``(log_correction (2,), enough (bool))``; ``exp(log_corr)``
    maps raw-DR displacement onto metric displacement (the
    ``GraphState.log_scale`` convention).
    """
    K = chain_z.shape[0]
    idx = jnp.arange(K)
    prev = jnp.maximum(idx - 1, 0)
    d = basis[idx] - basis[prev]  # (K, 2 axis, 2 world)
    th = dr_heading[prev]
    c, s = jnp.cos(th), jnp.sin(th)

    def to_body(v):  # world -> interval-start body frame
        return jnp.stack(
            [c * v[..., 0] + s * v[..., 1], -s * v[..., 0] + c * v[..., 1]],
            axis=-1,
        )

    A = jnp.stack([to_body(d[:, 0]), to_body(d[:, 1])], axis=-1)  # (K,2,2)
    z = chain_z[:, :2]
    w = (chain_ok.astype(jnp.float32) / (meas_sigma**2))[:, None, None]
    # HIGHEST: meter-scale basis deltas rounded to bf16 shift the recovered
    # scale by ~0.5% — larger than the signal being estimated (round-4
    # on-chip y-scale divergence)
    hp = jax.lax.Precision.HIGHEST
    M = jnp.sum(w * jnp.matmul(jnp.swapaxes(A, 1, 2), A, precision=hp), axis=0)
    v = jnp.sum(jnp.matmul(w * jnp.swapaxes(A, 1, 2), z[:, :, None],
                           precision=hp), axis=0)[:, 0]
    pw = 1.0 / jnp.asarray(prior_sigma, jnp.float32) ** 2
    M = M + jnp.diag(pw)
    v = v + pw  # prior center: correction 1 (nominal)
    sol = jnp.linalg.solve(M, v)
    sol = jnp.clip(sol, 0.9, 1.1)
    enough = jnp.sum(chain_ok) >= min_n
    return jnp.log(sol), enough


def _anchor_scale_from_chain(
    carry: SlamCarry,
    chain_ok: jax.Array,  # (K,) accepted chain registrations
    chain_z: jax.Array,  # (K, 3) their measurements (frame k-1 -> k)
    rp,
    dims: SlamDims,
    scale_basis: jax.Array | None = None,  # (K, 2, 2) dvl_basis_scan at kf
) -> SlamCarry:
    """Measure the DVL scale correction directly: per accepted chain
    interval, exp(log_scale) should map the raw DR delta onto the metric
    chain registration, so log(z_chain / z_dr) is a per-axis sample of
    log_scale. The masked median over all intervals is immune to the
    factor-weighting shrinkage that biases the in-graph estimate (Cauchy
    robust weights treat a consistent scale miss as a field of outliers).
    Axes without enough displacement (lateral, on crab trajectories) keep
    the current in-graph estimate. The result is written to
    ``GraphState.log_scale_anchor`` (and seeds ``log_scale``); the caller
    pins it with ``SlamDims.refine_scale_anchor_sigma``."""
    if scale_basis is not None:
        anchor, enough = solve_scale_from_basis(
            chain_ok, chain_z, scale_basis, carry.dr_poses[:, 2],
            rp.scale_prior_sigma,
        )
        anchor = jnp.where(enough, anchor, carry.graph.log_scale)
        g = carry.graph._replace(log_scale_anchor=anchor, log_scale=anchor)
        return carry._replace(graph=g)

    K = dims.max_keyframes
    idx = jnp.arange(K)
    prev = jnp.maximum(idx - 1, 0)
    zd = jax.vmap(se2_between)(carry.dr_poses[prev], carry.dr_poses[idx])

    rot_ok = (rp.scale_max_rot <= 0) | (
        jnp.abs(zd[:, 2]) <= rp.scale_max_rot
    )

    def axis_anchor(a: int, min_n: int = 8) -> jax.Array:
        num, den = chain_z[:, a], zd[:, a]
        use = (
            chain_ok
            & rot_ok
            & (jnp.abs(den) > rp.scale_min_axis_disp)
            & (num * den > 0)
        )
        ratio = num / jnp.where(use, den, 1.0)
        lr = jnp.log(jnp.where(use, ratio, 1.0))
        med = jnp.nanmedian(jnp.where(use, lr, jnp.nan))
        enough = (jnp.sum(use) >= min_n) & jnp.isfinite(med)
        return jnp.where(enough, med, carry.graph.log_scale[a])

    anchor = jnp.stack([axis_anchor(0), axis_anchor(1)])
    g = carry.graph._replace(log_scale_anchor=anchor, log_scale=anchor)
    return carry._replace(graph=g)


def _sweep(
    carry: SlamCarry, params, rp, dims: SlamDims, mesh: Mesh | None = None
) -> SlamCarry:
    """One single-frame registration per source keyframe vs its most
    co-visible eligible target; insert confident consistent fits as new loop
    factors."""
    K = dims.max_keyframes
    idx = jnp.arange(K)
    pos = carry.poses[:, :2]
    d = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)  # (i, j)

    # pair (i, j) already constrained by a logged loop?
    lvalid = jnp.arange(dims.max_loops) < carry.num_loops
    taken = (
        jnp.zeros((K, K), jnp.int32)
        .at[carry.loops_i, carry.loops_j]
        .add(lvalid.astype(jnp.int32))
        > 0
    )

    covis = _covisibility(carry, dims)
    eligible = (
        (idx[None, :] - idx[:, None] >= dims.nssm_min_st_sep)  # j older-gap
        & (idx[None, :] < carry.num_kf)
        & (idx[:, None] < carry.num_kf)
        & ~taken
        & (d <= rp.prox_radius)
        & (covis >= rp.sweep_min_covis)
    )
    score = jnp.where(eligible, covis, -1)
    # top-k most co-visible targets per source j (k=1 == argmax; k>1 lifts
    # the one-loop-per-source recall ceiling, round-3 verdict item 3)
    topk = dims.refine_sweep_topk
    vals, tgts = jax.lax.top_k(score.T, topk)  # (source j, k)
    src_of = jnp.repeat(idx, topk)  # (K*topk,) lane axis
    tgt_of = tgts.reshape(-1)
    has_tgt = (vals > 0).reshape(-1)
    B = dims.refine_sweep_budget
    if B and B < K * topk:
        # compact to the top-B lanes by score (exact when <= B lanes are
        # eligible — the dropped ones had score <= 0 and never inserted)
        bv, bidx = jax.lax.top_k(vals.reshape(-1), B)
        src_of, tgt_of, has_tgt = src_of[bidx], tgt_of[bidx], bv > 0

    def one(c, j, i, has):
        guess = se2_between(c.poses[i], c.poses[j])
        rr = icp(
            c.points[j], c.pmasks[j],
            c.points[i], c.pmasks[i], guess, dims.icp,
            conf_weight(c.pconf[j], params),
            conf_weight(c.pconf[i], params),
        )
        dd = se2_between(guess, rr.pose)
        ok = (
            has
            & rr.ok
            & (rr.inliers >= rp.sweep_min_inliers)
            & (jnp.linalg.norm(dd[:2]) <= rp.sweep_max_dt)
            & (jnp.abs(dd[2]) <= rp.sweep_max_dr)
        )
        cov = localize_covariance(
            censi_covariance(rr.info, rr.mse, rr.pose), rr.pose
        )
        cov, _ = apply_covariance_floor(cov, rp.sweep_floor_sigmas)
        # inlier-count de-weighting: a 20-inlier single-frame fit is not a
        # 60-inlier fit, whatever its Censi covariance claims
        s = jnp.clip(
            rp.sweep_cov_inlier_ref / jnp.maximum(rr.inliers, 1), 1.0, 4.0
        )
        cov = cov * jnp.where(rp.sweep_cov_inlier_ref > 0, s * s, 1.0)
        ok = ok & jnp.all(jnp.isfinite(rr.pose)) & jnp.all(jnp.isfinite(cov))
        return ok, rr.pose, cov

    ok, z, cov = _lane_map(one, carry, (src_of, tgt_of, has_tgt), mesh)

    from ..graph.factor_graph import add_between  # local: avoid cycle noise

    def insert_one(c: SlamCarry, l):
        en = ok[l] & (c.num_loops < dims.max_loops)
        fslot = c.graph.num_factors
        g = add_between(
            c.graph, tgt_of[l], src_of[l], z[l], cov_to_sqrt_info(cov[l]),
            robust=rp.robust, enabled=en,
        )
        slot = jnp.clip(c.num_loops, 0, dims.max_loops - 1)
        return c._replace(
            graph=g,
            loops_i=jnp.where(en, c.loops_i.at[slot].set(tgt_of[l]), c.loops_i),
            loops_j=jnp.where(en, c.loops_j.at[slot].set(src_of[l]), c.loops_j),
            loops_tf=jnp.where(en, c.loops_tf.at[slot].set(z[l]), c.loops_tf),
            loops_slot=jnp.where(
                en, c.loops_slot.at[slot].set(fslot), c.loops_slot
            ),
            num_loops=c.num_loops + en.astype(jnp.int32),
        ), None

    carry, _ = jax.lax.scan(insert_one, carry, jnp.arange(src_of.shape[0]))
    return carry


def _prune_loops(carry: SlamCarry, rp, dims: SlamDims) -> SlamCarry:
    """Zero-weight and de-log loops that disagree with the converged graph.

    A loop measurement more than ``prune_max_dt``/``prune_max_dr`` away from
    the optimized relative pose of its endpoints is an outlier by consensus:
    every odometry, chain, and sibling-loop factor votes against it. Its
    factor keeps its slot but gets sqrt_info = 0 (weight zero in the normal
    equations) and the loop log is compacted so downstream re-measurement,
    metrics, and services never see it. Traced no-op when prune_max_dt <= 0.
    """
    L = dims.max_loops
    lane = jnp.arange(L)
    lvalid = lane < carry.num_loops
    rel = jax.vmap(se2_between)(
        carry.poses[carry.loops_i], carry.poses[carry.loops_j]
    )
    d = jax.vmap(se2_between)(carry.loops_tf, rel)
    bad = (
        lvalid
        & (rp.prune_max_dt > 0)
        & (
            (jnp.linalg.norm(d[:, :2], axis=-1) > rp.prune_max_dt)
            | (jnp.abs(d[:, 2]) > rp.prune_max_dr)
        )
    )
    g = carry.graph
    F = g.f_z.shape[0]
    safe = jnp.where(bad & (carry.loops_slot >= 0), carry.loops_slot, F)
    g = g._replace(
        f_sqrt_info=g.f_sqrt_info.at[safe].set(
            jnp.zeros((3, 3), jnp.float32), mode="drop"
        )
    )
    # compact the log: keepers first, original order preserved
    keep = lvalid & ~bad
    order = jnp.argsort(~keep, stable=True)
    return carry._replace(
        graph=g,
        loops_i=carry.loops_i[order],
        loops_j=carry.loops_j[order],
        loops_tf=carry.loops_tf[order],
        loops_slot=carry.loops_slot[order],
        num_loops=jnp.sum(keep).astype(carry.num_loops.dtype),
    )


@functools.partial(jax.jit, static_argnums=(3, 4))
def refine_loops(
    carry: SlamCarry,
    params: SlamParams,
    rp: RefineParams,
    dims: SlamDims,
    mesh: Mesh | None = None,
    scale_basis: jax.Array | None = None,  # (K, 2, 2) dvl_basis_scan @ kf
) -> SlamCarry:
    """Iterated post-convergence refinement: re-measure -> optimize
    (-> sweep -> optimize) x ``dims.refine_iters``.

    Returns the refined carry (poses, graph, loop log all updated). No-op
    when ``dims.refine_iters == 0``. With ``mesh`` (single-axis), the
    registration fan-outs shard over its devices; lane capacities
    (``max_loops``, ``max_keyframes``) must divide by the mesh size.
    """
    if dims.refine_iters <= 0:
        return carry
    # refinement moves measurements substantially on the first sweep — give
    # the GN solver more relinearization headroom than the warm-started
    # in-scan updates need (the convergence tol early-exits when done).
    # The DVL-scale prior is also relaxed here: in-scan the tight prior
    # (default 5%) keeps a weakly-observed scale from absorbing noise, but
    # once the refined loops pin the graph the scale is well-observed and
    # the tight prior only shrinks the estimate toward nominal (measured:
    # ~1/3 of the injected bias left on the table).
    # (probed: deeper GN — 40 sweeps at 1e-7 — returns bit-identical
    # results; the per-stage optimum is reached well within this budget)
    gcfg = dims.graph_config()._replace(
        gn_iters=max(dims.gn_iters, 12),
        convergence_tol=1e-6,
        scale_prior_sigma=(max(dims.dvl_scale_prior_sigma, 0.25),
                           dims.dvl_scale_prior_sigma_y),
    )

    # after the direct scale measurement (refine_scale_from_chain), the
    # scale variable is pinned at the anchor with a tight prior
    gcfg_anchored = gcfg._replace(
        scale_prior_sigma=tuple(dims.refine_scale_anchor_sigma)
    )
    cur_cfg = [gcfg]

    def opt(c: SlamCarry) -> SlamCarry:
        g = optimize(c.graph, cur_cfg[0])
        return c._replace(graph=g, poses=g.poses)

    # per-lane endpoint relative pose at last registration (incremental
    # invalidation state; only consulted when dims.refine_incremental)
    reg_between = _loops_between(carry)
    for it in range(dims.refine_iters):
        if it == 0 or not dims.refine_incremental:
            # full pass — every lane registers from the current poses
            carry = _remeasure(carry, params, rp, dims, mesh)
            reg_between = _loops_between(carry)
        else:
            carry, reg_between = _remeasure_moved(
                carry, reg_between, params, rp, dims, mesh
            )
        carry = opt(carry)
        if it == 0 and dims.refine_chain:
            carry, ch_ok, ch_z = _densify_chain(carry, params, rp, dims, mesh)
            if dims.refine_scale_from_chain and dims.estimate_dvl_scale:
                carry = _anchor_scale_from_chain(
                    carry, ch_ok, ch_z, rp, dims, scale_basis
                )
                cur_cfg[0] = gcfg_anchored
            carry = opt(carry)
        # the sweep runs EVERY iteration: the first pass's corrections open
        # new consistent pairs for the next (probed: sweep-once loses ~1/3
        # of the final loops and 1.4 cm ATE on seed 0)
        if dims.refine_sweep:
            n_before = carry.num_loops
            carry = opt(_sweep(carry, params, rp, dims, mesh))
            if dims.refine_incremental:
                # lanes the sweep just inserted were registered at the
                # current poses — snapshot them so iteration it+1 doesn't
                # immediately re-register fresh measurements
                lane = jnp.arange(dims.max_loops)
                fresh = (lane >= n_before) & (lane < carry.num_loops)
                reg_between = jnp.where(
                    fresh[:, None], _loops_between(carry), reg_between
                )
    # consensus outlier prune + one final re-optimize (warm: converges in
    # one sweep when nothing was pruned)
    carry = _prune_loops(carry, rp, dims)
    carry = opt(carry)
    if dims.refine_final_sweep and dims.refine_sweep:
        # post-prune sweep: the poses are now the pipeline's best, so
        # revisit pairs that failed their guess-consistency gate earlier
        # convert here; the second prune keeps precision
        # (SlamDims.refine_final_sweep)
        carry = opt(_sweep(carry, params, rp, dims, mesh))
        carry = _prune_loops(carry, rp, dims)
        carry = opt(carry)
    return carry
