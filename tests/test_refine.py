"""Post-convergence loop refinement (slam/refine.py) unit tests.

Synthetic scenario: keyframes around a square room with exactly-known poses,
clouds sampled from the walls with per-frame sampling offsets (the realistic
condition under which point-to-point ICP slides), one revisit pair. The
carry is constructed directly — no replay — so each mechanism is isolated:

* re-measurement replaces a deliberately biased loop factor measurement and
  the re-optimized poses recover truth;
* the sweep discovers an unconstrained co-visible pair and inserts it;
* the mesh-sharded path equals the single-device path bit-for-bit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.geometry import se2_between, se2_inverse, se2_transform_points
from sonar_slam_tpu.graph.factor_graph import (
    add_between,
    add_prior,
    cov_to_sqrt_info,
    optimize,
    set_pose_estimate,
    sigmas_to_sqrt_info,
)
from sonar_slam_tpu.slam import RefineParams, SlamDims, SlamParams, slam_init
from sonar_slam_tpu.slam.refine import refine_loops

K, N = 16, 128


def _wall_points(rng, offset):
    """Scatterers along two corrugated walls, with a sampling offset so two
    frames never sample identical wall spots. The corrugation (like the
    simulator's wall relief) makes registration tangentially observable —
    flat walls leave ICP's along-wall component unconstrained by design."""
    t = np.arange(offset, 24.0, 0.22)
    relief1 = 0.35 * np.sin(0.9 * t) + 0.15 * np.sin(2.3 * t)
    relief2 = 0.35 * np.cos(0.8 * t) + 0.15 * np.sin(1.9 * t)
    wall1 = np.stack([t, 6.0 + relief1], -1)
    wall2 = np.stack([24.0 + relief2, 6.0 - t], -1)
    pts = np.concatenate([wall1, wall2]) + rng.normal(scale=0.01, size=(2 * len(t), 2))
    return pts


def _frame_cloud(rng, pose, offset):
    """World wall points visible from `pose`, in its local frame, padded."""
    world = _wall_points(rng, offset)
    local = np.asarray(
        se2_transform_points(jnp.asarray(world, jnp.float32),
                             se2_inverse(jnp.asarray(pose, jnp.float32)))
    )
    r = np.linalg.norm(local, axis=1)
    b = np.arctan2(local[:, 1], local[:, 0])
    vis = (r > 0.5) & (r < 28.0) & (np.abs(b) < np.radians(60))
    local = local[vis][:N]
    pts = np.zeros((N, 2), np.float32)
    mask = np.zeros(N, bool)
    pts[: len(local)] = local
    mask[: len(local)] = True
    return pts, mask


def _dims(**kw):
    base = dict(
        max_keyframes=K, max_points=N, target_capacity=256,
        nssm_min_st_sep=4, nssm_source_frames=2, ssm_target_frames=2,
        nssm_cov_samples=4, ssm_sobol=16, nssm_sobol=16, max_loops=8,
        gn_iters=4, pcm_queue_slots=3,
        icp=ICPConfig(max_iterations=20, point_to_line=True,
                      outlier_max_dist=1.0),
        refine_iters=2, refine_target_window=1,
    )
    base.update(kw)
    return SlamDims(**base)


def _build_carry(dims, loop_bias=(0.0, 0.0, 0.0), with_loop=True):
    """Odometry chain of K poses moving along the corridor; revisit at the
    end (last pose returns near pose 2). The loop factor (if any) measures
    the TRUE relative pose plus `loop_bias`."""
    rng = np.random.default_rng(0)
    truth = np.zeros((K, 3), np.float32)
    for k in range(K):
        s = k * 1.4
        if s < 19:  # outbound along wall1
            truth[k] = [s, 0.0, 0.0]
        else:  # come back (revisit)
            truth[k] = [19 - (s - 19), 0.6, np.pi]
    carry = slam_init(dims)
    g = carry.graph
    g = add_prior(g, truth[0], sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    pts_all = np.zeros((K, N, 2), np.float32)
    msk_all = np.zeros((K, N), bool)
    for k in range(K):
        pts, msk = _frame_cloud(rng, truth[k], offset=0.07 * k)
        pts_all[k], msk_all[k] = pts, msk
        g = set_pose_estimate(g, k, truth[k])
        if k:
            z = se2_between(jnp.asarray(truth[k - 1]), jnp.asarray(truth[k]))
            g = add_between(g, k - 1, k, z,
                            sigmas_to_sqrt_info([0.05, 0.05, 0.01]))
    carry = carry._replace(
        graph=g,
        poses=jnp.asarray(truth),
        dr_poses=jnp.asarray(truth),
        times=jnp.arange(K, dtype=jnp.float32),
        points=jnp.asarray(pts_all),
        pmasks=jnp.asarray(msk_all),
        num_kf=jnp.asarray(K, jnp.int32),
    )
    if with_loop:
        i, j = 2, K - 1  # revisit pair
        z_true = np.asarray(se2_between(jnp.asarray(truth[i]),
                                        jnp.asarray(truth[j])))
        z_bad = z_true + np.asarray(loop_bias, np.float32)
        fslot = int(carry.graph.num_factors)
        g = add_between(carry.graph, i, j, jnp.asarray(z_bad),
                        cov_to_sqrt_info(jnp.diag(jnp.asarray(
                            [0.04, 0.04, 0.004]))))
        carry = carry._replace(
            graph=g,
            loops_i=carry.loops_i.at[0].set(i),
            loops_j=carry.loops_j.at[0].set(j),
            loops_tf=carry.loops_tf.at[0].set(jnp.asarray(z_bad)),
            loops_slot=carry.loops_slot.at[0].set(fslot),
            num_loops=jnp.asarray(1, jnp.int32),
        )
    gcfg = dims.graph_config()
    g = optimize(carry.graph, gcfg)
    return carry._replace(graph=g, poses=g.poses), truth


def _params(dims):
    return SlamParams.default(dims)._replace(
        icp_odom_sigmas=jnp.asarray([0.1, 0.1, 0.01], jnp.float32),
        nssm_min_points=jnp.asarray(20, jnp.int32),
        point_noise=jnp.float32(0.3),
    )


def test_remeasure_fixes_biased_loop():
    dims = _dims(refine_sweep=False)
    carry, truth = _build_carry(dims, loop_bias=(0.25, -0.2, 0.0))
    params = _params(dims)
    # the biased loop bent the optimized poses away from truth
    err_before = float(np.abs(np.asarray(carry.poses) - truth).max())
    assert err_before > 0.05

    out = refine_loops(carry, params, RefineParams.default(), dims)
    z_new = np.asarray(out.loops_tf[0])
    z_true = np.asarray(se2_between(jnp.asarray(truth[2]),
                                    jnp.asarray(truth[K - 1])))
    # the re-registered measurement moved to truth (wall sampling floor ~cm)
    assert np.linalg.norm(z_new[:2] - z_true[:2]) < 0.06, z_new - z_true
    err_after = float(np.abs(np.asarray(out.poses)[:, :2]
                             - truth[:, :2]).max())
    assert err_after < 0.05, (err_before, err_after)
    # the factor table was updated in place (not just the log)
    slot = int(out.loops_slot[0])
    np.testing.assert_allclose(np.asarray(out.graph.f_z[slot]), z_new)


def test_sweep_inserts_covisible_pair():
    dims = _dims(refine_sweep=True)
    carry, truth = _build_carry(dims, with_loop=False)
    params = _params(dims)
    out = refine_loops(carry, params, RefineParams.default(), dims)
    nl = int(out.num_loops)
    assert nl >= 1, "sweep found no loops on a surveyed revisit"
    # every inserted loop is accurate vs truth
    for l in range(nl):
        i, j = int(out.loops_i[l]), int(out.loops_j[l])
        assert j - i >= dims.nssm_min_st_sep
        z_true = np.asarray(se2_between(jnp.asarray(truth[i]),
                                        jnp.asarray(truth[j])))
        err = np.linalg.norm(np.asarray(out.loops_tf[l])[:2] - z_true[:2])
        assert err < 0.08, (i, j, err)


def test_sweep_respects_existing_loops():
    """Pairs already constrained by a logged loop are not re-inserted."""
    dims = _dims(refine_sweep=True)
    carry, truth = _build_carry(dims, loop_bias=(0.0, 0.0, 0.0))
    params = _params(dims)
    out = refine_loops(carry, params, RefineParams.default(), dims)
    nl = int(out.num_loops)
    pairs = {(int(out.loops_i[l]), int(out.loops_j[l])) for l in range(nl)}
    assert len(pairs) == nl, "duplicate loop pair inserted"


def test_mesh_equals_single_device():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(devs[:8]), ("kf",))
    dims = _dims(refine_sweep=True)
    carry, _ = _build_carry(dims, loop_bias=(0.2, -0.1, 0.02))
    params = _params(dims)
    rp = RefineParams.default()
    out1 = refine_loops(carry, params, rp, dims)
    out2 = refine_loops(carry, params, rp, dims, mesh)
    # sharded and single-device programs fuse differently; equality is up to
    # compiler-level fp reassociation only
    np.testing.assert_allclose(np.asarray(out1.poses),
                               np.asarray(out2.poses), atol=1e-5)
    assert int(out1.num_loops) == int(out2.num_loops)


def test_refine_disabled_is_identity():
    dims = _dims(refine_iters=0)
    carry, _ = _build_carry(dims)
    params = _params(dims)
    out = refine_loops(carry, params, RefineParams.default(), dims)
    np.testing.assert_array_equal(np.asarray(out.poses),
                                  np.asarray(carry.poses))


def test_chain_replaces_ssm_measurements():
    """When the carry records in-scan SSM factor slots, the chain stage
    REPLACES those measurements in place (no duplicate factor) with the
    converged-seed registration at the refine floor."""
    dims = _dims(refine_sweep=False, refine_chain=True, refine_iters=1)
    carry, truth = _build_carry(dims, with_loop=False)
    # pretend keyframes 3..6 have in-scan SSM factors: their chain factors
    # are the odometry betweens added by _build_carry at slots k-1
    slots = {k: k - 1 for k in range(3, 7)}  # factor k-1 connects (k-1, k)
    ssm_slot = np.full(K, -1, np.int32)
    for k, s in slots.items():
        ssm_slot[k] = s
    carry = carry._replace(ssm_slot=jnp.asarray(ssm_slot))
    params = _params(dims)
    nf_before = int(carry.graph.num_factors)
    out = refine_loops(carry, params, RefineParams.default(), dims)
    # replaced slots now hold a (3,) measurement close to the true between
    for k, s in slots.items():
        z = np.asarray(out.graph.f_z[s])
        tz = np.asarray(se2_between(jnp.asarray(truth[k - 1]),
                                    jnp.asarray(truth[k])))
        assert np.linalg.norm(z[:2] - tz[:2]) < 0.1, (k, z, tz)
        assert bool(out.graph.f_robust[s])  # refine floor semantics applied
    # factors were added ONLY for keyframes without an SSM slot
    added = int(out.graph.num_factors) - nf_before
    assert added <= K - len(slots)


def test_sweep_topk_superset_of_argmax():
    """refine_sweep_topk=2 finds at least the argmax pass's loops, inserts
    no duplicate pairs, and every extra loop is accurate vs truth."""
    d1 = _dims(refine_sweep=True, refine_sweep_topk=1)
    d2 = _dims(refine_sweep=True, refine_sweep_topk=2)
    carry, truth = _build_carry(d1, with_loop=False)
    params = _params(d1)
    out1 = refine_loops(carry, params, RefineParams.default(), d1)
    out2 = refine_loops(carry, params, RefineParams.default(), d2)
    n1, n2 = int(out1.num_loops), int(out2.num_loops)
    assert n2 >= n1, (n1, n2)
    pairs2 = [(int(out2.loops_i[l]), int(out2.loops_j[l])) for l in range(n2)]
    assert len(set(pairs2)) == n2, "duplicate loop pair inserted"
    for l in range(n2):
        i, j = pairs2[l]
        z_true = np.asarray(se2_between(jnp.asarray(truth[i]),
                                        jnp.asarray(truth[j])))
        err = np.linalg.norm(np.asarray(out2.loops_tf[l])[:2] - z_true[:2])
        assert err < 0.08, (i, j, err)


def test_incremental_matches_full_refinement():
    """dims.refine_incremental compacts iteration>=1 re-measurement to the
    moved lanes; the refined poses must match the full (every-lane) path
    closely — the verdict bar is ATE within 0.5 cm, the unit pin is per-pose
    agreement well under that."""
    df = _dims(refine_sweep=True, refine_iters=2)
    di = _dims(refine_sweep=True, refine_iters=2, refine_incremental=True)
    carry, truth = _build_carry(df, loop_bias=(0.25, -0.2, 0.02))
    params = _params(df)
    rp = RefineParams.default()
    out_f = refine_loops(carry, params, rp, df)
    out_i = refine_loops(carry, params, rp, di)
    K_real = int(carry.num_kf)
    d = np.abs(np.asarray(out_f.poses)[:K_real, :2]
               - np.asarray(out_i.poses)[:K_real, :2])
    assert d.max() < 5e-3, d.max()
    assert int(out_i.num_loops) == int(out_f.num_loops)


def test_nssm_cadence_skips_off_cycle_keyframes():
    """SlamParams.nssm_every gates the in-scan loop search to every n-th
    keyframe (traced — the throughput/accuracy knob the refinement pass
    makes cheap)."""
    from sonar_slam_tpu.slam import KeyframeInput, slam_scan

    dims = _dims(refine_iters=0)
    rng = np.random.default_rng(1)
    truth = np.zeros((K, 3), np.float32)
    truth[:, 0] = np.arange(K) * 1.0
    pts = np.zeros((K, N, 2), np.float32)
    msk = np.zeros((K, N), bool)
    for k in range(K):
        pts[k], msk[k] = _frame_cloud(rng, truth[k], offset=0.05 * k)
    pose3 = np.zeros((K, 6), np.float32)
    pose3[:, 0] = truth[:, 0]
    frames = KeyframeInput(
        time=jnp.arange(K, dtype=jnp.float32) * 2.0,
        dr_pose3=jnp.asarray(pose3),
        points=jnp.asarray(pts),
        pmask=jnp.asarray(msk),
        valid=jnp.ones(K, bool),
    )
    params = _params(dims)._replace(
        keyframe_duration=jnp.float32(0.5),
        nssm_every=jnp.asarray(3, jnp.int32),
    )
    _, outs = slam_scan(frames, params, dims)
    from sonar_slam_tpu.slam.core import STATUS_NOT_ENOUGH_POINTS

    status = np.asarray(outs.nssm_status)
    # off-cycle keyframes never run the search (status = skip sentinel)
    for k in range(dims.nssm_min_st_sep, K):
        if k % 3 != 0:
            assert status[k] == STATUS_NOT_ENOUGH_POINTS, (k, status[k])


def test_prune_drops_consensus_outlier():
    """A logged loop whose measurement grossly disagrees with the converged
    relative pose is zero-weighted and compacted out of the log; a
    consistent sibling survives with its slot intact."""
    from sonar_slam_tpu.slam.refine import _prune_loops

    dims = _dims()
    carry, truth = _build_carry(dims, with_loop=True)  # consistent loop
    # append a second, grossly wrong loop (1 m off the converged relative)
    i, j = 3, K - 2
    z_true = np.asarray(se2_between(jnp.asarray(truth[i]),
                                    jnp.asarray(truth[j])))
    z_bad = z_true + np.asarray([1.0, 0.6, 0.0], np.float32)
    fslot = int(carry.graph.num_factors)
    g = add_between(carry.graph, i, j, jnp.asarray(z_bad),
                    cov_to_sqrt_info(jnp.diag(jnp.asarray(
                        [0.04, 0.04, 0.004]))))
    carry = carry._replace(
        graph=g,
        loops_i=carry.loops_i.at[1].set(i),
        loops_j=carry.loops_j.at[1].set(j),
        loops_tf=carry.loops_tf.at[1].set(jnp.asarray(z_bad)),
        loops_slot=carry.loops_slot.at[1].set(fslot),
        num_loops=jnp.asarray(2, jnp.int32),
    )
    rp = RefineParams.default()
    out = _prune_loops(carry, rp, dims)
    assert int(out.num_loops) == 1
    assert int(out.loops_i[0]) == 2 and int(out.loops_j[0]) == K - 1
    # pruned factor's whitening is zeroed -> weight 0 in the solve
    assert float(jnp.abs(out.graph.f_sqrt_info[fslot]).max()) == 0.0
    # survivor's factor untouched
    surv_slot = int(out.loops_slot[0])
    assert float(jnp.abs(out.graph.f_sqrt_info[surv_slot]).max()) > 0.0
    # disabled gate (traced) is an exact no-op on the log
    out2 = _prune_loops(carry, rp._replace(prune_max_dt=jnp.float32(0.0)),
                        dims)
    assert int(out2.num_loops) == 2


def test_sweep_budget_exact_when_unsaturated():
    """A sweep lane budget >= the eligible-pair count returns bit-identical
    results to the unbudgeted sweep (the dropped lanes all had score <= 0)."""
    from dataclasses import replace

    dims = _dims(refine_sweep=True)
    carry, _ = _build_carry(dims, with_loop=False)
    params = _params(dims)
    full = refine_loops(carry, params, RefineParams.default(), dims)
    budgeted = refine_loops(
        carry, params, RefineParams.default(),
        replace(dims, refine_sweep_budget=8),
    )
    assert int(full.num_loops) == int(budgeted.num_loops)
    np.testing.assert_array_equal(np.asarray(full.poses),
                                  np.asarray(budgeted.poses))
    # lane compaction reorders the log (score order vs source order) — the
    # SET of loop measurements is what must match
    def key(c):
        n = int(c.num_loops)
        rows = np.c_[np.asarray(c.loops_i)[:n], np.asarray(c.loops_j)[:n],
                     np.asarray(c.loops_tf)[:n]]
        return rows[np.lexsort(rows.T[::-1])]
    np.testing.assert_allclose(key(full), key(budgeted), rtol=0, atol=0)


def test_while_scan_matches_padded_scan():
    """slam_scan (while_loop bounded at the last valid slot) must be
    bit-identical to slam_scan_padded (full-capacity lax.scan) on the carry
    and on every valid slot's outputs — including with an INTERIOR invalid
    slot, which the while_loop still visits and the frame.valid gates
    no-op. Guards the production fast path (the padded scan burned ~43% of
    the dominant bench stage on no-op tail slots)."""
    from sonar_slam_tpu.slam import KeyframeInput
    from sonar_slam_tpu.slam.core import slam_scan, slam_scan_padded

    dims = _dims(refine_iters=0)
    rng = np.random.default_rng(3)
    truth = np.zeros((K, 3), np.float32)
    truth[:, 0] = np.arange(K) * 1.2
    pts = np.zeros((K, N, 2), np.float32)
    msk = np.zeros((K, N), bool)
    for k in range(K):
        pts[k], msk[k] = _frame_cloud(rng, truth[k], offset=0.04 * k)
    pose3 = np.zeros((K, 6), np.float32)
    pose3[:, 0] = truth[:, 0]
    valid = np.ones(K, bool)
    valid[5] = False  # interior hole (skipped-feature NaN frame analog)
    valid[K - 3:] = False  # padded tail
    frames = KeyframeInput(
        time=jnp.arange(K, dtype=jnp.float32) * 2.0,
        dr_pose3=jnp.asarray(pose3),
        points=jnp.asarray(pts),
        pmask=jnp.asarray(msk) & jnp.asarray(valid)[:, None],
        valid=jnp.asarray(valid),
    )
    params = _params(dims)._replace(keyframe_duration=jnp.float32(0.5))
    c_ref, o_ref = slam_scan_padded(frames, params, dims)
    c_new, o_new = slam_scan(frames, params, dims)
    for name, a, b in zip(c_ref._fields, c_ref, c_new):
        if hasattr(a, "_fields"):  # nested GraphState
            for gn, ga, gb in zip(a._fields, a, b):
                assert bool((jnp.asarray(ga) == jnp.asarray(gb)).all()), gn
        else:
            assert bool((jnp.asarray(a) == jnp.asarray(b)).all()), name
    for name, a, b in zip(o_ref._fields, o_ref, o_new):
        assert bool(
            (jnp.asarray(a)[valid] == jnp.asarray(b)[valid]).all()
        ), name


def test_final_sweep_adds_loops_keeps_truth():
    """refine_final_sweep (round 5, recall mechanism): the post-prune sweep
    may only ADD loops, every logged measurement stays truth-consistent
    (precision contract via the second prune), and poses don't regress."""
    base = _dims(refine_sweep=True)
    carry, truth = _build_carry(base, loop_bias=(0.25, -0.2, 0.0))
    params = _params(base)
    rp = RefineParams.default()

    out0 = refine_loops(carry, params, rp, base)
    dims_fs = _dims(refine_sweep=True, refine_final_sweep=True)
    out1 = refine_loops(carry, params, rp, dims_fs)

    assert int(out1.num_loops) >= int(out0.num_loops)
    # every surviving loop measurement is truth-consistent
    for l in range(int(out1.num_loops)):
        i, j = int(out1.loops_i[l]), int(out1.loops_j[l])
        z = np.asarray(out1.loops_tf[l])
        zt = np.asarray(se2_between(jnp.asarray(truth[i]),
                                    jnp.asarray(truth[j])))
        assert np.linalg.norm(z[:2] - zt[:2]) < 0.12, (l, z - zt)
    err = float(np.abs(np.asarray(out1.poses)[:, :2] - truth[:, :2]).max())
    err0 = float(np.abs(np.asarray(out0.poses)[:, :2] - truth[:, :2]).max())
    assert err < err0 + 0.05, (err, err0)
