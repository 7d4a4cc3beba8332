"""Fused plan-based Schur solver vs the scatter-based reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused


def _problem(K=12, L=64, obs_per=4, dtype=jnp.float32, pad_obs=0, pad_lm=0):
    problem, _, _ = synthetic.synth_ba_problem(
        model="pinhole", K=K, L=L, obs_per_landmark=obs_per,
        pixel_noise=0.5, dtype=dtype,
    )
    if pad_obs or pad_lm:
        o = problem.obs

        def padO(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad_obs,) + x.shape[1:], x.dtype)]
            )

        obs = ba.BAObservations(
            anchor_cam=padO(o.anchor_cam),
            target_cam=padO(o.target_cam),
            landmark=padO(o.landmark),
            aux=jax.tree_util.tree_map(padO, o.aux),
            valid=padO(o.valid),
        )

        def padL(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad_lm,) + x.shape[1:], x.dtype)]
            )

        problem = problem._replace(
            obs=obs,
            inv_depth=padL(problem.inv_depth),
            lm_valid=padL(problem.lm_valid),
        )
    return problem


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)


@pytest.mark.parametrize("pad_obs,pad_lm", [(0, 0), (17, 5)])
def test_fused_step_matches_scatter_path(pad_obs, pad_lm):
    problem = _problem(pad_obs=pad_obs, pad_lm=pad_lm)
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0)
    res_fn = geometric_ba.make_residual_fn("pinhole")
    _, build_neq = ba.make_ba_step(res_fn, geometric_ba.cam_retract, 6)
    plan = fused.plan_for_problem(problem, host=False)
    solver = fused.make_fused_ba_solver(res_fn, geometric_ba.cam_retract, 6)

    cost_r, H_cc, H_cp, H_pp, g_c, g_p = jax.jit(
        lambda p: build_neq(p, cfg)
    )(problem)
    cost_f, neq = jax.jit(lambda p: solver.build(p, plan, cfg))(problem)
    H_cc_f, S_corr0, rhs_corr0, H_pp_f, g_c_f, g_p_f, M, inv0 = neq

    K = H_cc.shape[0]
    L = H_pp.shape[0]
    H_cc_mat = jnp.transpose(H_cc, (0, 2, 1, 3)).reshape(K * 6, K * 6)
    assert _rel(cost_f, cost_r) < 1e-5
    assert _rel(H_cc_f, H_cc_mat) < 1e-4
    assert _rel(H_pp_f, H_pp) < 1e-4
    assert _rel(g_c_f, g_c) < 1e-4
    assert _rel(g_p_f, g_p) < 1e-4

    # M rows == landmark columns of H_cp; Schur correction against the
    # dense H_cp formulation
    H_cp_mat = jnp.transpose(H_cp, (0, 2, 1)).reshape(K * 6, L)
    assert _rel(M.T, H_cp_mat) < 1e-4
    inv0_r = problem.lm_valid / jnp.maximum(H_pp, cfg.min_inv_depth_hessian)
    S_dense = (H_cp_mat * inv0_r[None, :]) @ H_cp_mat.T
    assert _rel(S_corr0, S_dense) < 1e-3
    rhs_dense = (H_cp_mat * inv0_r[None, :]) @ g_p
    assert _rel(rhs_corr0, rhs_dense) < 1e-3

    # per-lambda solve matches schur_solve
    lam = jnp.asarray(0.02, jnp.float32)
    dc_r, dp_r = jax.jit(lambda *a: ba.schur_solve(*a, cfg))(
        H_cc, H_cp, H_pp, g_c, g_p, lam, ~problem.fixed_cams,
        problem.lm_valid,
    )
    dc_f, dp_f = jax.jit(
        lambda n, la: solver.solve_lam(n, plan, la, ~problem.fixed_cams, cfg)
    )(neq, lam)
    assert _rel(dc_f, dc_r) < 5e-3
    assert _rel(dp_f, dp_r) < 5e-3


@pytest.mark.parametrize("host", [False, True])
@pytest.mark.slow
def test_fused_full_solve_converges_like_scatter_path(host):
    problem = _problem(K=10, L=48, obs_per=5)
    cfg = ba.BAConfig(max_iterations=15, huber_delta=1.0)
    res_fn = geometric_ba.make_residual_fn("pinhole")
    plan = fused.plan_for_problem(problem, host=host)
    fsolve = fused.make_fused_ba_solver(res_fn, geometric_ba.cam_retract, 6)
    ssolve = ba.make_ba_solver(res_fn, geometric_ba.cam_retract, 6)

    pf, rf = fsolve(problem, plan, cfg)
    ps, rs = ssolve(problem, cfg)
    assert float(rf.cost) < 0.7 * float(rf.initial_cost)
    # both paths should land at (numerically) the same optimum
    assert abs(float(rf.cost) - float(rs.cost)) <= 0.05 * float(rs.cost) + 1e-6


@pytest.mark.parametrize("host", [False, True])
@pytest.mark.slow
def test_fused_solver_photometric_model(host):
    from photometric_bundle_adjustment_tpu.models import photometric_ba as pba

    problem, images_flat, H, W, _, _ = synthetic.synth_pba_problem(
        K=4, L=64, dtype=jnp.float32
    )
    cfg = ba.BAConfig(max_iterations=5, huber_delta=9.0)
    res_fn = pba.make_residual_fn("pinhole", images_flat, H, W)
    plan = fused.plan_for_problem(problem, host=host)
    fsolve = fused.make_fused_ba_solver(res_fn, pba.cam_retract, 8)
    pf, rf = fsolve(problem, plan, cfg)
    assert np.isfinite(float(rf.cost))
    assert float(rf.cost) <= float(rf.initial_cost)


def test_plan_heavy_covisibility_is_linear():
    # one landmark observed by 60 cameras: the one-hot lifting plan stays
    # linear in the observation count (no quadratic pair expansion)
    an = np.zeros(60, np.int64)
    tn = np.arange(1, 61)
    ln = np.zeros(60, np.int64)
    plan = fused.build_schur_plan(an, tn, ln, K=64, L=1)
    assert int((plan.lm_cam < 64).sum()) == 60
    assert int(plan.anchor_cam_of_lm[0]) == 0


def test_plan_excludes_invalid_observations():
    # padding obs all alias landmark 0: the valid mask must keep them out
    # of the camera-lifting tables
    an = np.r_[np.zeros(4, np.int64), np.zeros(500, np.int64)]
    tn = np.r_[np.arange(1, 5), np.zeros(500, np.int64)]
    ln = np.r_[np.zeros(4, np.int64), np.zeros(500, np.int64)]
    valid = np.r_[np.ones(4, bool), np.zeros(500, bool)]
    plan = fused.build_schur_plan(an, tn, ln, K=8, L=1, valid=valid)
    # only the 4 valid obs appear in the lifting table (dummy slots == K)
    assert int((plan.lm_cam < 8).sum()) == 4
    assert int(plan.anchor_cam_of_lm[0]) == 0


def test_host_and_dense_formulations_agree():
    problem = _problem(K=12, L=96, obs_per=5)
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0)
    res_fn = geometric_ba.make_residual_fn("pinhole")
    solver = fused.make_fused_ba_solver(res_fn, geometric_ba.cam_retract, 6)
    lam = jnp.asarray(0.02, jnp.float32)
    free = ~problem.fixed_cams
    outs = []
    for host in (False, True):
        plan = fused.plan_for_problem(problem, host=host)
        cost, neq = jax.jit(
            lambda p, plan=plan: solver.build(p, plan, cfg)
        )(problem)
        dc, dp = jax.jit(
            lambda n, plan=plan: solver.solve_lam(n, plan, lam, free, cfg)
        )(neq)
        outs.append((cost, dc, dp))
    assert _rel(outs[0][0], outs[1][0]) < 1e-6
    assert _rel(outs[0][1], outs[1][1]) < 1e-4
    assert _rel(outs[0][2], outs[1][2]) < 1e-4


@pytest.mark.slow
def test_dense_lm_layout_agrees_with_chunk_plan():
    """densify_problem + DenseLmSchurPlan == chunk-plan build (ragged obs)."""
    problem = _problem(K=12, L=96, obs_per=5)
    # ragged observation counts: drop a random 30%
    rng = np.random.default_rng(1)
    v = np.asarray(problem.obs.valid).copy()
    v[rng.random(v.shape[0]) < 0.3] = 0
    problem = problem._replace(obs=problem.obs._replace(valid=jnp.asarray(v)))

    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0)
    res_fn = geometric_ba.make_residual_fn("pinhole")
    solver = fused.make_fused_ba_solver(res_fn, geometric_ba.cam_retract, 6)
    lam = jnp.asarray(0.02, jnp.float32)
    free = ~problem.fixed_cams

    plan_c = fused.plan_for_problem(problem, host=False)
    prob_d, plan_d = fused.densify_problem(problem)
    assert isinstance(plan_d, fused.DenseLmSchurPlan)

    cost_c, neq_c = jax.jit(
        lambda p: solver.build(p, plan_c, cfg)
    )(problem)
    cost_d, neq_d = jax.jit(
        lambda p: solver.build(p, plan_d, cfg)
    )(prob_d)
    assert _rel(cost_c, cost_d) < 1e-6
    dc_c, dp_c = jax.jit(
        lambda n: solver.solve_lam(n, plan_c, lam, free, cfg)
    )(neq_c)
    dc_d, dp_d = jax.jit(
        lambda n: solver.solve_lam(n, plan_d, lam, free, cfg)
    )(neq_d)
    assert _rel(dc_c, dc_d) < 1e-4
    assert _rel(dp_c, dp_d) < 1e-4

    # full solve through the dispatching entry point converges identically
    p1, r1 = solver(problem, plan_c, ba.BAConfig(max_iterations=5))
    p2, r2 = solver(prob_d, plan_d, ba.BAConfig(max_iterations=5))
    assert _rel(r1.cost, r2.cost) < 1e-5
    assert _rel(p1.cam_states, p2.cam_states) < 1e-4


@pytest.mark.slow
def test_cost_from_build_loop_matches_classic():
    """The fused-cost LM loop (one build per try, cfg.cost_from_build)
    reaches the classic loop's solution quality — same final cost to f32
    noise and equivalent states."""
    problem = _problem(K=10, L=96, obs_per=5)
    solver = fused.make_fused_ba_solver(
        geometric_ba.make_residual_fn("pinhole"), geometric_ba.cam_retract, 6
    )
    prob_d, plan = fused.densify_problem(problem)

    cfg_a = ba.BAConfig(max_iterations=15, huber_delta=1.0)
    cfg_b = cfg_a._replace(cost_from_build=True)
    p_a, r_a = solver(prob_d, plan, cfg_a)
    p_b, r_b = solver(prob_d, plan, cfg_b)

    assert float(r_b.initial_cost) == pytest.approx(
        float(r_a.initial_cost), rel=1e-6
    )
    assert float(r_b.cost) == pytest.approx(float(r_a.cost), rel=1e-3)
    np.testing.assert_allclose(
        np.asarray(p_a.cam_states), np.asarray(p_b.cam_states), atol=2e-3
    )
