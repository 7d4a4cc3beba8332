"""Parity tests for the plane-layout geometric build (ops/geo_mega.py)
against the vmapped-rj fused chunk build (optim/fused.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.ops import geo_mega


def _problem(K=12, L=128, seed=0):
    problem, _, _ = synthetic.synth_ba_problem(
        model="pinhole", K=K, L=L, obs_per_landmark=4,
        pixel_noise=0.6, dtype=jnp.float32, seed=seed,
    )
    return problem


def _gather_build(problem, cfg):
    solver = fused.make_fused_ba_solver(
        geometric_ba.make_residual_fn("pinhole"), geometric_ba.cam_retract,
        6, rj_fn=geometric_ba.make_rj_fn("pinhole"),
    )
    plan = fused.plan_for_problem(problem, host=False, pow2_buckets=False)
    with jax.default_matmul_precision("float32"):
        return solver.build(problem, plan, cfg)


def test_geo_plane_build_matches_fused_chunk():
    problem = _problem()
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0,
                      schur_matmul_precision="highest")
    ref_cost, ref_neq = _gather_build(problem, cfg)

    geo = geo_mega.make_geo_solver("pinhole", problem)
    cost, neq = geo.build(problem, cfg)

    np.testing.assert_allclose(float(cost), float(ref_cost), rtol=1e-5)
    names = ["H_cc", "S_corr0", "rhs_corr0", "H_pp", "g_c", "g_p", "M",
             "inv0"]
    for name, a, b in zip(names, neq, ref_neq):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, atol=2e-4 * scale, rtol=1e-3,
            err_msg=f"neq piece {name} diverges from the fused build",
        )


def test_geo_plane_solve_converges_like_fused():
    problem = _problem(seed=3)
    cfg = ba.BAConfig(max_iterations=6, huber_delta=1.0,
                      schur_matmul_precision="highest")
    solver = fused.make_fused_ba_solver(
        geometric_ba.make_residual_fn("pinhole"), geometric_ba.cam_retract,
        6, rj_fn=geometric_ba.make_rj_fn("pinhole"),
    )
    plan = fused.plan_for_problem(problem, host=False, pow2_buckets=False)
    ref_prob, ref_res = solver(problem, plan, cfg)

    geo = geo_mega.make_geo_solver("pinhole", problem)
    prob, res = geo(problem, cfg)

    assert float(res.cost) < float(res.initial_cost)
    np.testing.assert_allclose(
        float(res.initial_cost), float(ref_res.initial_cost), rtol=1e-5
    )
    # both solvers must reach the same basin (the LM inner loops differ:
    # fused-classic retries inside an inner loop, the plane solver uses
    # the fused-cost accept check)
    np.testing.assert_allclose(
        float(res.cost), float(ref_res.cost), rtol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(prob.cam_states), np.asarray(ref_prob.cam_states),
        atol=5e-3,
    )


def test_geo_plane_dense_matches_chunk():
    """Slot-major dense assembly == chunk assembly on the same problem."""
    problem = _problem(seed=5)
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0,
                      schur_matmul_precision="highest")
    geo_c = geo_mega.make_geo_solver("pinhole", problem)
    cost_c, neq_c = geo_c.build(problem, cfg)

    problem_d, plan_d = fused.densify_problem(problem, pow2_buckets=False)
    geo_d = geo_mega.make_geo_solver("pinhole", problem_d, plan_d, v2=False)
    cost_d, neq_d = geo_d.build(problem_d, cfg)

    np.testing.assert_allclose(float(cost_d), float(cost_c), rtol=1e-6)
    for a, b in zip(neq_d, neq_c):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=1e-5 * scale, rtol=1e-4)


def test_geo_dense2_matches_v1_deltas():
    """The round-5 plane-native assembly (build_geo_dense2 + solve_lam2)
    produces the same LM step as the v1 dense assembly: identical cost,
    matching solve deltas.  The neq CONTRACTS differ (v2 carries the
    sqrt(inv0)-scaled transposed coupling), so parity is checked where it
    matters — at the damped-solve output."""
    problem = _problem(seed=7)
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0,
                      schur_matmul_precision="highest")
    problem_d, plan_d = fused.densify_problem(problem, pow2_buckets=False)
    g1 = geo_mega.make_geo_solver("pinhole", problem_d, plan_d, v2=False)
    g2 = geo_mega.make_geo_solver("pinhole", problem_d, plan_d, v2=True)

    cost1, neq1 = g1.build(problem_d, cfg)
    cost2, neq2 = g2.build(problem_d, cfg)
    np.testing.assert_allclose(float(cost2), float(cost1), rtol=1e-6)

    lam = jnp.asarray(1e-4, problem_d.inv_depth.dtype)
    free = ~problem_d.fixed_cams
    dc1, dp1 = g1.solve_lam(neq1, lam, free, cfg)
    dc2, dp2 = g2.solve_lam(neq2, lam, free, cfg)
    sc = max(float(jnp.abs(dc1).max()), 1e-9)
    sp = max(float(jnp.abs(dp1).max()), 1e-9)
    # the scaled-coupling gram rounds differently through the
    # ill-conditioned reduced system; both forms sit within the v1-vs-f64
    # envelope (measured ~4e-4 rel on the bench problem at HIGHEST)
    np.testing.assert_allclose(np.asarray(dc2), np.asarray(dc1),
                               atol=2e-3 * sc)
    np.testing.assert_allclose(np.asarray(dp2), np.asarray(dp1),
                               atol=2e-3 * sp)


def test_geo_dense2_full_solve_converges_like_v1():
    problem = _problem(seed=9)
    cfg = ba.BAConfig(max_iterations=8, huber_delta=1.0,
                      schur_matmul_precision="highest")
    problem_d, plan_d = fused.densify_problem(problem, pow2_buckets=False)
    g1 = geo_mega.make_geo_solver("pinhole", problem_d, plan_d, v2=False)
    g2 = geo_mega.make_geo_solver("pinhole", problem_d, plan_d, v2=True)
    p1, r1 = g1(problem_d, cfg)
    p2, r2 = g2(problem_d, cfg)
    assert float(r2.cost) < float(r2.initial_cost)
    np.testing.assert_allclose(float(r2.initial_cost),
                               float(r1.initial_cost), rtol=1e-6)
    np.testing.assert_allclose(float(r2.cost), float(r1.cost), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(p2.cam_states),
                               np.asarray(p1.cam_states), atol=1e-2)
