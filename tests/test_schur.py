"""Unit tests of the Schur-complement elimination against a dense reference
solve of the same damped normal equations, including gauge and padding
masks."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba


def dense_reference_solve(H_cc, H_cp, H_pp, g_c, g_p, lam, free_cam, lm_mask,
                          cfg):
    """Solve the full (KC+L) damped system densely with numpy."""
    K, L, C = H_cp.shape
    Hcc = np.transpose(np.asarray(H_cc), (0, 2, 1, 3)).reshape(K * C, K * C)
    Hcp = np.transpose(np.asarray(H_cp), (0, 2, 1)).reshape(K * C, L)
    Hpp = np.asarray(H_pp)
    gc = np.asarray(g_c).reshape(K * C)
    gp = np.asarray(g_p)

    d_cc = np.clip(np.diagonal(Hcc), 1e-12, 1e32)
    A = np.zeros((K * C + L, K * C + L))
    A[: K * C, : K * C] = Hcc + np.diag(lam * d_cc)
    A[: K * C, K * C:] = Hcp
    A[K * C:, : K * C] = Hcp.T
    Hpp_d = np.maximum(Hpp, cfg.min_inv_depth_hessian) * (1 + lam)
    A[K * C:, K * C:] = np.diag(Hpp_d)
    b = -np.concatenate([gc, gp])

    # eliminate fixed cameras and invalid landmarks: identity rows
    mask = np.concatenate(
        [np.repeat(np.asarray(free_cam, float), C), np.asarray(lm_mask, float)]
    )
    A = A * mask[:, None] * mask[None, :] + np.diag(1.0 - mask)
    b = b * mask
    x = np.linalg.solve(A, b)
    return x[: K * C].reshape(K, C), x[K * C:]


@pytest.mark.slow
def test_schur_matches_dense_solve():
    problem, _, _ = synthetic.synth_ba_problem(
        model="pinhole", K=5, L=40, pixel_noise=0.5, seed=2
    )
    cfg = ba.BAConfig(huber_delta=1.0)
    _, build_neq = ba.make_ba_step(
        geometric_ba.make_residual_fn("pinhole"), geometric_ba.cam_retract, 6
    )
    _, H_cc, H_cp, H_pp, g_c, g_p = build_neq(problem, cfg)
    lam = 1e-3
    free = ~problem.fixed_cams
    dc, dp = ba.schur_solve(
        H_cc, H_cp, H_pp, g_c, g_p, jnp.asarray(lam), free, problem.lm_valid,
        cfg,
    )
    dc_ref, dp_ref = dense_reference_solve(
        H_cc, H_cp, H_pp, g_c, g_p, lam, free, problem.lm_valid, cfg
    )
    np.testing.assert_allclose(np.asarray(dc), dc_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dp), dp_ref, rtol=1e-7, atol=1e-9)
    # fixed cameras stay fixed
    assert np.all(np.asarray(dc)[np.asarray(problem.fixed_cams)] == 0.0)


@pytest.mark.slow
def test_schur_with_padding():
    problem, _, _ = synthetic.synth_ba_problem(
        model="pinhole", K=4, L=32, pixel_noise=0.3, seed=5
    )
    # invalidate some landmarks
    lm_valid = np.asarray(problem.lm_valid).copy()
    lm_valid[-7:] = False
    problem = problem._replace(lm_valid=jnp.asarray(lm_valid))
    cfg = ba.BAConfig(huber_delta=1.0)
    _, build_neq = ba.make_ba_step(
        geometric_ba.make_residual_fn("pinhole"), geometric_ba.cam_retract, 6
    )
    _, H_cc, H_cp, H_pp, g_c, g_p = build_neq(problem, cfg)
    dc, dp = ba.schur_solve(
        H_cc, H_cp, H_pp, g_c, g_p, jnp.asarray(1e-3), ~problem.fixed_cams,
        problem.lm_valid, cfg,
    )
    dc_ref, dp_ref = dense_reference_solve(
        H_cc, H_cp, H_pp, g_c, g_p, 1e-3, ~problem.fixed_cams,
        problem.lm_valid, cfg,
    )
    np.testing.assert_allclose(np.asarray(dc), dc_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dp), dp_ref, rtol=1e-7, atol=1e-9)
    assert np.all(np.asarray(dp)[~lm_valid] == 0.0)
