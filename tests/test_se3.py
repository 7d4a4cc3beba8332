"""SE3 Lie-core tests, including the port of the reference's SE3-manifold
optimisation acceptance test (src/test_ceres_se3.cpp:93-127): the same 9
target/init pose pairs (near-pi rotations, tiny-epsilon cases), pass iff
``||log(T_targ^-1 T)||^2 < 10 * eps_double``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.core import se3
from photometric_bundle_adjustment_tpu.optim import LMConfig, lm_solve

EPS = float(jnp.finfo(jnp.float64).eps)
PI = float(np.pi)


def make_pose(rotvec, trans):
    return se3.make(
        jnp.asarray(trans, jnp.float64), se3.so3_exp(jnp.asarray(rotvec, jnp.float64))
    )


# the 9 cases of test_ceres_se3.cpp:99-119
def se3_cases():
    c = [
        make_pose([0.2, 0.5, 0.0], [0, 0, 0]),
        make_pose([0.2, 0.5, -1.0], [10, 0, 0]),
        make_pose([0.0, 0.0, 0.0], [0, 100, 5]),
        make_pose([0.0, 0.0, 0.00001], [0, 0, 0]),
        make_pose([0.0, 0.0, 0.00001], [0, -0.00000001, 0.0000000001]),
        make_pose([0.0, 0.0, 0.00001], [0.01, 0, 0]),
        make_pose([PI, 0, 0], [4, -5, 0]),
        se3.compose(
            se3.compose(
                make_pose([0.2, 0.5, 0.0], [0, 0, 0]), make_pose([PI, 0, 0], [0, 0, 0])
            ),
            make_pose([-0.2, -0.5, -0.0], [0, 0, 0]),
        ),
        se3.compose(
            se3.compose(
                make_pose([0.3, 0.5, 0.1], [2, 0, -7]), make_pose([PI, 0, 0], [0, 0, 0])
            ),
            make_pose([-0.3, -0.5, -0.1], [0, 6, 0]),
        ),
    ]
    return c


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(size=(100, 6)), jnp.float64)
    xi = xi.at[:, 3:].multiply(0.5)  # log() returns the angle in [0, pi)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-12)


def test_log_exp_roundtrip_poses():
    for T in se3_cases():
        T2 = se3.exp(se3.log(T))
        err = se3.log(se3.compose(se3.inverse(T), T2))
        assert float(jnp.sum(err**2)) < 100 * EPS


def test_compose_inverse_matrix_consistency():
    rng = np.random.default_rng(1)
    xi1 = jnp.asarray(rng.normal(size=(32, 6)), jnp.float64)
    xi2 = jnp.asarray(rng.normal(size=(32, 6)), jnp.float64)
    T1, T2 = se3.exp(xi1), se3.exp(xi2)
    M = se3.to_matrix(se3.compose(T1, T2))
    M2 = se3.to_matrix(T1) @ se3.to_matrix(T2)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M2), atol=1e-12)
    # inverse
    I = se3.to_matrix(se3.compose(T1, se3.inverse(T1)))
    np.testing.assert_allclose(
        np.asarray(I), np.broadcast_to(np.eye(4), (32, 4, 4)), atol=1e-12
    )
    # from_matrix roundtrip
    T1b = se3.from_matrix(se3.to_matrix(T1))
    np.testing.assert_allclose(
        np.asarray(se3.act(T1b, jnp.ones(3))), np.asarray(se3.act(T1, jnp.ones(3))),
        atol=1e-12,
    )


def test_act_matches_matrix():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float64)
    p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float64)
    T = se3.exp(xi)
    out = se3.act(T, p)
    M = se3.to_matrix(T)
    expect = jnp.einsum("bij,bj->bi", M[:, :3, :3], p) + M[:, :3, 3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-12)


def _solve_one(T_targ, T_init):
    """Port of test() in test_ceres_se3.cpp:48-83: minimise
    ||log(T_targ^-1 * T)||^2 over T with right-plus retraction."""
    T_aw = se3.inverse(T_targ)

    def residual(T):
        return se3.log(se3.compose(T_aw, T))

    def retract(T, delta):
        return se3.right_plus(T, delta)

    cfg = LMConfig(
        max_iterations=50,
        function_tolerance=0.01 * EPS,
        gradient_tolerance=0.0,
        parameter_tolerance=0.0,
    )
    T_fin, res = lm_solve(residual, T_init, retract, 6, cfg)
    return T_fin, res


@pytest.mark.parametrize("i", range(9))
def test_se3_manifold_optimization(i):
    cases = se3_cases()
    T_targ = cases[i]
    T_init = cases[(i + 3) % len(cases)]
    T_fin, _ = _solve_one(T_targ, T_init)
    mse = float(jnp.sum(se3.log(se3.compose(se3.inverse(T_targ), T_fin)) ** 2))
    assert mse < 10.0 * EPS, f"case {i}: mse={mse}"


def test_jacobian_through_retraction_finite():
    """jacfwd through right_plus at delta=0 must be NaN-free (the analog of
    instantiating Sophus with ceres::Jet, test_ceres_se3.cpp:129-131)."""
    for T in se3_cases():
        J = jax.jacfwd(lambda d: se3.log(se3.right_plus(T, d)))(jnp.zeros(6))
        assert bool(jnp.all(jnp.isfinite(J)))
