"""Parity tests for the fused photometric megakernel (ops/pba_mega.py).

The megakernel must reproduce the gather-sampler reference formulation
(models/photometric_ba.py + optim/fused.py build_dense) — same residuals,
same Jacobians, same normal equations, same LM decisions.  Runs the Pallas
kernel in interpreter mode on CPU (tests/conftest.py pins JAX_PLATFORMS=cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.core import camera_slab, cameras
from photometric_bundle_adjustment_tpu.models import photometric_ba as pba
from photometric_bundle_adjustment_tpu.models import synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.ops import pba_mega


# ---------------------------------------------------------------------------
# slab projection Jacobians vs autodiff (f64 golden)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("model", ["pinhole", "eucm", "ds", "kb4"])
def test_camera_slab_jacobian_matches_autodiff(model):
    rng = np.random.default_rng(3)
    N = 64
    pts = rng.normal(size=(N, 3))
    pts[:, 2] = np.abs(pts[:, 2]) + 0.5          # in front of the camera
    intr = np.asarray(cameras.test_params(model, jnp.float64))
    intr_slab = jnp.asarray(np.tile(intr[:, None], (1, N)))

    qx = jnp.asarray(pts[None, :, 0])            # (1, N) planes
    qy = jnp.asarray(pts[None, :, 1])
    qz = jnp.asarray(pts[None, :, 2])
    u, v, J0, J1 = camera_slab.project_slab(model, intr_slab, qx, qy, qz)

    ref_uv = np.asarray(cameras.project(model, jnp.asarray(intr),
                                        jnp.asarray(pts)))
    Jref = np.asarray(jax.vmap(
        jax.jacfwd(lambda p: cameras.project(model, jnp.asarray(intr), p))
    )(jnp.asarray(pts)))                         # (N, 2, 3)

    np.testing.assert_allclose(np.asarray(u)[0], ref_uv[:, 0], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v)[0], ref_uv[:, 1], rtol=1e-10)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(J0[c])[0], Jref[:, 0, c], rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(J1[c])[0], Jref[:, 1, c], rtol=1e-7, atol=1e-9
        )


# ---------------------------------------------------------------------------
# full build parity vs the gather-sampler dense build
# ---------------------------------------------------------------------------


def _small_problem(model="pinhole", K=12, L=48, obs_per_lm=3, H=64, W=96,
                   seed=0):
    from scripts.profile_pba import build_euroc_scale_pba

    problem, images_flat, H, W = build_euroc_scale_pba(
        K=K, L=L, obs_per_lm=obs_per_lm, H=H, W=W, seed=seed,
        dtype=jnp.float32,
    )
    return problem, images_flat, H, W


def test_mega_build_matches_gather_build():
    model = "pinhole"
    problem, images_flat, H, W = _small_problem()
    cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0,
                      schur_matmul_precision="highest")
    problem2, plan = fused.densify_problem(problem, pow2_buckets=False)
    n_images = problem2.cam_states.pose.shape[0]

    gather = pba.make_fused_solver(model, images_flat, H, W)
    with jax.default_matmul_precision("float32"):
        ref_cost, ref_neq = gather.build(problem2, plan, cfg)

    mega = pba_mega.make_mega_solver(
        model, images_flat, H, W, problem2, n_images, plan, interpret=True
    )
    # golden neq comparison against the V1 assembly contract (the solver
    # itself now runs the v2 assembly; v2-vs-v1 parity is tested at the
    # damped-solve output in test_mega2_matches_mega_deltas)
    with jax.default_matmul_precision("float32"):
        cost, neq = pba_mega.build_mega(
            model, mega.images_pad, problem2, mega.consts, mega.plan,
            cfg, HW=mega.HW, interpret=True,
        )

    np.testing.assert_allclose(float(cost), float(ref_cost), rtol=2e-4)
    names = ["H_cc", "S_corr0", "rhs_corr0", "H_pp", "g_c", "g_p", "M",
             "inv0"]
    for name, a, b in zip(names, neq, ref_neq):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, atol=3e-3 * scale, rtol=2e-3,
            err_msg=f"neq piece {name} diverges from the gather build",
        )


def test_mega_build_matches_gather_build_ds():
    """Same parity on the double-sphere model (the EuRoC pipeline model)."""
    model = "ds"
    problem, images_flat, H, W = _small_problem(K=12, L=32, obs_per_lm=2)
    # swap intrinsics for ds test params scaled into the image
    intr = np.array(cameras.test_params("ds", jnp.float32))
    intr[0] = 60.0
    intr[1] = 60.0
    intr[2] = W / 2
    intr[3] = H / 2
    O = problem.obs.valid.shape[0]
    aux = problem.obs.aux._replace(
        intr_ref=jnp.tile(jnp.asarray(intr), (O, 1)),
        intr_target=jnp.tile(jnp.asarray(intr), (O, 1)),
    )
    # re-extract reference patches under the new intrinsics (content
    # irrelevant; consistency is what matters)
    problem = problem._replace(obs=problem.obs._replace(aux=aux))

    cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0,
                      schur_matmul_precision="highest")
    problem2, plan = fused.densify_problem(problem, pow2_buckets=False)
    n_images = problem2.cam_states.pose.shape[0]

    gather = pba.make_fused_solver(model, images_flat, H, W)
    with jax.default_matmul_precision("float32"):
        ref_cost, ref_neq = gather.build(problem2, plan, cfg)

    mega = pba_mega.make_mega_solver(
        model, images_flat, H, W, problem2, n_images, plan, interpret=True
    )
    # golden neq comparison against the V1 assembly contract (the solver
    # itself now runs the v2 assembly; v2-vs-v1 parity is tested at the
    # damped-solve output in test_mega2_matches_mega_deltas)
    with jax.default_matmul_precision("float32"):
        cost, neq = pba_mega.build_mega(
            model, mega.images_pad, problem2, mega.consts, mega.plan,
            cfg, HW=mega.HW, interpret=True,
        )

    np.testing.assert_allclose(float(cost), float(ref_cost), rtol=2e-4)
    for a, b in zip(neq, ref_neq):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=3e-3 * scale, rtol=2e-3)


def test_mega_chunk_build_matches_gather_build():
    """Chunk-plan assembly (the real-map layout: valid observations only,
    no slot densification) must match the gather-sampler chunk build."""
    model = "pinhole"
    problem, images_flat, H, W = _small_problem(seed=2)
    cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0,
                      schur_matmul_precision="highest")
    n_images = problem.cam_states.pose.shape[0]

    gather = pba.make_fused_solver(model, images_flat, H, W)
    plan = fused.plan_for_problem(problem, host=False, pow2_buckets=False)
    with jax.default_matmul_precision("float32"):
        ref_cost, ref_neq = gather.build(problem, plan, cfg)

    mega = pba_mega.make_mega_solver(
        model, images_flat, H, W, problem, n_images, interpret=True
    )
    cost, neq = mega.build(problem, cfg)

    np.testing.assert_allclose(float(cost), float(ref_cost), rtol=2e-4)
    names = ["H_cc", "S_corr0", "rhs_corr0", "H_pp", "g_c", "g_p", "M",
             "inv0"]
    for name, a, b in zip(names, neq, ref_neq):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, atol=3e-3 * scale, rtol=2e-3,
            err_msg=f"chunk neq piece {name} diverges from the gather build",
        )


def test_mega_chunk_solve_matches_dense_mega():
    """The two mega assemblies (dense slot-major vs chunked group-order)
    must produce the same LM trajectory on the same problem."""
    model = "pinhole"
    problem, images_flat, H, W = _small_problem(seed=3)
    cfg = ba.BAConfig(max_iterations=3, huber_delta=9.0,
                      schur_matmul_precision="highest", cost_from_build=True)
    n_images = problem.cam_states.pose.shape[0]

    problem_d, plan_d = fused.densify_problem(problem, pow2_buckets=False)
    mega_d = pba_mega.make_mega_solver(
        model, images_flat, H, W, problem_d, n_images, plan_d,
        interpret=True,
    )
    prob_d, res_d = mega_d(problem_d, cfg)

    mega_c = pba_mega.make_mega_solver(
        model, images_flat, H, W, problem, n_images, interpret=True
    )
    prob_c, res_c = mega_c(problem, cfg)

    np.testing.assert_allclose(
        float(res_c.initial_cost), float(res_d.initial_cost), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(res_c.cost), float(res_d.cost), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(prob_c.cam_states.pose),
        np.asarray(prob_d.cam_states.pose), atol=1e-4,
    )


def test_mega_solve_reduces_cost_like_gather():
    model = "pinhole"
    problem, images_flat, H, W = _small_problem(seed=1)
    cfg = ba.BAConfig(max_iterations=4, huber_delta=9.0,
                      schur_matmul_precision="highest", cost_from_build=True)
    problem2, plan = fused.densify_problem(problem, pow2_buckets=False)
    n_images = problem2.cam_states.pose.shape[0]

    # perturb poses so there is something to optimise
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 1e-3, (n_images, 6))
    noise[:2] = 0.0
    from photometric_bundle_adjustment_tpu.core import se3

    poses = np.asarray(problem2.cam_states.pose)
    pert = np.asarray(jax.vmap(se3.right_plus)(
        jnp.asarray(poses), jnp.asarray(noise, jnp.float32)))
    problem2 = problem2._replace(
        cam_states=problem2.cam_states._replace(
            pose=jnp.asarray(pert, jnp.float32))
    )

    gather = pba.make_fused_solver(model, images_flat, H, W)
    ref_prob, ref_res = gather(problem2, plan, cfg)

    mega = pba_mega.make_mega_solver(
        model, images_flat, H, W, problem2, n_images, plan, interpret=True
    )
    prob, res = mega(problem2, cfg)

    assert float(res.cost) < float(res.initial_cost)
    np.testing.assert_allclose(
        float(res.initial_cost), float(ref_res.initial_cost), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(res.cost), float(ref_res.cost), rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(prob.cam_states.pose), np.asarray(ref_prob.cam_states.pose),
        atol=1e-4,
    )


def test_mega_build_bf16_tier():
    """bf16 sampling (cfg.sample_bf16): uint8 intensities are exact in
    bf16 and only the bilinear y-taps round (<=2^-8 relative), so the
    build must agree with the f32 kernel at a grey-level-scale tolerance
    and the normal equations at ~1% (VERDICT r3 #2 tolerance tier)."""
    model = "pinhole"
    problem, images_flat, H, W = _small_problem(seed=4)
    cfg32 = ba.BAConfig(max_iterations=1, huber_delta=9.0,
                        schur_matmul_precision="highest")
    cfg16 = cfg32._replace(sample_bf16=True)
    n_images = problem.cam_states.pose.shape[0]

    mega = pba_mega.make_mega_solver(
        model, images_flat, H, W, problem, n_images, interpret=True
    )
    cost32, neq32 = mega.build(problem, cfg32)
    cost16, neq16 = mega.build(problem, cfg16)

    np.testing.assert_allclose(float(cost16), float(cost32), rtol=2e-2)
    names = ["H_cc", "S_corr0", "rhs_corr0", "H_pp", "g_c", "g_p", "M",
             "inv0"]
    for name, a, b in zip(names, neq16, neq32):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, atol=3e-2 * scale, rtol=5e-2,
            err_msg=f"bf16 neq piece {name} diverges beyond the tier",
        )


def test_mega2_matches_mega_deltas():
    """Round-5 v2 assembly (build_mega2 + solve_lam2: p-major kernel rows,
    exact compare-reduce lifts, sqrt(inv0)-scaled coupling) produces the
    same cost and matching damped-solve deltas as v1."""
    problem, images_flat, H, W, _, _ = synthetic.synth_pba_problem(
        K=6, L=64, dtype=jnp.float32, seed=4
    )
    problem, dplan = fused.densify_problem(problem, pow2_buckets=False)
    n_images = problem.cam_states.pose.shape[0]
    mega = pba_mega.make_mega_solver(
        "pinhole", images_flat, H, W, problem, n_images, dplan,
        interpret=True,
    )
    cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0,
                      schur_matmul_precision="highest")
    lam = jnp.asarray(1e-4, jnp.float32)
    free = ~problem.fixed_cams
    with jax.default_matmul_precision("float32"):
        c1, neq1 = pba_mega.build_mega(
            "pinhole", mega.images_pad, problem, mega.consts, mega.plan,
            cfg, HW=mega.HW, interpret=True,
        )
        dc1, dp1 = pba_mega.solve_lam(neq1, lam, free, cfg)
        c2, neq2 = pba_mega.build_mega2(
            "pinhole", mega.images_pad, problem, mega.consts, mega.plan,
            cfg, HW=mega.HW, interpret=True,
        )
        dc2, dp2 = pba_mega.solve_lam2(neq2, lam, free, cfg)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-6)
    sc = max(float(jnp.abs(dc1).max()), 1e-9)
    sp = max(float(jnp.abs(dp1).max()), 1e-9)
    np.testing.assert_allclose(np.asarray(dc2), np.asarray(dc1),
                               atol=2e-3 * sc)
    np.testing.assert_allclose(np.asarray(dp2), np.asarray(dp1),
                               atol=2e-3 * sp)
