"""Piece timing of the dense-M fused build."""
import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.utils.runtime import enable_compilation_cache
from scripts.devtime import devtime

enable_compilation_cache()
print("backend:", jax.default_backend())

problem, _, _ = synthetic.synth_ba_problem(
    model="pinhole", K=200, L=8192, obs_per_landmark=6, pixel_noise=0.3,
    dtype=jnp.float32,
)
cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0)
residual_fn = geometric_ba.make_residual_fn("pinhole")
solver = fused.make_fused_ba_solver(residual_fn, geometric_ba.cam_retract, 6)
plan = fused.plan_for_problem(problem, pow2_buckets=False)
C, K, L = 6, 200, 8192
dtype = jnp.float32
cost, neq = jax.jit(lambda p: solver.build(p, plan, cfg))(problem)
lam = jnp.asarray(1e-4, dtype)
free = ~problem.fixed_cams
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (problem.obs.valid.shape[0], 2 * C + 2, 2), dtype)
anchor_v = jax.random.normal(key, (L, C), dtype)
g_p = jax.random.normal(key, (L,), dtype)
inv0_ = jnp.abs(jax.random.normal(key, (L,), dtype))


def piece_M(A, anchor_v):
    vt = jnp.concatenate([A[:, C:2 * C, 0], jnp.zeros((1, C), dtype)])
    rows_t = vt[plan.lm.gidx]
    oh = jax.nn.one_hot(plan.lm_cam, K, dtype=dtype)
    part = jnp.einsum("nbk,nbc->nkc", oh, rows_t)
    M = (jnp.zeros((L + 1, K * C), dtype)
         .at[plan.lm.rows].add(part.reshape(part.shape[0], K * C))[:L])
    oh_a = jax.nn.one_hot(plan.anchor_cam_of_lm, K, dtype=dtype)
    return M + (oh_a[:, :, None] * anchor_v[:, None, :]).reshape(L, K * C)


M = jax.jit(piece_M)(A, anchor_v)


def piece_corr(M, inv0_, g_p):
    Mw = M * inv0_[:, None]
    return Mw.T @ M, Mw.T @ g_p


def piece_solve(neq):
    return solver.solve_lam(neq, plan, lam, free, cfg)


with jax.default_matmul_precision("float32"):
    devtime(piece_M, A, anchor_v, label="M build (onehot einsum+scatter)")
    devtime(piece_corr, M, inv0_, g_p, label="S_corr0 + rhs matmuls [f32]")
    with jax.default_matmul_precision("tensorfloat32"):
        devtime(piece_corr, M, inv0_, g_p, label="S_corr0 + rhs matmuls [tf32]")
    devtime(piece_solve, neq, label="solve_lam v2")
    devtime(lambda p: solver.build(p, plan, cfg), problem, label="full build v2")
