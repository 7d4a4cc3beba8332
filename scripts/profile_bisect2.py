"""Bisect the current fused build via early returns."""
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
C, K, L = 6, 200, 8192
dtype = jnp.float32
plan = fused.plan_for_problem(problem, pow2_buckets=False)
solver = fused.make_fused_ba_solver(residual_fn, geometric_ba.cam_retract, 6)


def scaled_jacobians(p):
    o = p.obs
    npad = 8 - (o.valid.shape[0] % 8)

    def pad1(x):
        return jnp.concatenate([x, jnp.zeros((npad,) + x.shape[1:], x.dtype)])

    obs_p = jax.tree_util.tree_map(pad1, o)
    cam_a = jax.tree_util.tree_map(lambda x: x[obs_p.anchor_cam], p.cam_states)
    cam_c = jax.tree_util.tree_map(lambda x: x[obs_p.target_cam], p.cam_states)
    rho = p.inv_depth[obs_p.landmark]

    def one(ca, cc_, rh, aux):
        def f(d):
            da, dc, dr = d[:C], d[C:2 * C], d[2 * C]
            return residual_fn(
                geometric_ba.cam_retract(ca, da),
                geometric_ba.cam_retract(cc_, dc), rh + dr, aux)
        zero = jnp.zeros((2 * C + 1,), dtype)
        return f(zero), jax.jacfwd(f)(zero)

    r, J = jax.vmap(one)(cam_a, cam_c, rho, obs_p.aux)
    vmask = obs_p.valid[:, None] != 0
    r = jnp.where(vmask, r, 0.0)
    J = jnp.where(vmask[:, :, None], J, 0.0)
    r2 = jnp.sum(r * r, axis=-1)
    w = ba._robust_weights(r2, cfg.huber_delta) * obs_p.valid
    cost = ba._robust_cost(r2, cfg.huber_delta)
    sw = jnp.sqrt(w)
    return cost, J * sw[:, None, None], r * sw[:, None]


def upto(stage):
    def f(p):
        cost, Jsw, rsw = scaled_jacobians(p)
        if stage == "js":
            return cost, Jsw, rsw
        rows = Jsw[plan.pg]
        rows2 = rows[..., : 2 * C].reshape(rows.shape[0], -1, 2 * C)
        G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)
        blocks = jnp.stack(
            [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C], G2[:, C:, C:]],
            axis=1).reshape(-1, C * C)
        H_cc = (jnp.zeros((K * K + 1, C * C), dtype)
                .at[plan.cc_rows4.reshape(-1)].add(blocks)[: K * K]
                .reshape(K, K, C, C))
        if stage == "hcc":
            return cost, H_cc
        right = jnp.stack([Jsw[:, :, 2 * C], rsw], axis=-1)
        A = jnp.einsum("ori,ors->ois", Jsw, right)
        if stage == "A":
            return cost, H_cc, A
        pay_l = jnp.concatenate(
            [A[:, :C, 0], A[:, 2 * C:2 * C + 1, 0], A[:, 2 * C:2 * C + 1, 1]],
            axis=1)
        red_l = fused._chunk_sum(pay_l, plan.lm, L)
        anchor_v, H_pp, g_p = red_l[:, :C], red_l[:, C], red_l[:, C + 1]
        g_c = (fused._chunk_sum(A[:, :C, 1], plan.gc_a, K)
               + fused._chunk_sum(A[:, C:2 * C, 1], plan.gc_t, K))
        if stage == "sums":
            return cost, H_cc, anchor_v, H_pp, g_p, g_c
        lm_mask = p.lm_valid.astype(dtype)
        inv0 = lm_mask / jnp.maximum(H_pp, cfg.min_inv_depth_hessian)
        vt = A[:, C:2 * C, 0]
        rows_t = vt[plan.lm.gidx]
        oh = jax.nn.one_hot(plan.lm_cam, K, dtype=dtype)
        part = jnp.einsum("nbk,nbc->nkc", oh, rows_t)
        M = (jnp.zeros((L + 1, K * C), dtype)
             .at[plan.lm.rows].add(part.reshape(part.shape[0], K * C))[:L])
        oh_a = jax.nn.one_hot(plan.anchor_cam_of_lm, K, dtype=dtype)
        M = M + (oh_a[:, :, None] * anchor_v[:, None, :]).reshape(L, K * C)
        if stage == "M":
            return cost, H_cc, M
        Mw = M * inv0[:, None]
        S_corr0 = Mw.T @ M
        rhs_corr0 = Mw.T @ g_p
        H_cc_mat = jnp.transpose(H_cc, (0, 2, 1, 3)).reshape(K * C, K * C)
        return cost, (H_cc_mat, S_corr0, rhs_corr0, H_pp, g_c, g_p, M, inv0)
    return f


with jax.default_matmul_precision("float32"):
    for stage in ["js", "hcc", "A", "sums", "M", "all"]:
        devtime(upto(stage), problem, label=f"build upto {stage}")
    lam = jnp.asarray(1e-4, dtype)
    free = ~problem.fixed_cams
    cost, neq = jax.jit(lambda p: solver.build(p, plan, cfg))(problem)
    devtime(lambda n: solver.solve_lam(n, plan, lam, free, cfg), neq,
            label="solve_lam")
