"""Bisect the slot-major dense fused build (optim/fused.py build_dense)
via early returns — piece timings on device at bench scale.

NOTE: the staged pieces inside ``upto`` deliberately mirror
optim/fused.py ``build_dense`` (as of the slot-major layout, commit
"slot-major landmark-dense layout") so that each early return times a
prefix of the real build.  If ``build_dense`` changes, re-sync this file
or the stage timings stop corresponding to production code.
"""
import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)
from scripts.devtime import devtime

enable_compilation_cache()
print("backend:", jax.default_backend())

K, L = 200, 8192
problem, _, _ = synthetic.synth_ba_problem(
    model="pinhole", K=K, L=L, obs_per_landmark=6, pixel_noise=0.3,
    dtype=jnp.float32,
)
cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0,
                  schur_matmul_precision="high")
residual_fn = geometric_ba.make_residual_fn("pinhole")
C = 6  # per-camera tangent dim (SE3)
dtype = jnp.float32
problem, plan = fused.densify_problem(problem, pow2_buckets=False)
solver = fused.make_fused_ba_solver(residual_fn, geometric_ba.cam_retract, C)
W = 2 * C + 1
S_ = plan.lm_cam.shape[0]
print("S =", S_, "Opad =", problem.obs.valid.shape[0])


def scaled_jacobians_flat(p):
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
        return f(zero), jax.jacfwd(f)(zero).reshape(-1)

    r, J2 = jax.vmap(one)(cam_a, cam_c, rho, obs_p.aux)
    vmask = obs_p.valid[:, None] != 0
    r = jnp.where(vmask, r, 0.0)
    J2 = jnp.where(vmask, J2, 0.0)
    r2 = jnp.sum(r * r, axis=-1)
    w = ba._robust_weights(r2, cfg.huber_delta) * obs_p.valid
    cost = ba._robust_cost(r2, cfg.huber_delta)
    sw = jnp.sqrt(w)
    return cost, J2 * sw[:, None], r * sw[:, None]


def upto(stage):
    def f(p):
        cost, J2, rsw = scaled_jacobians_flat(p)
        R = rsw.shape[1]
        if stage == "js":
            return cost, J2, rsw
        rows = J2[plan.pg]
        rows2 = rows.reshape(rows.shape[0], -1, W)[..., : 2 * C]
        G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)
        blocks = jnp.stack(
            [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C], G2[:, C:, C:]],
            axis=1).reshape(-1, C * C)
        H_cc = (jnp.zeros((K * K + 1, C * C), dtype)
                .at[plan.cc_rows4.reshape(-1)].add(blocks)[: K * K]
                .reshape(K, K, C, C))
        if stage == "hcc":
            return cost, H_cc
        Jp = jnp.stack([J2[:, r * W + 2 * C] for r in range(R)], axis=-1)
        A0 = sum(J2[:, r * W:(r + 1) * W] * Jp[:, r:r + 1] for r in range(R))
        A1 = sum(J2[:, r * W:(r + 1) * W] * rsw[:, r:r + 1] for r in range(R))
        if stage == "A":
            return cost, H_cc, A0, A1
        A0s = A0[: S_ * L].reshape(S_, L, W)
        red0 = A0s.sum(0)
        anchor_v = red0[:, :C]
        H_pp = red0[:, 2 * C]
        g_p = A1[: S_ * L, 2 * C].reshape(S_, L).sum(0)
        if stage == "sums":
            return cost, H_cc, anchor_v, H_pp, g_p
        oh_an = jax.nn.one_hot(plan.obs_anchor_cam, K, dtype=dtype)
        oh_tn = jax.nn.one_hot(plan.obs_target_cam, K, dtype=dtype)
        Av = A1[: S_ * L]
        g_c = oh_an.T @ Av[:, :C] + oh_tn.T @ Av[:, C:2 * C]
        if stage == "gc":
            return cost, H_cc, g_c
        lm_mask = p.lm_valid.astype(dtype)
        inv0 = lm_mask / jnp.maximum(H_pp, cfg.min_inv_depth_hessian)
        vt_sl = A0s[:, :, C:2 * C]
        oh = jax.nn.one_hot(plan.lm_cam, K, dtype=dtype)
        M = jnp.einsum("slk,slc->lkc", oh, vt_sl).reshape(L, K * C)
        oh_a = jax.nn.one_hot(plan.anchor_cam_of_lm, K, dtype=dtype)
        M = M + (oh_a[:, :, None] * anchor_v[:, None, :]).reshape(L, K * C)
        if stage == "M":
            return cost, H_cc, M
        Mw = M * inv0[:, None]
        S_corr0 = jax.lax.dot(Mw.T, M, precision=jax.lax.Precision.HIGH)
        rhs_corr0 = Mw.T @ g_p
        H_cc_mat = jnp.transpose(H_cc, (0, 2, 1, 3)).reshape(K * C, K * C)
        return cost, (H_cc_mat, S_corr0, rhs_corr0, H_pp, g_c, g_p, M, inv0)
    return f


with jax.default_matmul_precision("float32"):
    for stage in ["js", "hcc", "A", "sums", "gc", "M", "all"]:
        devtime(upto(stage), problem, label=f"build upto {stage}")
    lam = jnp.asarray(1e-4, dtype)
    free = ~problem.fixed_cams
    cost, neq = jax.jit(lambda p: solver.build(p, plan, cfg))(problem)
    devtime(lambda n: solver.solve_lam(n, plan, lam, free, cfg), neq,
            label="solve_lam")
