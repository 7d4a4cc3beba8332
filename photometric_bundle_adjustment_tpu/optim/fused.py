"""Fused Schur-LM bundle-adjustment solver driven by host-precomputed plans.

Drop-in alternative to ``optim.ba.make_ba_solver`` for single-device solves:
same problem layout (``ba.BAProblem``), same LM semantics (damped trust
region with accept/reject, Huber IRLS, gauge masking), but the
normal-equation assembly uses the gather/Gram-chunk plans from
``optim.schur_plan`` instead of XLA scatter-adds, and the Schur complement
is assembled directly in camera-pair space so

  * the dense (K*C, L) H_cp matrix never exists,
  * the lambda dependence of the reduced system is analytic
    (S(lam) = H_cc + lam*diag - S_corr0 / (1 + lam)), so each LM retry costs
    one dense Cholesky of the (K*C, K*C) system instead of a full
    (K*C, L) x (L, K*C) matmul.

Measured on TPU v5e at the reference-scale workload (200 cams, 8k landmarks,
49k observations): 8-9 ms per LM iteration vs 15-16 ms for the scatter path
— with matmul precision pinned to float32 (the TPU's default bf16-pass
matmuls perturb the solve by ~4e-2; pinned, it matches the f64 solution to
~8e-5, same as the CPU f32 path).

This replaces the Ceres SPARSE_SCHUR configuration of the reference
(include/visnav/map_utils.h:377-383) for the latency-critical single-chip
path; the scatter-based path in ``optim.ba`` remains the GSPMD-friendly
formulation used by ``parallel.dist_ba``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.optim import ba
from photometric_bundle_adjustment_tpu.optim.schur_plan import (  # noqa: F401
    ChunkPlan,
    SchurPlan,
    build_schur_plan,
)


def plan_for_problem(problem: ba.BAProblem, **kwargs) -> SchurPlan:
    """Build a SchurPlan from a (host-resident) BAProblem."""
    import numpy as np

    K = jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
    L = problem.inv_depth.shape[0]
    return build_schur_plan(
        np.asarray(problem.obs.anchor_cam),
        np.asarray(problem.obs.target_cam),
        np.asarray(problem.obs.landmark),
        K, L,
        valid=np.asarray(problem.obs.valid) != 0,
        **kwargs,
    )


def _chunk_sum(payload, plan: ChunkPlan, n_rows: int):
    """payload (N+1, D) with zero last row -> (n_rows, D)."""
    partial = payload[plan.gidx].sum(axis=1)  # (NC, D)
    out = jnp.zeros((n_rows + 1, payload.shape[1]), payload.dtype)
    return out.at[plan.rows].add(partial)[:n_rows]


def make_fused_ba_solver(
    residual_fn: Callable,
    cam_retract: Callable,
    cam_tangent_dim: int,
    rj_fn: Callable | None = None,
):
    """Returns ``solve(problem, plan, cfg) -> (problem, BAResult)``."""
    C = cam_tangent_dim
    res_cost, _ = ba.make_ba_step(residual_fn, cam_retract, C, rj_fn=rj_fn)

    def _scaled_jacobians(problem: ba.BAProblem, cfg: ba.BAConfig):
        """sqrt(Huber-weight)-scaled [Ja Jc Jp r] rows + robust cost."""
        o = problem.obs
        cam_a = jax.tree_util.tree_map(lambda x: x[o.anchor_cam], problem.cam_states)
        cam_c = jax.tree_util.tree_map(lambda x: x[o.target_cam], problem.cam_states)
        rho = problem.inv_depth[o.landmark]

        if rj_fn is not None:
            r, J = jax.vmap(rj_fn)(cam_a, cam_c, rho, o.aux)
        else:
            def one(ca, cc_, rh, aux):
                def f(d):
                    da, dc, dr = d[:C], d[C:2 * C], d[2 * C]
                    return residual_fn(
                        cam_retract(ca, da), cam_retract(cc_, dc), rh + dr, aux
                    )

                zero = jnp.zeros((2 * C + 1,), problem.inv_depth.dtype)
                return f(zero), jax.jacfwd(f)(zero)

            r, J = jax.vmap(one)(cam_a, cam_c, rho, o.aux)

        vmask = o.valid[:, None] != 0
        r = jnp.where(vmask, r, 0.0)
        J = jnp.where(vmask[:, :, None], J, 0.0)
        r2 = jnp.sum(r * r, axis=-1)
        w = ba._robust_weights(r2, cfg.huber_delta) * o.valid
        cost = ba._robust_cost(r2, cfg.huber_delta)
        sw = jnp.sqrt(w)
        Js = jnp.concatenate([J, r[:, :, None]], axis=-1) * sw[:, None, None]
        return cost, Js  # Js: (O, R, 2C+2)

    def build(problem: ba.BAProblem, plan: SchurPlan, cfg: ba.BAConfig):
        """One normal-equation assembly; everything lambda-independent."""
        K = jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
        L = problem.inv_depth.shape[0]
        o = problem.obs
        O = o.valid.shape[0]
        D = 2 * C + 2

        cost, Js = _scaled_jacobians(problem, cfg)
        dtype = Js.dtype

        # H_cc via camera-pair Gram chunks: the 2C x 2C top-left block of
        # each chunk's Gram matrix holds [Haa Hac; Hca Hcc] for that pair.
        Jpad = jnp.concatenate([Js, jnp.zeros((1,) + Js.shape[1:], dtype)])
        rows = Jpad[plan.pg]  # (NCp, Bp, R, D)
        rows2 = rows[..., : 2 * C].reshape(rows.shape[0], -1, 2 * C)
        G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)  # (NCp, 2C, 2C)
        blocks = jnp.stack(
            [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C], G2[:, C:, C:]],
            axis=1,
        ).reshape(-1, C * C)  # (NCp*4, C*C)
        H_cc = (
            jnp.zeros((K * K + 1, C * C), dtype)
            .at[plan.cc_rows4.reshape(-1)]
            .add(blocks)[: K * K]
            .reshape(K, K, C, C)
        )

        # thin couplings: A[o] = Js[o]^T [swJp, swr] -> (O, D, 2)
        right = Js[:, :, 2 * C :]  # (O, R, 2)
        A = jnp.einsum("ori,ors->ois", Js, right)

        # landmark reductions: anchor-merged Hap, H_pp, g_p in one pass
        pay_l = jnp.concatenate(
            [A[:, :C, 0], A[:, 2 * C : 2 * C + 1, 0], A[:, 2 * C : 2 * C + 1, 1]],
            axis=1,
        )  # (O, C+2)
        pay_l = jnp.concatenate([pay_l, jnp.zeros((1, C + 2), dtype)])
        red_l = _chunk_sum(pay_l, plan.lm, L)
        anchor_v, H_pp, g_p = red_l[:, :C], red_l[:, C], red_l[:, C + 1]

        # g_c
        pay_gc = jnp.concatenate([A[:, :C, 1], A[:, C : 2 * C, 1]])
        pay_gc = jnp.concatenate([pay_gc, jnp.zeros((1, C), dtype)])
        g_c = _chunk_sum(pay_gc, plan.gc, K)

        # Schur correction in camera-pair space
        lm_mask = problem.lm_valid.astype(dtype)
        inv0 = lm_mask / jnp.maximum(H_pp, cfg.min_inv_depth_hessian)
        v = jnp.concatenate(
            [anchor_v, A[:, C : 2 * C, 0], jnp.zeros((1, C), dtype)]
        )  # (NE+1, C); target couplings Hcp per obs
        ew = jnp.concatenate([inv0[plan.entry_lm], jnp.zeros((1,), dtype)])
        w1 = v * ew[:, None]
        r1 = w1[plan.pr_e1]  # (NCpr, Bpr, C)
        r2_ = v[plan.pr_e2]
        Gp = jnp.einsum("nbi,nbj->nij", r1, r2_).reshape(-1, C * C)
        U = (
            jnp.zeros((K * K + 1, C * C), dtype)
            .at[plan.pr_rows]
            .add(Gp)[: K * K]
            .reshape(K, K, C, C)
        )
        vv, wd = v[:-1], w1[:-1]
        pay_dg = (wd[:, :, None] * vv[:, None, :]).reshape(-1, C * C)
        pay_dg = jnp.concatenate([pay_dg, jnp.zeros((1, C * C), dtype)])
        Dg = _chunk_sum(pay_dg, plan.dg, K * K).reshape(K, K, C, C)
        S_corr0 = U + jnp.transpose(U, (1, 0, 3, 2)) + Dg

        # rhs correction sum_l inv0_l g_p_l c_l
        pay_rc = wd * g_p[plan.entry_lm][:, None]
        pay_rc = jnp.concatenate([pay_rc, jnp.zeros((1, C), dtype)])
        rhs_corr0 = _chunk_sum(pay_rc, plan.ec, K)

        return cost, (H_cc, S_corr0, rhs_corr0, H_pp, g_c, g_p, v, inv0)

    def solve_lam(neq, plan: SchurPlan, lam, free_cam_mask, cfg: ba.BAConfig):
        """Per-lambda dense solve + back-substitution (cheap retry)."""
        H_cc, S_corr0, rhs_corr0, H_pp, g_c, g_p, v, inv0 = neq
        K, _, C_, _ = H_cc.shape
        L = H_pp.shape[0]
        dtype = g_c.dtype
        H_cc_mat = jnp.transpose(H_cc, (0, 2, 1, 3)).reshape(K * C_, K * C_)
        S0_mat = jnp.transpose(S_corr0, (0, 2, 1, 3)).reshape(K * C_, K * C_)
        d_cc = jnp.clip(jnp.diagonal(H_cc_mat), 1e-12, 1e32)
        S = H_cc_mat + jnp.diag(lam * d_cc) - S0_mat / (1.0 + lam)
        rhs = -(g_c.reshape(-1) - rhs_corr0.reshape(-1) / (1.0 + lam))
        mask = jnp.repeat(free_cam_mask.astype(dtype), C_)
        S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        cho = jax.scipy.linalg.cho_factor(S, lower=True)
        delta_c = jax.scipy.linalg.cho_solve(cho, rhs * mask) * mask

        dc_mat = delta_c.reshape(K, C_)
        dot_e = jnp.sum(v[:-1] * dc_mat[plan.entry_cam], axis=-1)  # (NE,)
        anchor_part = dot_e[:L]
        pay = jnp.concatenate([dot_e[L:, None], jnp.zeros((1, 1), dtype)])
        target_part = _chunk_sum(pay, plan.lm, L)[:, 0]
        delta_p = -(g_p + anchor_part + target_part) * inv0 / (1.0 + lam)
        return dc_mat, delta_p

    def apply_step(problem: ba.BAProblem, delta_c, delta_p):
        new_cams = jax.vmap(cam_retract)(problem.cam_states, delta_c)
        return problem._replace(
            cam_states=new_cams, inv_depth=problem.inv_depth + delta_p
        )

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def solve(problem: ba.BAProblem, plan: SchurPlan,
              cfg: ba.BAConfig = ba.BAConfig()):
        with jax.default_matmul_precision("float32"):
            free = ~problem.fixed_cams
            init_cost = res_cost(problem, cfg)
            dtype = problem.inv_depth.dtype

            def body(state):
                prob, lam, cost, it, done = state
                _, neq = build(prob, plan, cfg)

                def try_step(lam_try):
                    dc, dp = solve_lam(neq, plan, lam_try, free, cfg)
                    p_try = apply_step(prob, dc, dp)
                    return p_try, res_cost(p_try, cfg)

                def inner_cond(s):
                    lam_i, ok, _, tries = s
                    return (~ok) & (tries < cfg.max_retries) & (
                        lam_i <= cfg.max_lambda
                    )

                def inner_body(s):
                    lam_i, _, _, tries = s
                    _, new_cost = try_step(lam_i)
                    ok = (new_cost < cost) & jnp.isfinite(new_cost)
                    return (
                        jnp.where(ok, lam_i, lam_i * 10.0), ok, new_cost,
                        tries + 1,
                    )

                lam_f, accepted, new_cost, _ = jax.lax.while_loop(
                    inner_cond, inner_body, (lam, False, cost, 0)
                )
                p_acc, acc_cost = try_step(lam_f)
                p_new = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accepted, a, b), p_acc, prob
                )
                cost_new = jnp.where(accepted, acc_cost, cost)
                lam_new = jnp.where(
                    accepted, jnp.maximum(lam_f / 3.0, cfg.min_lambda), lam_f
                )
                small = jnp.abs(cost - cost_new) <= (
                    cfg.function_tolerance * jnp.maximum(cost, 1e-300)
                )
                done_new = (~accepted) | small
                return (p_new, lam_new, cost_new, it + 1, done_new)

            def cond(state):
                _, _, _, it, done = state
                return (~done) & (it < cfg.max_iterations)

            state0 = (
                problem,
                jnp.asarray(cfg.init_lambda, dtype),
                init_cost,
                jnp.asarray(0),
                jnp.asarray(False),
            )
            prob, lam, cost, iters, _ = jax.lax.while_loop(cond, body, state0)
            return prob, ba.BAResult(
                cost=cost, initial_cost=init_cost, iterations=iters, lam=lam
            )

    # expose the pieces for benchmarking / custom loops
    solve.build = build
    solve.solve_lam = solve_lam
    return solve
