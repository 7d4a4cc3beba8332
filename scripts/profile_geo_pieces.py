"""Marginal piece timings INSIDE build_geo_dense: time partial builds that
stop after each stage; differences are the marginal cost of each stage
(fusion makes them non-additive, but the deltas localize the copies)."""
import sys

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.ops import geo_mega
from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)
from scripts.devtime import devtime

C = 6


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "pinhole"
    problem, _, _ = synthetic.synth_ba_problem(
        model=model, K=200, L=8192, obs_per_landmark=6,
        pixel_noise=0.3, dtype=jnp.float32,
    )
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0,
                      schur_matmul_precision="high")
    problem, plan = fused.densify_problem(problem, pow2_buckets=False)
    consts = geo_mega.build_geo_consts(model, problem)
    K = problem.cam_states.shape[0] if hasattr(problem.cam_states, "shape") \
        else jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
    L = problem.inv_depth.shape[0]

    def upto(stage):
        def f(problem):
            with jax.default_matmul_precision("float32"):
                cost, plane = geo_mega._geo_payload(
                    model, problem, consts, cfg
                )
                dtype = plane.dtype
                if stage == "payload":
                    return cost, plane
                outT = plane.T
                if stage == "transpose":
                    return cost, outT
                outTp = jnp.pad(outT, ((0, 1), (0, 0)))
                if stage == "pad":
                    return cost, outTp
                rows = outTp[:, :26][jnp.asarray(plan.pg)]
                if stage == "pg_gather":
                    return cost, rows
                rows2 = rows.reshape(rows.shape[0], -1, 13)[..., :12]
                G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)
                if stage == "pair_gram":
                    return cost, G2
                blocks = jnp.stack(
                    [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C],
                     G2[:, C:, C:]], axis=1,
                ).reshape(-1, C * C)
                H_cc = (
                    jnp.zeros((K * K + 1, C * C), dtype)
                    .at[jnp.asarray(plan.cc_rows4).reshape(-1)]
                    .add(blocks)[: K * K]
                    .reshape(K, K, C, C)
                )
                if stage == "hcc":
                    return cost, H_cc
                S_ = plan.lm_cam.shape[0]
                A0r = outT[:, 29:42].reshape(S_, L, 13)
                A1r = outT[:, 42:55]
                red0 = A0r.sum(0)
                anchor_v = red0[:, :C]
                H_pp = red0[:, 12]
                g_p = A1r[:, 12].reshape(S_, L).sum(0)
                iot = jnp.arange(K, dtype=jnp.int32)
                man = (jnp.asarray(plan.obs_anchor_cam)[:, None] == iot
                       ).astype(dtype)
                mtn = (jnp.asarray(plan.obs_target_cam)[:, None] == iot
                       ).astype(dtype)
                g_c = (jnp.sum(man[:, :, None] * A1r[:, None, :C], axis=0)
                       + jnp.sum(mtn[:, :, None] * A1r[:, None, C:2 * C],
                                 axis=0))
                if stage == "red":
                    return cost, (H_cc, anchor_v, H_pp, g_p, g_c)
                lm_mask = problem.lm_valid.astype(dtype)
                inv0 = lm_mask / jnp.maximum(
                    H_pp, cfg.min_inv_depth_hessian
                )
                vt_sl = A0r[:, :, C:2 * C]
                msk = (jnp.asarray(plan.lm_cam)[:, :, None] == iot
                       ).astype(dtype)
                M = jnp.sum(msk[..., None] * vt_sl[:, :, None, :], axis=0)
                amsk = (jnp.asarray(plan.anchor_cam_of_lm)[:, None] == iot
                        ).astype(dtype)
                M = (M + amsk[:, :, None] * anchor_v[:, None, :]
                     ).reshape(L, K * C)
                if stage == "m":
                    return cost, (H_cc, M, g_c)
                S_corr0, rhs_corr0 = geo_mega._schur_corr(M, g_p, inv0, cfg)
                return cost, (H_cc, S_corr0, rhs_corr0, g_c)
        return jax.jit(f)

    for st in ["payload", "transpose", "pad", "pg_gather", "pair_gram",
               "hcc", "red", "m", "full"]:
        devtime(upto(st), problem, label=f"upto {st}")


if __name__ == "__main__":
    main()
