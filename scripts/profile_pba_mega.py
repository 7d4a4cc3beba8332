"""Piece timing of the MEGAKERNEL photometric LM iteration
(ops/pba_mega.py) at EuRoC bench scale — the round-4 target is >= 90
LM iterations/s (<= 11 ms/iteration)."""
import sys

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import photometric_ba as pba
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.ops import pba_mega
from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)
from scripts.devtime import devtime
from scripts.profile_pba import build_euroc_scale_pba

enable_compilation_cache()
print("backend:", jax.default_backend())

problem, images_flat, H, W = build_euroc_scale_pba(dtype=jnp.float32)
cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0,
                  schur_matmul_precision="high")
problem, plan = fused.densify_problem(problem, pow2_buckets=False)
n_images = problem.cam_states.pose.shape[0]
mega = pba_mega.make_mega_solver(
    "pinhole", images_flat, H, W, problem, n_images, plan
)
img = mega.images_pad
consts = mega.consts
mplan = mega.plan
print("Og =", consts.an.shape[0], "groups =", consts.iog.shape[0],
      "valid =", int(jnp.sum(problem.obs.valid)))


def full_iter(problem, img, consts, mplan):
    with jax.default_matmul_precision("float32"):
        cost, neq = pba_mega.build_mega(
            "pinhole", img, problem, consts, mplan, cfg, HW=mega.HW
        )
        dc, dp = pba_mega.solve_lam(
            neq, jnp.asarray(1e-4, problem.inv_depth.dtype),
            ~problem.fixed_cams, cfg,
        )
        new_cams = jax.vmap(pba.cam_retract)(problem.cam_states, dc)
        return problem._replace(
            cam_states=new_cams, inv_depth=problem.inv_depth + dp
        ), cost


def build_only(problem, img, consts, mplan):
    with jax.default_matmul_precision("float32"):
        return pba_mega.build_mega(
            "pinhole", img, problem, consts, mplan, cfg, HW=mega.HW
        )


def warp_only(problem, consts):
    with jax.default_matmul_precision("float32"):
        return pba_mega.warp_slabs(
            "pinhole", problem.cam_states, problem.inv_depth, consts
        )


def kernel_only(problem, img, consts):
    with jax.default_matmul_precision("float32"):
        ux, uy, fin, GA, GB = pba_mega.warp_slabs(
            "pinhole", problem.cam_states, problem.inv_depth, consts
        )
        affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))
        aff_a = affp[consts.an]
        aff_t = affp[consts.tn]
        aff = jnp.stack(
            [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
        )
        return pba_mega.mega_rj(
            img, ux, uy, GA, GB, consts.refp, aff,
            consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=mega.HW, huber_delta=9.0,
        )


with jax.default_matmul_precision("float32"):
    _, neq = jax.jit(build_only)(problem, img, consts, mplan)


def solve_only(neq, problem):
    with jax.default_matmul_precision("float32"):
        return pba_mega.solve_lam(
            neq, jnp.asarray(1e-4, jnp.float32), ~problem.fixed_cams, cfg
        )


if __name__ == "__main__":
    devtime(full_iter, problem, img, consts, mplan, iters=30,
            label="full LM iteration (mega)")
    devtime(build_only, problem, img, consts, mplan, iters=30,
            label="build (mega kernel + assembly)")
    devtime(kernel_only, problem, img, consts, iters=30,
            label="warp slabs + megakernel")
    devtime(warp_only, problem, consts, iters=30,
            label="warp slabs alone (phase 1)")
    devtime(solve_only, neq, problem, iters=30, label="solve_lam")


def modes():
    def kernel_mode(mode):
        def f(problem, img, consts):
            with jax.default_matmul_precision("float32"):
                ux, uy, fin, GA, GB = pba_mega.warp_slabs(
                    "pinhole", problem.cam_states, problem.inv_depth, consts
                )
                affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))
                aff_a = affp[consts.an]
                aff_t = affp[consts.tn]
                aff = jnp.stack(
                    [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
                )
                return pba_mega.mega_rj(
                    img, ux, uy, GA, GB, consts.refp, aff,
                    consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=mega.HW, huber_delta=9.0,
                    mode=mode,
                )
        return f

    devtime(kernel_mode("loop_only"), problem, img, consts, iters=30,
            label="warp + kernel [loop_only]")
    devtime(kernel_mode("weights_only"), problem, img, consts, iters=30,
            label="warp + kernel [weights_only]")
    devtime(kernel_mode("empty"), problem, img, consts, iters=30,
            label="warp + kernel [empty]")


if "modes" in sys.argv:
    modes()


def baseline():
    def nothing(problem, img, consts):
        return img[0, 0, 0:1]

    devtime(nothing, problem, img, consts, iters=30,
            label="devtime artifact (perturb+leafsum)")

    def noimg(problem, consts):
        return problem.inv_depth[0:1]

    devtime(noimg, problem, consts, iters=30,
            label="devtime artifact (no images)")


if "baseline" in sys.argv:
    baseline()


def noperturb():
    import numpy as _np
    img_i = jax.lax.bitcast_convert_type(img, jnp.int32)

    def kernel_mode_i(mode):
        def f(problem, img_i, consts):
            im = jax.lax.bitcast_convert_type(img_i, jnp.float32)
            with jax.default_matmul_precision("float32"):
                ux, uy, fin, GA, GB = pba_mega.warp_slabs(
                    "pinhole", problem.cam_states, problem.inv_depth, consts
                )
                affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))
                aff_a = affp[consts.an]
                aff_t = affp[consts.tn]
                aff = jnp.stack(
                    [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
                )
                return pba_mega.mega_rj(
                    im, ux, uy, GA, GB, consts.refp, aff,
                    consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=mega.HW, huber_delta=9.0,
                    mode=mode,
                )
        return f

    for m in ["empty", "weights_only", "loop_only", "full"]:
        devtime(kernel_mode_i(m), problem, img_i, consts, iters=30,
                label=f"noperturb kernel [{m}]")


if "noperturb" in sys.argv:
    noperturb()


def prolog():
    img_i = jax.lax.bitcast_convert_type(img, jnp.int32)
    Hp = img.shape[1]

    def f(problem, consts):
        with jax.default_matmul_precision("float32"):
            ux, uy, fin, GA, GB = pba_mega.warp_slabs(
                "pinhole", problem.cam_states, problem.inv_depth, consts
            )
            affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))
            aff_a = affp[consts.an]
            aff_t = affp[consts.tn]
            aff = jnp.stack(
                [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
            )
            code, wsy = pba_mega._tile_prologue(
                ux, uy, mega.HW[0], mega.HW[1], Hp
            )
            return (code, wsy, ux, uy, GA, GB, aff)

    devtime(f, problem, consts, iters=30, label="warp + prologue (no pallas)")


if "prolog" in sys.argv:
    prolog()


def assembly():
    """Piece timing of the dense Schur assembly after the kernel."""
    import numpy as np

    out = jax.jit(
        lambda p, i, c: kernel_only(p, i, c)
    )(problem, img, consts)
    out = jax.block_until_ready(out)
    C = 8
    K = jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
    L = problem.inv_depth.shape[0]

    def t_transpose(out):
        return out.T + 0.0

    def t_j2(out):
        return out.T[:, jnp.asarray(pba_mega.PERMCOLS)]

    def t_gram(out):
        outT = out.T
        J2 = outT[:, jnp.asarray(pba_mega.PERMCOLS)]
        rows = J2[mplan.pg]
        rows2 = rows.reshape(rows.shape[0], -1, 17)[..., :16]
        G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)
        blocks = jnp.stack(
            [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C], G2[:, C:, C:]],
            axis=1,
        ).reshape(-1, C * C)
        return (
            jnp.zeros((K * K + 1, C * C), jnp.float32)
            .at[mplan.cc_rows4.reshape(-1)]
            .add(blocks)[: K * K]
        )

    def t_ab(out):
        outT = out.T
        AB = outT[:, 145:179][mplan.g_of_s]
        A0s = AB[:, :17]
        A1s = AB[:, 17:]
        S_ = mplan.lm_cam.shape[0]
        A0r = A0s.reshape(S_, L, 17)
        red0 = A0r.sum(0)
        oh = jax.nn.one_hot(mplan.lm_cam, K, dtype=jnp.float32)
        vt_sl = A0r[:, :, C:2 * C]
        M = jnp.einsum("slk,slc->lkc", oh, vt_sl).reshape(L, K * C)
        g_c = (jax.nn.one_hot(mplan.obs_anchor_cam, K, dtype=jnp.float32).T
               @ A1s[:, :C])
        return M, red0, g_c

    with jax.default_matmul_precision("float32"):
        devtime(t_transpose, out, iters=30, label="assembly: out.T")
        devtime(t_j2, out, iters=30, label="assembly: out.T + PERMCOLS gather")
        devtime(t_gram, out, iters=30, label="assembly: ... + pair Gram")
        devtime(t_ab, out, iters=30, label="assembly: AB slot lift + M einsum")


if "assembly" in sys.argv:
    assembly()


def bf16_mode():
    cfg16 = cfg._replace(sample_bf16=True)

    def full_iter16(problem, img, consts, mplan):
        with jax.default_matmul_precision("float32"):
            cost, neq = pba_mega.build_mega(
                "pinhole", img, problem, consts, mplan, cfg16, HW=mega.HW
            )
            dc, dp = pba_mega.solve_lam(
                neq, jnp.asarray(1e-4, problem.inv_depth.dtype),
                ~problem.fixed_cams, cfg16,
            )
            new_cams = jax.vmap(pba.cam_retract)(problem.cam_states, dc)
            return problem._replace(
                cam_states=new_cams, inv_depth=problem.inv_depth + dp
            ), cost

    def kernel16(problem, img, consts):
        with jax.default_matmul_precision("float32"):
            ux, uy, fin, GA, GB = pba_mega.warp_slabs(
                "pinhole", problem.cam_states, problem.inv_depth, consts
            )
            affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))
            aff_a = affp[consts.an]
            aff_t = affp[consts.tn]
            aff = jnp.stack(
                [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
            )
            return pba_mega.mega_rj(
                img, ux, uy, GA, GB, consts.refp, aff,
                consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=mega.HW, huber_delta=9.0,
                bf16=True,
            )

    img16 = img.astype(jnp.bfloat16)

    def kernel16_pre(problem, img16, consts):
        """bf16 path with the image stack ALREADY cast (halves HBM image
        traffic too; the production solver can hold a bf16 stack)."""
        with jax.default_matmul_precision("float32"):
            ux, uy, fin, GA, GB = pba_mega.warp_slabs(
                "pinhole", problem.cam_states, problem.inv_depth, consts
            )
            affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))
            aff_a = affp[consts.an]
            aff_t = affp[consts.tn]
            aff = jnp.stack(
                [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
            )
            return pba_mega.mega_rj(
                img16, ux, uy, GA, GB, consts.refp, aff,
                consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=mega.HW, huber_delta=9.0,
                bf16=True,
            )

    devtime(full_iter16, problem, img, consts, mplan, iters=30,
            label="full LM iteration (mega, bf16)")
    devtime(kernel16, problem, img, consts, iters=30,
            label="warp + kernel (bf16, cast in-graph)")
    devtime(kernel16_pre, problem, img16, consts, iters=30,
            label="warp + kernel (bf16, pre-cast stack)")


if "bf16" in sys.argv:
    bf16_mode()
