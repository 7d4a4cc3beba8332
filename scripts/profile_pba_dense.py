"""Piece timing of the KERNEL-DENSE photometric LM iteration (the bench
path: make_kernel_dense_solver = Pallas sampling + slot-major dense
assembly).  Targets the round-3 goal of <= 11 ms/iteration."""
import sys

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import photometric_ba as pba
from photometric_bundle_adjustment_tpu.optim import ba, fused
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
outer = pba.make_kernel_dense_solver("pinhole", images_flat, H, W,
                                     problem, n_images)
img = outer.images_pad
print("Opad =", problem.obs.valid.shape[0])


def full_iter(problem, img):
    inner = outer.make_inner(img)
    with jax.default_matmul_precision("float32"):
        cost, neq = inner.build(problem, plan, cfg)
        dc, dp = inner.solve_lam(
            neq, plan, jnp.asarray(1e-4, problem.inv_depth.dtype),
            ~problem.fixed_cams, cfg,
        )
        new_cams = jax.vmap(pba.cam_retract)(problem.cam_states, dc)
        return problem._replace(
            cam_states=new_cams, inv_depth=problem.inv_depth + dp
        ), cost


def build_only(problem, img):
    with jax.default_matmul_precision("float32"):
        return outer.make_inner(img).build(problem, plan, cfg)


def rj_only(problem, img):
    res_b, rj_b = outer.make_fns(img)
    o = problem.obs
    cam_a = jax.tree_util.tree_map(lambda x: x[o.anchor_cam],
                                   problem.cam_states)
    cam_c = jax.tree_util.tree_map(lambda x: x[o.target_cam],
                                   problem.cam_states)
    rho = problem.inv_depth[o.landmark]
    with jax.default_matmul_precision("float32"):
        return rj_b(cam_a, cam_c, rho, o.aux)


def res_only(problem, img):
    res_b, rj_b = outer.make_fns(img)
    o = problem.obs
    cam_a = jax.tree_util.tree_map(lambda x: x[o.anchor_cam],
                                   problem.cam_states)
    cam_c = jax.tree_util.tree_map(lambda x: x[o.target_cam],
                                   problem.cam_states)
    rho = problem.inv_depth[o.landmark]
    with jax.default_matmul_precision("float32"):
        return res_b(cam_a, cam_c, rho, o.aux)


with jax.default_matmul_precision("float32"):
    _, neq = jax.jit(build_only)(problem, img)


def solve_only(neq):
    with jax.default_matmul_precision("float32"):
        return outer.make_inner(img).solve_lam(
            neq, plan, jnp.asarray(1e-4, jnp.float32),
            ~problem.fixed_cams, cfg,
        )


if __name__ == "__main__":
    devtime(full_iter, problem, img, iters=20, label="full LM iteration")
    devtime(build_only, problem, img, iters=20, label="build (R+J+assembly)")
    devtime(rj_only, problem, img, iters=20, label="rj_batch (warp+sample+J)")
    devtime(res_only, problem, img, iters=20, label="res_batch (warp+sample)")
    devtime(solve_only, neq, iters=20, label="solve_lam")


def pieces():
    res_b, rj_b = outer.make_fns(img)
    o = problem.obs
    cam_a = jax.tree_util.tree_map(lambda x: x[o.anchor_cam],
                                   problem.cam_states)
    cam_c = jax.tree_util.tree_map(lambda x: x[o.target_cam],
                                   problem.cam_states)
    rho = problem.inv_depth[o.landmark]

    # reach inside make_rj_res: rebuild its sub-functions at this scale
    from photometric_bundle_adjustment_tpu.ops import patch_sample as ps
    import numpy as np

    timg_slot = np.asarray(problem.obs.aux.target_img)
    Os = timg_slot.shape[0]
    order, iog, gcnt = ps.group_layout(timg_slot, n_images)
    take_g = jnp.asarray(np.where(order >= 0, order, 0).astype(np.int32))
    iog_j = jnp.asarray(iog); gcnt_j = jnp.asarray(gcnt)
    print("sampler rows:", order.shape[0], "groups:", len(iog))

    def uv_warp_only(cam_a, cam_c, rho, aux):
        # replicate uv_only vmapped (no sampling)
        from photometric_bundle_adjustment_tpu.core import (
            cameras as cam_models, se3,
        )
        from photometric_bundle_adjustment_tpu.models.photometric_ba import (
            PATCH_OFFSETS,
        )
        offsets = jnp.asarray(PATCH_OFFSETS)

        def one(ca, cc, rh, aux):
            offs = offsets.astype(rh.dtype)
            uv_patch = aux.uv_ref[None, :] + offs
            dirs = cam_models.unproject_unit("pinhole", aux.intr_ref, uv_patch)
            Ra = se3.quat_to_matrix(se3.rotation(ca.pose))
            Rc = se3.quat_to_matrix(se3.rotation(cc.pose))
            u = Rc.T @ (se3.translation(ca.pose) - se3.translation(cc.pose))
            q = dirs @ (Rc.T @ Ra).T + rh * u
            uv_t = cam_models.project("pinhole", aux.intr_target, q)
            return uv_t[:, 0], uv_t[:, 1]

        return jax.vmap(one)(cam_a, cam_c, rho, aux)

    uvx, uvy = jax.jit(uv_warp_only)(cam_a, cam_c, rho, o.aux)

    def sample_only(im, uvx, uvy):
        finite = jnp.isfinite(uvx) & jnp.isfinite(uvy)
        sx = jnp.where(finite, uvx, -1e6)[:Os][take_g].T
        sy = jnp.where(finite, uvy, -1e6)[:Os][take_g].T
        return ps.sample_patches_grouped(im, sx, sy, iog_j, gcnt_j,
                                         HW=outer.HW, want_grads=True)

    def sample_valonly(im, uvx, uvy):
        finite = jnp.isfinite(uvx) & jnp.isfinite(uvy)
        sx = jnp.where(finite, uvx, -1e6)[:Os][take_g].T
        sy = jnp.where(finite, uvy, -1e6)[:Os][take_g].T
        return ps.sample_patches_grouped(im, sx, sy, iog_j, gcnt_j,
                                         HW=outer.HW, want_grads=False)

    devtime(uv_warp_only, cam_a, cam_c, rho, o.aux, iters=20,
            label="warp uv only (no sampling)")
    devtime(sample_only, img, uvx, uvy, iters=20, label="sampler alone (grads)")
    devtime(sample_valonly, img, uvx, uvy, iters=20, label="sampler alone (val)")


if "pieces" in sys.argv:
    pieces()


def pieces2():
    import numpy as np
    from photometric_bundle_adjustment_tpu.models.photometric_ba import (
        PATCH_OFFSETS, PATCH_SIZE,
    )
    from photometric_bundle_adjustment_tpu.core import (
        cameras as cam_models, se3,
    )

    o = problem.obs
    cam_a = jax.tree_util.tree_map(lambda x: x[o.anchor_cam],
                                   problem.cam_states)
    cam_c = jax.tree_util.tree_map(lambda x: x[o.target_cam],
                                   problem.cam_states)
    rho = problem.inv_depth[o.landmark]
    offsets = jnp.asarray(PATCH_OFFSETS)

    def warp_terms_one(ca, cc, rh, aux):
        dtype = rh.dtype
        offs = offsets.astype(dtype)
        uv_patch = aux.uv_ref[None, :] + offs
        d = cam_models.unproject_unit("pinhole", aux.intr_ref, uv_patch)
        Ra = se3.quat_to_matrix(se3.rotation(ca.pose))
        Rc = se3.quat_to_matrix(se3.rotation(cc.pose))
        M = Rc.T @ Ra
        u = Rc.T @ (se3.translation(ca.pose) - se3.translation(cc.pose))
        q = d @ M.T + rh * u

        def pi(p):
            return cam_models.project("pinhole", aux.intr_target, p)

        uv_t = pi(q)
        Jpi = jax.vmap(jax.jacfwd(pi))(q)
        eye = jnp.eye(3, dtype=dtype)
        hat_d = se3.hat_so3(d)
        hat_q = se3.hat_so3(q)
        Mb = jnp.broadcast_to(rh * M, (PATCH_SIZE, 3, 3))
        dpc = jnp.concatenate([
            Mb, -jnp.einsum("ij,pjk->pik", M, hat_d),
            -jnp.broadcast_to(rh * eye, (PATCH_SIZE, 3, 3)), hat_q,
            jnp.broadcast_to(u, (PATCH_SIZE, 3))[:, :, None],
        ], axis=2)
        return (uv_t[:, 0], uv_t[:, 1], Jpi.reshape(-1), dpc.reshape(-1))

    def warp_only(cam_a, cam_c, rho, aux):
        return jax.vmap(warp_terms_one)(cam_a, cam_c, rho, aux)

    uvx, uvy, JpiF, dpcF = jax.jit(warp_only)(cam_a, cam_c, rho, o.aux)
    I_t = jnp.abs(uvx) % 255.0
    gxv = uvx * 0.01
    gyv = uvy * 0.01

    def combine_one(I_t, gx, gy, JpiF, dpcF, ca, cc, aux):
        dtype = I_t.dtype
        Jpi = JpiF.reshape(PATCH_SIZE, 2, 3)
        dpc = dpcF.reshape(PATCH_SIZE, 3, 13)
        a_r, b_r = ca.affine[0], ca.affine[1]
        a_t, b_t = cc.affine[0], cc.affine[1]
        e = jnp.exp(a_t - a_r)
        ref_term = aux.ref_patch - b_r
        r = (I_t - b_t) - e * ref_term
        g = jnp.stack([gx, gy], axis=-1)
        dIdy = jnp.einsum("pi,pij->pj", g, Jpi)
        J_geo = jnp.einsum("pj,pjk->pk", dIdy, dpc)
        ones = jnp.ones((PATCH_SIZE,), dtype)
        Ja_aff = jnp.stack([e * ref_term, e * ones], axis=-1)
        Jc_aff = jnp.stack([-e * ref_term, -ones], axis=-1)
        J = jnp.concatenate([
            J_geo[:, 0:6], Ja_aff, J_geo[:, 6:12], Jc_aff, J_geo[:, 12:13],
        ], axis=1)
        return r, J.reshape(-1)

    def combine_only(I_t, gxv, gyv, JpiF, dpcF, cam_a, cam_c, aux):
        return jax.vmap(combine_one)(I_t, gxv, gyv, JpiF, dpcF,
                                     cam_a, cam_c, aux)

    devtime(warp_only, cam_a, cam_c, rho, o.aux, iters=20,
            label="warp_terms alone (J geo terms)")
    devtime(combine_only, I_t, gxv, gyv, JpiF, dpcF, cam_a, cam_c, o.aux,
            iters=20, label="combine_rj alone")


if "pieces2" in sys.argv:
    pieces2()
