"""Synthetic BA problem generation — shared by tests, benchmarks, the
multi-chip dry-run, and the compile-check entry point."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.core import cameras, se3
from photometric_bundle_adjustment_tpu.models import geometric_ba
from photometric_bundle_adjustment_tpu.models import photometric_ba as pba


def synth_ba_problem(
    model: str = "pinhole",
    K: int = 8,
    L: int = 256,
    obs_per_landmark: int = 4,
    seed: int = 0,
    pose_noise: float = 0.01,
    depth_noise: float = 0.03,
    pixel_noise: float = 0.0,
    dtype=jnp.float64,
):
    """Build a perturbed multi-view reprojection-BA problem with EuRoC-like
    geometry.  Returns (problem, poses_gt, inv_depth_gt)."""
    rng = np.random.default_rng(seed)
    intr = cameras.test_params(model, dtype=dtype)

    xi = np.zeros((K, 6))
    xi[:, 0] = np.arange(K) * 0.25
    xi[:, 1] = rng.normal(0, 0.05, K)
    xi[:, 3:] = rng.normal(0, 0.02, (K, 3))
    xi[0] = 0
    poses_gt = se3.exp(jnp.asarray(xi, dtype))

    pts = np.stack(
        [rng.uniform(-3, 3 + 0.25 * K, L), rng.uniform(-2, 2, L),
         rng.uniform(4, 12, L)],
        axis=-1,
    )
    pts_w = se3.act(poses_gt[0], jnp.asarray(pts, dtype))

    # anchor camera per landmark: nearest camera index (spread anchors)
    anchor_of_lm = rng.integers(0, max(K // 2, 1), L).astype(np.int32)
    T_anchor = poses_gt[anchor_of_lm]
    p_a = se3.act(se3.inverse(T_anchor), pts_w)
    uv_ref = cameras.project(model, intr, p_a)
    inv_depth_gt = 1.0 / jnp.linalg.norm(p_a, axis=-1)

    # observations: obs_per_landmark target cameras per landmark (anchor skipped)
    obs_a, obs_c, obs_l, uv_t_rows = [], [], [], []
    for j in range(obs_per_landmark):
        tgt = (anchor_of_lm + 1 + j) % K
        obs_a.append(anchor_of_lm)
        obs_c.append(tgt.astype(np.int32))
        obs_l.append(np.arange(L, dtype=np.int32))
        p_t = se3.act(se3.inverse(poses_gt[tgt]), pts_w)
        uv = cameras.project(model, intr, p_t)
        if pixel_noise > 0:
            uv = uv + rng.normal(0, pixel_noise, uv.shape)
        uv_t_rows.append(np.asarray(uv))
    O = L * obs_per_landmark

    # perturb initial state
    dpose = np.zeros((K, 6))
    dpose[2:] = rng.normal(0, pose_noise, (K - 2, 6))
    poses0 = jax.vmap(se3.right_plus)(poses_gt, jnp.asarray(dpose, dtype))
    rho0 = inv_depth_gt * (1.0 + rng.normal(0, depth_noise, L))

    problem = geometric_ba.build_problem(
        poses=poses0,
        inv_depth=jnp.asarray(rho0, dtype),
        anchor_cam=np.concatenate(obs_a),
        target_cam=np.concatenate(obs_c),
        landmark=np.concatenate(obs_l),
        uv_target=jnp.asarray(np.concatenate(uv_t_rows), dtype),
        uv_ref=jnp.tile(uv_ref, (obs_per_landmark, 1)),
        intr_ref=jnp.tile(intr, (O, 1)),
        intr_target=jnp.tile(intr, (O, 1)),
        valid=np.ones(O, bool),
        fixed_cams=np.arange(K) < 2,
    )
    return problem, poses_gt, inv_depth_gt


def synth_pba_problem(
    K: int = 4,
    L: int = 128,
    H: int = 64,
    W: int = 96,
    seed: int = 0,
    pose_noise: float = 0.003,
    depth_noise: float = 0.02,
    dtype=jnp.float32,
):
    """Photometric BA problem on a rendered curved (sphere) scene with a
    smooth texture.  Returns (problem, images_flat, H, W, poses_gt,
    inv_depth_gt)."""
    rng = np.random.default_rng(seed)
    model = "pinhole"
    intr = jnp.array([0.8 * W, 0.8 * W, W / 2, H / 2, 0, 0, 0, 0], dtype)
    sphere_c = jnp.array([0.5, 0.0, 14.0], dtype)
    sphere_r = 9.5

    def texture(p_xy):
        x, y = p_xy[..., 0], p_xy[..., 1]
        return (
            120.0
            + 50.0 * jnp.sin(1.7 * x) * jnp.cos(2.3 * y)
            + 40.0 * jnp.sin(3.1 * x + 2.0 * y)
        )

    def ray_depth(o, dw):
        oc = o[None, :] - sphere_c[None, :]
        bq = jnp.sum(dw * oc, axis=-1)
        cq = jnp.sum(oc * oc, axis=-1) - sphere_r**2
        disc = jnp.sqrt(jnp.maximum(bq * bq - cq, 1e-9))
        return -bq - disc

    xi = np.zeros((K, 6))
    xi[:, 0] = np.arange(K) * 0.35
    xi[:, 1] = rng.normal(0, 0.04, K)
    xi[:, 3:] = rng.normal(0, 0.008, (K, 3))
    xi[0] = 0
    poses_gt = se3.exp(jnp.asarray(xi, dtype))

    def render(T_w_c):
        ys, xs = jnp.mgrid[0:H, 0:W]
        uv = jnp.stack([xs.astype(dtype), ys.astype(dtype)], -1)
        d = cameras.unproject_unit(model, intr, uv.reshape(-1, 2))
        o = se3.translation(T_w_c)
        dw = se3.quat_rotate(se3.rotation(T_w_c), d)
        lam = ray_depth(o, dw)
        p_w = o[None, :] + lam[:, None] * dw
        return texture(p_w[:, :2]).reshape(H, W)

    images = jnp.stack([render(poses_gt[k]) for k in range(K)])
    images_flat = images.reshape(-1)

    uv_ref = np.stack(
        [rng.uniform(8, W - 8, L), rng.uniform(8, H - 8, L)], -1
    ).astype(np.float64)
    d = cameras.unproject_unit(model, intr, jnp.asarray(uv_ref, dtype))
    o0 = se3.translation(poses_gt[0])
    dw = se3.quat_rotate(se3.rotation(poses_gt[0]), d)
    inv_depth_gt = 1.0 / ray_depth(o0, dw)
    ref_patch = pba.extract_ref_patches(
        images_flat, jnp.zeros(L, jnp.int32), jnp.asarray(uv_ref, dtype), H, W
    )

    obs_a = np.tile(np.zeros(L, np.int32), K - 1)
    obs_c = np.concatenate([np.full(L, k, np.int32) for k in range(1, K)])
    obs_l = np.tile(np.arange(L, dtype=np.int32), K - 1)
    O = L * (K - 1)

    dpose = np.zeros((K, 6))
    dpose[2:] = rng.normal(0, pose_noise, (K - 2, 6))
    poses0 = jax.vmap(se3.right_plus)(poses_gt, jnp.asarray(dpose, dtype))
    rho0 = inv_depth_gt * (1.0 + rng.normal(0, depth_noise, L))

    problem = pba.build_problem(
        poses=poses0,
        affine=jnp.zeros((K, 2), dtype),
        inv_depth=jnp.asarray(rho0, dtype),
        anchor_cam=obs_a,
        target_cam=obs_c,
        landmark=obs_l,
        uv_ref=jnp.tile(jnp.asarray(uv_ref, dtype), (K - 1, 1)),
        ref_patch=jnp.tile(ref_patch, (K - 1, 1)),
        target_img=obs_c,
        intr_ref=jnp.tile(intr, (O, 1)),
        intr_target=jnp.tile(intr, (O, 1)),
        valid=np.ones(O, bool),
        fixed_cams=np.arange(K) < 2,
    )
    return problem, images_flat, H, W, poses_gt, inv_depth_gt
