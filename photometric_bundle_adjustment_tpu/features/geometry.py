"""Two-view geometry: essential matrix, epipolar test, midpoint
triangulation.  Batched/vmappable replacements for the OpenGV pieces the
reference consumes (matching_utils.h:51-79, map_utils.h:168-191)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.core import se3


def skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def essential_from_pose(T_0_1: jax.Array) -> jax.Array:
    """E = [t_hat]_x R from the relative pose (computeEssential,
    matching_utils.h:51-60; translation normalised)."""
    t = se3.translation(T_0_1)
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    R = se3.quat_to_matrix(se3.rotation(T_0_1))
    return skew(t) @ R


def epipolar_inliers(
    bearings0: jax.Array,
    bearings1: jax.Array,
    E: jax.Array,
    threshold: float = 1e-3,
) -> jax.Array:
    """|x_L^T E x_R| <= threshold per match (findInliersEssential,
    matching_utils.h:62-79).  Returns bool mask."""
    err = jnp.abs(jnp.einsum("...i,ij,...j->...", bearings0, E, bearings1))
    return err <= threshold


def triangulate_midpoint(
    f0: jax.Array, f1: jax.Array, T_0_1: jax.Array
) -> jax.Array:
    """Midpoint triangulation in frame 0 (OpenGV triangulation::triangulate
    as used at map_utils.h:177-178).

    f0, f1: (..., 3) unit bearings in camera 0 / camera 1; T_0_1 the pose of
    camera 1 in camera-0 coordinates.  Returns points (..., 3) in frame 0.
    """
    R = se3.quat_to_matrix(se3.rotation(T_0_1))
    t = se3.translation(T_0_1)
    Rf1 = jnp.einsum("...ij,...j->...i", R, f1)
    # least-squares on [f0, -Rf1] [l0, l1]^T = t  (2x2 normal equations)
    a = jnp.sum(f0 * f0, axis=-1)
    b = -jnp.sum(f0 * Rf1, axis=-1)
    c = jnp.sum(Rf1 * Rf1, axis=-1)
    e0 = jnp.sum(f0 * t, axis=-1)
    e1 = -jnp.sum(Rf1 * t, axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    l0 = (c * e0 - b * e1) / det
    l1 = (a * e1 - b * e0) / det
    p0 = l0[..., None] * f0
    p1 = t + l1[..., None] * Rf1
    return 0.5 * (p0 + p1)


def reprojection_angle_error(
    f0: jax.Array, f1: jax.Array, T_0_1: jax.Array
) -> jax.Array:
    """OpenGV relative-pose SAC error: triangulate, reproject into both
    cameras, return (1 - cos a0) + (1 - cos a1)."""
    p0 = triangulate_midpoint(f0, f1, T_0_1)
    p1 = se3.act(se3.inverse(T_0_1), p0)
    n0 = p0 / jnp.maximum(jnp.linalg.norm(p0, axis=-1, keepdims=True), 1e-12)
    n1 = p1 / jnp.maximum(jnp.linalg.norm(p1, axis=-1, keepdims=True), 1e-12)
    e0 = 1.0 - jnp.sum(f0 * n0, axis=-1)
    e1 = 1.0 - jnp.sum(f1 * n1, axis=-1)
    return e0 + e1


def decompose_essential(E: jax.Array):
    """E -> 4 candidate relative poses (R, t), each (4, 3, 3) / (4, 3)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def eight_point(f0: jax.Array, f1: jax.Array) -> jax.Array:
    """Essential matrix from >= 8 bearing correspondences such that
    f0^T E f1 = 0; rank-2 projection included.  f0/f1: (n, 3)."""
    A = jnp.einsum("ni,nj->nij", f0, f1).reshape(f0.shape[0], 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    U, s, Vt2 = jnp.linalg.svd(E)
    s_avg = 0.5 * (s[0] + s[1])
    return U @ jnp.diag(jnp.array([s_avg, s_avg, 0.0], E.dtype)) @ Vt2
