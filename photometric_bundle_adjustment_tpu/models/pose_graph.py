"""Pose-graph optimisation: rotation averaging + translation-direction
averaging.

Re-design of the reference's global-SfM residuals
(include/visnav/global.h:44-86):

  * rotation:     r = log( R_ij * R_wj^-1 * R_wi )          (3-vector)
  * translation:  r = t_hat_ij - (t_wj - t_wi) / (||.|| + 1e-6)

All edges are flat arrays; residuals evaluate as one vmapped computation
and the dense LM core solves the (typically few-hundred-dim) tangent
system.  Also provides a full SE3 pose-graph residual (relative-pose
factor) for loop-closure style graphs, which the reference's north star
lists ("pose-graph optimization").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.core import se3
from photometric_bundle_adjustment_tpu.optim import LMConfig, lm_solve


class RotationGraph(NamedTuple):
    edge_i: jax.Array    # (E,) int32
    edge_j: jax.Array    # (E,)
    q_ij: jax.Array      # (E, 4) measured relative rotations R_i_j
    weight: jax.Array    # (E,)


class TranslationGraph(NamedTuple):
    edge_i: jax.Array
    edge_j: jax.Array
    t_hat_ij: jax.Array  # (E, 3) measured unit translation directions
    weight: jax.Array


class MetricEdges(NamedTuple):
    """Edges with KNOWN metric relative translation in world frame (e.g.
    calibrated stereo pairs): residual  t_j - t_i - t_ij_world.  These anchor
    the global scale that direction-only residuals leave weakly constrained."""

    edge_i: jax.Array
    edge_j: jax.Array
    t_ij_world: jax.Array  # (E, 3) metric displacement c_j - c_i in world
    weight: jax.Array


class PoseGraph(NamedTuple):
    edge_i: jax.Array
    edge_j: jax.Array
    T_ij: jax.Array      # (E, 7) measured relative poses T_i_j
    weight: jax.Array


def rotation_averaging(
    quats0: jax.Array,      # (N, 4) initial R_w_i
    graph: RotationGraph,
    fixed: jax.Array,       # (N,) bool — gauge
    max_iterations: int = 50,
    huber_delta: float = 0.05,
):
    """Returns (quats (N, 4), LMResult).

    Robustified by default (Huber on the per-edge so3-log block, ~3 deg):
    relative rotations from two-view RANSAC are heavy-tailed — a handful of
    wrong-chirality / degenerate-pair edges would otherwise bias every
    camera by several degrees."""
    N = quats0.shape[0]

    def residuals(quats):
        q_wi = quats[graph.edge_i]
        q_wj = quats[graph.edge_j]
        q = se3.quat_mul(graph.q_ij, se3.quat_mul(se3.quat_conj(q_wj), q_wi))
        return (se3.so3_log(q) * graph.weight[:, None]).reshape(-1)

    def retract(quats, delta):
        d = delta.reshape(N, 3)
        return se3.quat_normalize(
            se3.quat_mul(quats, se3.so3_exp(d))
        )

    mask = jnp.repeat(jnp.asarray(fixed), 3)
    cfg = LMConfig(max_iterations=max_iterations, function_tolerance=1e-16,
                   huber_delta=huber_delta, block_size=3)
    return lm_solve(residuals, quats0, retract, N * 3, cfg, fixed_mask=mask)


def translation_averaging(
    t0: jax.Array,          # (N, 3) initial t_w_i
    graph: TranslationGraph,
    fixed: jax.Array,       # (N,) bool — needs >= 2 fixed (scale gauge)
    max_iterations: int = 50,
    metric: MetricEdges | None = None,
    huber_delta: float = 0.1,
):
    """Robustified by default: two-view translation directions are
    meaningless for near-zero-baseline pairs (direction errors up to 180
    deg), so the per-block Huber is essential.  Metric-edge weights should
    be scaled so their expected converged residual sits inside the Huber
    region (weight * metres <= huber_delta)."""
    N = t0.shape[0]

    def residuals(t):
        diff = t[graph.edge_j] - t[graph.edge_i]
        n = jnp.linalg.norm(diff, axis=-1, keepdims=True) + 1e-6
        r = graph.t_hat_ij - diff / n
        r = (r * graph.weight[:, None]).reshape(-1)
        if metric is not None:
            rm = (
                t[metric.edge_j] - t[metric.edge_i] - metric.t_ij_world
            ) * metric.weight[:, None]
            r = jnp.concatenate([r, rm.reshape(-1)])
        return r

    def retract(t, delta):
        return t + delta.reshape(N, 3)

    mask = jnp.repeat(jnp.asarray(fixed), 3)
    cfg = LMConfig(max_iterations=max_iterations, function_tolerance=1e-16,
                   huber_delta=huber_delta, block_size=3)
    return lm_solve(residuals, t0, retract, N * 3, cfg, fixed_mask=mask)


def pose_graph_optimization(
    poses0: jax.Array,      # (N, 7) initial T_w_i
    graph: PoseGraph,
    fixed: jax.Array,       # (N,) bool
    max_iterations: int = 50,
):
    """Full SE3 relative-pose graph: r = log(T_ij^-1 * T_wi^-1 * T_wj)."""
    N = poses0.shape[0]

    def residuals(poses):
        T_wi = poses[graph.edge_i]
        T_wj = poses[graph.edge_j]
        T_ij_est = se3.compose(se3.inverse(T_wi), T_wj)
        r = se3.log(se3.compose(se3.inverse(graph.T_ij), T_ij_est))
        return (r * graph.weight[:, None]).reshape(-1)

    def retract(poses, delta):
        return jax.vmap(se3.right_plus)(poses, delta.reshape(N, 6))

    mask = jnp.repeat(jnp.asarray(fixed), 6)
    cfg = LMConfig(max_iterations=max_iterations, function_tolerance=1e-16)
    return lm_solve(residuals, poses0, retract, N * 6, cfg, fixed_mask=mask)
