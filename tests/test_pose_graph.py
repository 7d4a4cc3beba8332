"""Pose-graph / averaging tests: noisy relative measurements over a random
graph must average back to ground truth (global.h:44-86 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.core import se3
from photometric_bundle_adjustment_tpu.models import pose_graph as pg


def random_graph(N=12, extra_edges=18, seed=0):
    rng = np.random.default_rng(seed)
    edges = [(i, i + 1) for i in range(N - 1)]
    while len(edges) < N - 1 + extra_edges:
        i, j = rng.integers(0, N, 2)
        if i != j and (i, j) not in edges and (j, i) not in edges:
            edges.append((int(i), int(j)))
    return np.array(edges, np.int32), rng


def test_rotation_averaging():
    N = 12
    edges, rng = random_graph(N)
    q_gt = se3.so3_exp(jnp.asarray(rng.normal(0, 0.5, (N, 3))))
    q_gt = q_gt.at[0].set(jnp.array([0, 0, 0, 1.0]))

    # measured R_i_j = R_wi^-1 R_wj with small noise
    i, j = edges[:, 0], edges[:, 1]
    q_ij = se3.quat_mul(se3.quat_conj(q_gt[i]), q_gt[j])
    noise = se3.so3_exp(jnp.asarray(rng.normal(0, 0.01, (len(edges), 3))))
    q_ij = se3.quat_mul(q_ij, noise)
    # functor convention (global.h:57): residual = log(R_ij * R_wj^-1 * R_wi)
    # vanishes when R_ij = R_wi^-1 R_wj — exactly q_ij above
    q_meas = q_ij

    graph = pg.RotationGraph(
        edge_i=jnp.asarray(i), edge_j=jnp.asarray(j),
        q_ij=q_meas, weight=jnp.ones(len(edges)),
    )
    q0 = se3.quat_mul(q_gt, se3.so3_exp(jnp.asarray(rng.normal(0, 0.2, (N, 3)))))
    q0 = q0.at[0].set(q_gt[0])
    fixed = jnp.zeros(N, bool).at[0].set(True)
    q_est, res = pg.rotation_averaging(q0, graph, fixed)
    err = jax.vmap(
        lambda a, b: jnp.linalg.norm(se3.so3_log(se3.quat_mul(se3.quat_conj(a), b)))
    )(q_gt, q_est)
    assert float(jnp.max(err)) < 0.03, np.asarray(err)


def test_translation_averaging():
    N = 12
    edges, rng = random_graph(N, seed=1)
    t_gt = jnp.asarray(rng.normal(0, 2.0, (N, 3)))
    i, j = edges[:, 0], edges[:, 1]
    diff = t_gt[j] - t_gt[i]
    t_hat = diff / (jnp.linalg.norm(diff, axis=-1, keepdims=True) + 1e-6)

    graph = pg.TranslationGraph(
        edge_i=jnp.asarray(i), edge_j=jnp.asarray(j),
        t_hat_ij=t_hat, weight=jnp.ones(len(edges)),
    )
    t0 = t_gt + jnp.asarray(rng.normal(0, 0.3, (N, 3)))
    t0 = t0.at[0].set(t_gt[0]).at[1].set(t_gt[1])  # fix 2 for scale gauge
    fixed = jnp.zeros(N, bool).at[0].set(True).at[1].set(True)
    t_est, res = pg.translation_averaging(t0, graph, fixed)
    # directions all consistent -> recover up to the fixed gauge
    err = jnp.linalg.norm(t_est - t_gt, axis=-1)
    assert float(jnp.max(err)) < 0.05, np.asarray(err)


def test_se3_pose_graph():
    N = 10
    edges, rng = random_graph(N, extra_edges=12, seed=2)
    xi = rng.normal(0, 0.4, (N, 6))
    xi[0] = 0
    T_gt = se3.exp(jnp.asarray(xi))
    i, j = edges[:, 0], edges[:, 1]
    T_ij = se3.compose(se3.inverse(T_gt[i]), T_gt[j])

    graph = pg.PoseGraph(
        edge_i=jnp.asarray(i), edge_j=jnp.asarray(j),
        T_ij=T_ij, weight=jnp.ones(len(edges)),
    )
    dpose = jnp.asarray(rng.normal(0, 0.1, (N, 6))).at[0].set(0.0)
    T0 = jax.vmap(se3.right_plus)(T_gt, dpose)
    fixed = jnp.zeros(N, bool).at[0].set(True)
    T_est, res = pg.pose_graph_optimization(T0, graph, fixed)
    err = jax.vmap(
        lambda a, b: jnp.linalg.norm(se3.log(se3.compose(se3.inverse(a), b)))
    )(T_gt, T_est)
    assert float(jnp.max(err)) < 1e-6, np.asarray(err)
