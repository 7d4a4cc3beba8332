"""Edge-sharded distributed pose-graph optimisation (parallel/dist_pgo)
must match the single-device SE3 pose-graph solve on the 8-device mesh
(BASELINE config #5: distributed pose-graph)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.core import se3
from photometric_bundle_adjustment_tpu.models import pose_graph as pg
from photometric_bundle_adjustment_tpu.optim.lm import LMConfig
from photometric_bundle_adjustment_tpu.parallel import dist_pgo
from photometric_bundle_adjustment_tpu.parallel import mesh as mesh_mod

from tests.test_pose_graph import random_graph


def _problem(N=14, extra_edges=19, seed=3, noise=0.02):
    edges, rng = random_graph(N, extra_edges=extra_edges, seed=seed)
    xi = rng.normal(0, 0.4, (N, 6))
    xi[0] = 0
    T_gt = se3.exp(jnp.asarray(xi))
    i, j = edges[:, 0], edges[:, 1]
    T_ij = se3.compose(se3.inverse(T_gt[i]), T_gt[j])
    if noise:
        T_ij = jax.vmap(se3.right_plus)(
            T_ij, jnp.asarray(rng.normal(0, noise, (len(edges), 6)))
        )
    graph = pg.PoseGraph(
        edge_i=jnp.asarray(i), edge_j=jnp.asarray(j),
        T_ij=T_ij, weight=jnp.ones(len(edges)),
    )
    dpose = jnp.asarray(rng.normal(0, 0.1, (N, 6))).at[0].set(0.0)
    T0 = jax.vmap(se3.right_plus)(T_gt, dpose)
    fixed = jnp.zeros(N, bool).at[0].set(True)
    return T_gt, T0, graph, fixed


@pytest.mark.slow
def test_dist_pgo_matches_single_device():
    T_gt, T0, graph, fixed = _problem()
    T_ref, res = pg.pose_graph_optimization(T0, graph, fixed)

    mesh = mesh_mod.make_mesh(8)
    sharded = dist_pgo.prepare(graph, mesh)
    # edge axis padded to a multiple of 8, pad edges weighted 0
    assert sharded.graph.edge_i.shape[0] % 8 == 0
    solve = dist_pgo.make_distributed_pgo(mesh)
    T_dist, (c0, c1, iters) = solve(
        T0, sharded, fixed, LMConfig(max_iterations=50,
                                     function_tolerance=1e-16)
    )
    assert iters > 0
    # same optimum as the single-device dense-LM solve
    assert c1 <= float(res.cost) * (1 + 1e-6) + 1e-12
    err = jax.vmap(
        lambda a, b: jnp.linalg.norm(se3.log(se3.compose(se3.inverse(a), b)))
    )(T_ref, T_dist)
    assert float(jnp.max(err)) < 1e-5, np.asarray(err)


@pytest.mark.slow
def test_dist_pgo_noise_free_recovers_gt():
    T_gt, T0, graph, fixed = _problem(N=10, extra_edges=12, seed=2, noise=0.0)
    mesh = mesh_mod.make_mesh(8)
    solve = dist_pgo.make_distributed_pgo(mesh)
    T_dist, (c0, c1, iters) = solve(
        T0, dist_pgo.prepare(graph, mesh), fixed,
        LMConfig(max_iterations=50, function_tolerance=1e-16),
    )
    err = jax.vmap(
        lambda a, b: jnp.linalg.norm(se3.log(se3.compose(se3.inverse(a), b)))
    )(T_gt, T_dist)
    assert float(jnp.max(err)) < 1e-6, np.asarray(err)
    assert c1 < 1e-12 * max(c0, 1.0)
