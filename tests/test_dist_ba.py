"""Distributed BA on an 8-device (fake CPU) mesh: the sharded solve must
match the single-device solve bit-for-bit-ish and actually run partitioned."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba
from photometric_bundle_adjustment_tpu.parallel import dist_ba, mesh as mesh_mod


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_distributed_matches_single_device():
    problem, poses_gt, _ = synthetic.synth_ba_problem(
        K=6, L=128, seed=3, pixel_noise=0.3
    )
    cfg = ba.BAConfig(max_iterations=10)

    solved_1, res_1 = geometric_ba.bundle_adjustment(problem, "pinhole", cfg)

    mesh = mesh_mod.make_mesh(8)
    sharded = dist_ba.prepare(problem, mesh)
    solve = dist_ba.distributed_solver(
        geometric_ba.make_residual_fn("pinhole"), geometric_ba.cam_retract, 6,
        mesh, rj_fn=geometric_ba.make_rj_fn("pinhole"),
    )
    solved_8, res_8 = solve(sharded, cfg)

    np.testing.assert_allclose(float(res_1.cost), float(res_8.cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(solved_1.cam_states), np.asarray(solved_8.cam_states),
        atol=1e-8,
    )
    # landmark ordering is preserved by the stable sort over an already
    # sorted-by-landmark synthetic problem after reordering; compare sets
    np.testing.assert_allclose(
        np.sort(np.asarray(solved_1.inv_depth)),
        np.sort(np.asarray(solved_8.inv_depth)[: problem.inv_depth.shape[0]]),
        rtol=1e-8,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sharding_actually_partitions():
    problem, _, _ = synthetic.synth_ba_problem(K=4, L=128, seed=1)
    mesh = mesh_mod.make_mesh(8)
    sharded = dist_ba.prepare(problem, mesh)
    # landmark array must be split across all 8 devices
    assert len(sharded.inv_depth.sharding.device_set) == 8
    shard_sizes = {s.data.shape[0] for s in sharded.inv_depth.addressable_shards}
    assert shard_sizes == {128 // 8}
    assert len(sharded.obs.valid.sharding.device_set) == 8


def test_memory_budget_guard():
    """Maps whose dense H_cp exceeds the per-device budget are refused
    with a pointer to the partitioned solver (code guard, not docstring)."""
    problem, _, _ = synthetic.synth_ba_problem(K=6, L=128, seed=3)
    # small map passes
    dist_ba.check_memory_budget(problem, n_devices=8)
    # tiny budget triggers the guard deterministically
    with pytest.raises(ValueError, match="camera_partition=True"):
        dist_ba.check_memory_budget(problem, n_devices=1, budget_bytes=1024)
