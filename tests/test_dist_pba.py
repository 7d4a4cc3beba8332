"""Distributed photometric BA on the 8-device fake mesh: sharded solve must
match single-device, and the (host, chip) 2-D mesh shape must build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.models import photometric_ba as pba
from photometric_bundle_adjustment_tpu.models import synthetic
from photometric_bundle_adjustment_tpu.optim import ba
from photometric_bundle_adjustment_tpu.parallel import dist_ba, mesh as mesh_mod


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_distributed_photometric_matches_single():
    problem, images_flat, H, W, _, _ = synthetic.synth_pba_problem(
        K=4, L=64, dtype=jnp.float32
    )
    cfg = ba.BAConfig(max_iterations=6, huber_delta=9.0)

    solve_1 = pba.make_solver("pinhole", images_flat, H, W)
    solved_1, res_1 = solve_1(problem, cfg)

    mesh = mesh_mod.make_mesh(8)
    sharded = dist_ba.prepare(problem, mesh)
    solve_8 = dist_ba.distributed_solver(
        pba.make_residual_fn("pinhole", images_flat, H, W), pba.cam_retract,
        8, mesh,
        rj_fn=pba.make_rj_fn("pinhole", images_flat, H, W),
    )
    solved_8, res_8 = solve_8(sharded, cfg)

    np.testing.assert_allclose(float(res_1.cost), float(res_8.cost), rtol=1e-5)
    # single-device vs 8-shard psum reduce in different f32 summation
    # orders; over 6 LM iterations the pose params drift a few 1e-5 apart
    # (the costs above still agree to 1e-5 relative)
    np.testing.assert_allclose(
        np.asarray(solved_1.cam_states.pose),
        np.asarray(solved_8.cam_states.pose), atol=2e-4,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_host_chip_mesh_shape():
    mesh = mesh_mod.make_host_chip_mesh(2, 4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("host", "data")
