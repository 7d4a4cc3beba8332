"""Calibration NLLS on a subset of the real euroc_calib dataset (golden data
from the reference repo) + JSON round-trip compatibility."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.core import cameras
from photometric_bundle_adjustment_tpu.io import calib_io
from photometric_bundle_adjustment_tpu.models import calibration as calib_model

DATA = "/root/reference/data/euroc_calib"


@pytest.fixture(scope="module")
def calib_inputs():
    if not os.path.isdir(DATA):
        pytest.skip("reference dataset not available")
    poses = calib_io.load_init_poses(os.path.join(DATA, "init_poses.json"))
    corners = calib_io.load_detected_corners(
        os.path.join(DATA, "detected_corners.json")
    )
    init = calib_io.load_ds_calibration(
        os.path.join(DATA, "calibration-double-sphere.json")
    )
    return poses, corners, init


def test_json_loading_shapes(calib_inputs):
    poses, corners, init = calib_inputs
    assert len(poses) == 104 and len(corners) == 104
    assert init.T_i_c.shape == (2, 7)
    assert init.intrinsics.shape == (2, 8)
    some = next(iter(corners.values()))
    assert some["corners"].shape[1] == 2
    assert some["corners"].shape[0] == len(some["corner_ids"])


@pytest.mark.slow
def test_calibration_subset_converges(calib_inputs):
    poses, corners, init = calib_inputs
    frame_ids = sorted({f for (f, _) in corners})[:8]
    sub = {k: v for k, v in corners.items() if k[0] in frame_ids}

    T_w_i0 = np.stack([poses[(f, 0)] for f in frame_ids])
    intr0 = np.stack(
        [np.asarray(cameras.initialize("ds", init.intrinsics[c])) for c in range(2)]
    )
    grid3d = calib_model.aprilgrid_corners_3d()
    data = calib_model.build_data(sub, frame_ids, grid3d)
    params0 = calib_model.CalibParams(
        T_w_i=jnp.asarray(T_w_i0),
        T_i_c=jnp.asarray(init.T_i_c),
        intrinsics=jnp.asarray(intr0),
    )
    params, res = calib_model.calibrate("ds", data, params0, max_iterations=30)
    n_res = data.uv.shape[0] * 2
    rmse = float(jnp.sqrt(2.0 * float(res.cost) / n_res))
    assert rmse < 0.5, f"rmse {rmse}px"
    # focal lengths should stay in a sane range
    fx = np.asarray(params.intrinsics)[:, 0]
    assert np.all((fx > 200) & (fx < 600))


def test_calibration_json_roundtrip(tmp_path):
    calib = calib_io.Calibration(
        T_i_c=np.array([[0, 0, 0, 0, 0, 0, 1.0], [0.1, 0, 0, 0, 0, 0, 1.0]]),
        intrinsics=np.array([[380.0, 380, 500, 250, 0.01, -0.001, 0, 0]] * 2),
        cam_types=["kb4", "kb4"],
        widths=[752, 752],
        heights=[480, 480],
    )
    path = str(tmp_path / "opt_calib.json")
    calib_io.save_calibration(path, calib)
    back = calib_io.load_calibration(path)
    np.testing.assert_allclose(back.T_i_c, calib.T_i_c)
    np.testing.assert_allclose(back.intrinsics, calib.intrinsics)
    assert back.cam_types == ["kb4", "kb4"]
    assert back.widths == [752, 752]

    # field names must match the cereal layout exactly
    import json

    with open(path) as f:
        root = json.load(f)["value0"]
    assert set(root) == {"cam.T_i_c", "cam.intrinsics"}
    c0 = root["cam.intrinsics"][0]
    assert {"cam_type", "fx", "fy", "cx", "cy", "p1", "p2", "p3", "p4",
            "width", "height"} <= set(c0)
    p0 = root["cam.T_i_c"][0]
    assert {"px", "py", "pz", "qx", "qy", "qz", "qw"} == set(p0)
