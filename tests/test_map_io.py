"""Map persistence round-trip (npz container) + visualization smoke test."""

import numpy as np

from photometric_bundle_adjustment_tpu.io import map_io


class FakePipe:
    def __init__(self):
        self.cameras = {
            (0, 0): np.array([0, 0, 0, 0, 0, 0, 1.0]),
            (0, 1): np.array([0.1, 0, 0, 0, 0, 0, 1.0]),
            (1, 0): np.array([0.2, 0.1, 0, 0, 0, 0.1, 0.99]),
        }
        from photometric_bundle_adjustment_tpu.pipeline.sfm_pipeline import Landmark

        self.landmarks = {
            5: Landmark(0.25, {(0, 0): 7, (0, 1): 9}, {(1, 0): 3}),
            9: Landmark(0.5, {(0, 0): 1, (1, 0): 2}),
        }
        self.tracks = {5: {(0, 0): 7, (0, 1): 9, (1, 0): 3},
                       9: {(0, 0): 1, (1, 0): 2}}
        self.outlier_tracks = {11: {(0, 0): 4, (0, 1): 6}}


def test_map_roundtrip(tmp_path):
    pipe = FakePipe()
    path = str(tmp_path / "map.npz")
    map_io.save_map(path, pipe)
    cameras, landmarks, tracks, outlier_tracks = map_io.load_map(path)

    assert set(cameras) == set(pipe.cameras)
    np.testing.assert_allclose(cameras[(1, 0)], pipe.cameras[(1, 0)])
    assert set(landmarks) == {5, 9}
    assert landmarks[5]["inv_depth"] == 0.25
    assert landmarks[5]["obs"] == {(0, 0): 7, (0, 1): 9}
    assert landmarks[5]["outlier_obs"] == {(1, 0): 3}
    assert tracks == pipe.tracks
    assert outlier_tracks == pipe.outlier_tracks


def test_visualize_smoke(tmp_path):
    from photometric_bundle_adjustment_tpu.utils import visualize

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 80)).astype(np.uint8)
    uv = rng.uniform(0, 60, (20, 2))
    visualize.draw_keypoints(img, uv, str(tmp_path / "kp.png"))
    pairs = np.stack([np.arange(10), np.arange(10)], -1)
    visualize.draw_matches(img, img, uv, uv, pairs, str(tmp_path / "m.png"))
    assert (tmp_path / "kp.png").exists()
    assert (tmp_path / "m.png").exists()
