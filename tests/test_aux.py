"""Auxiliary components: native track builder parity, BoW retrieval,
evaluation utilities."""

import numpy as np

from photometric_bundle_adjustment_tpu.features import bow
from photometric_bundle_adjustment_tpu.pipeline import native_tracks
from photometric_bundle_adjustment_tpu.pipeline import tracks as py_tracks
from photometric_bundle_adjustment_tpu.utils import evaluation


def random_matches(seed=0, n_pairs=200, n_feat=400):
    rng = np.random.default_rng(seed)
    imgs = [(f, c) for f in range(15) for c in range(2)]
    matches = {}
    for _ in range(n_pairs):
        i, j = rng.integers(0, len(imgs), 2)
        if i == j:
            continue
        n = int(rng.integers(5, 60))
        pairs = np.stack(
            [rng.choice(n_feat, n, replace=False),
             rng.choice(n_feat, n, replace=False)], -1,
        )
        matches[(imgs[i], imgs[j])] = pairs
    return matches


def test_native_tracks_match_python():
    matches = random_matches()
    a = py_tracks.build_tracks(matches, 3)
    b = native_tracks.build_tracks(matches, 3)
    sa = {frozenset(t.items()) for t in a.values()}
    sb = {frozenset(t.items()) for t in b.values()}
    assert sa == sb
    assert len(a) == len(b)


def test_bow_retrieval():
    rng = np.random.default_rng(1)
    # 20 distinct "scenes" of 50 descriptors each
    scenes = [rng.integers(0, 2**32, (50, 8), dtype=np.uint32) for _ in range(20)]
    voc = bow.build_vocabulary(np.concatenate(scenes), k=8, levels=2, seed=0)
    assert voc.num_words > 8

    db = bow.BowDatabase(voc.num_words)
    for i, s in enumerate(scenes):
        db.insert(("img", i), voc.transform(s))

    # query with a noisy copy of scene 7: flip a couple of bits per descriptor
    noisy = scenes[7].copy()
    noisy[:, 0] ^= 0b11
    res = db.query(voc.transform(noisy), 5)
    assert res[0][0] == ("img", 7)
    # self-similarity score must be the best (smallest)
    assert res[0][1] <= res[-1][1]


def test_ate_umeyama():
    rng = np.random.default_rng(2)
    traj = rng.normal(0, 2, (50, 3))
    # rotate + translate
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.3, -0.2, 0.8]).as_matrix()
    moved = traj @ R.T + np.array([4.0, -2.0, 1.0])
    assert evaluation.ate_rmse(moved, traj) < 1e-9
    # scaled needs with_scale
    scaled = moved * 1.7
    assert evaluation.ate_rmse(scaled, traj, with_scale=True) < 1e-9
    # noise shows up as ATE
    noisy = moved + rng.normal(0, 0.1, moved.shape)
    ate = evaluation.ate_rmse(noisy, traj)
    assert 0.05 < ate < 0.2


def test_epipolar_curve_overlay(tmp_path):
    """draw_epipolar_curves produces a PNG with the reference's fan
    construction (sfm.cpp:748-802) under a distorted model."""
    import jax.numpy as jnp
    import numpy as np

    from photometric_bundle_adjustment_tpu.core import se3
    from photometric_bundle_adjustment_tpu.utils import visualize

    img = (np.random.default_rng(0).uniform(0, 255, (480, 752))
           .astype(np.uint8))
    # EuRoC-ish stereo baseline
    T = np.asarray(se3.exp(jnp.asarray([0.11, 0.0, 0.0, 0.0, 0.003, 0.0])))
    intr = np.array([350.0, 350.0, 376.0, 240.0, -0.21, 0.58, 0.0, 0.0])
    out = tmp_path / "epi.png"
    visualize.draw_epipolar_curves(
        img, T, "ds", intr, str(out),
        uv=np.array([[100.0, 100.0], [400.0, 300.0]]),
    )
    assert out.exists() and out.stat().st_size > 10_000
