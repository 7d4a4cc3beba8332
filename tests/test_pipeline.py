"""End-to-end incremental SfM on a small real EuRoC subset (CPU):
the full state machine must add all cameras, build a consistent map, and
produce sub-pixel mean reprojection error."""

import os

import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.io import calib_io, dataset
from photometric_bundle_adjustment_tpu.pipeline import tracks as tracks_mod
from photometric_bundle_adjustment_tpu.pipeline.config import SfmConfig
from photometric_bundle_adjustment_tpu.pipeline.sfm_pipeline import SfmPipeline

DATA = "/root/reference/data/euroc_V1"
CALIB = "/root/reference/data/euroc_calib"


def test_union_find_tracks():
    matches = {
        ((0, 0), (0, 1)): [(1, 2), (3, 4)],
        ((0, 1), (1, 0)): [(2, 7), (4, 9)],
        ((1, 0), (1, 1)): [(7, 5)],
    }
    tracks = tracks_mod.build_tracks(matches, min_track_length=3)
    # track {(0,0):1, (0,1):2, (1,0):7, (1,1):5} has length 4
    lens = sorted(len(t) for t in tracks.values())
    assert lens == [3, 4]

    # conflicting track (same image twice) must be dropped
    matches2 = {
        ((0, 0), (0, 1)): [(1, 2)],
        ((0, 1), (1, 0)): [(2, 7)],
        ((1, 0), (0, 0)): [(7, 8)],  # loops back to image (0,0), new feature
    }
    tracks2 = tracks_mod.build_tracks(matches2, min_track_length=2)
    assert len(tracks2) == 0


@pytest.fixture(scope="module")
def mini_pipeline():
    if not os.path.isdir(DATA):
        pytest.skip("reference dataset not available")
    images, _ = dataset.load_images(DATA, max_frames=3)
    # intrinsics produced by our own calibration app on euroc_calib
    calib = calib_io.load_calibration(
        os.path.join(os.path.dirname(__file__), "data", "opt_calib_ds.json")
    )
    cfg = SfmConfig(match_chunk_pairs=8)
    pipe = SfmPipeline(images, calib, cfg, seed=0, log=lambda *a: None)
    pipe.run()
    return pipe


@pytest.mark.slow
def test_pipeline_completes(mini_pipeline):
    pipe = mini_pipeline
    assert len(pipe.corners) == 6
    assert len(pipe.tracks) > 50
    # with the normalised-DLT PnP the 3-frame bootstrap maps every camera
    assert len(pipe.cameras) == 6, sorted(pipe.cameras)
    assert len(pipe.landmarks) > 100
    # observations must reference mapped cameras only
    for lm in pipe.landmarks.values():
        for fcid in lm.obs:
            assert fcid in pipe.cameras


def test_pipeline_reprojection_quality(mini_pipeline):
    pipe = mini_pipeline
    rows, err, flags = pipe.compute_projections()
    inlier = ~np.fromiter((r[3] for r in rows), bool, len(rows))
    assert inlier.sum() > 0
    mean_err = float(np.mean(err[inlier]))
    assert mean_err < 3.0, f"mean reprojection {mean_err}px"
    # lazy per-image records must agree with the arrays
    proj = pipe.image_projections
    errs2 = [rec["err"] for d in proj.values() for rec in d["obs"]]
    assert len(errs2) == int(inlier.sum())
    assert abs(float(np.mean(errs2)) - mean_err) < 1e-9


@pytest.mark.slow
def test_pipeline_bow_matching(mini_pipeline):
    """BoW-candidate matching path (match_bow, sfm.cpp:1355-1452): build a
    vocabulary from the map's own descriptors and re-run matching."""
    import numpy as np

    from photometric_bundle_adjustment_tpu.features import bow
    from photometric_bundle_adjustment_tpu.pipeline.config import SfmConfig
    from photometric_bundle_adjustment_tpu.pipeline.sfm_pipeline import SfmPipeline

    src = mini_pipeline
    descs = np.concatenate(
        [c["desc"][c["valid"]] for c in src.corners.values()]
    )
    voc = bow.build_vocabulary(descs[:2000], k=8, levels=2, seed=0)

    cfg = SfmConfig(use_match_bow=True, num_bow_candidates=4,
                    match_chunk_pairs=8)
    pipe = SfmPipeline(src.images, src.calib, cfg, log=lambda *a: None)
    pipe.bow_voc = voc
    pipe.corners = src.corners  # reuse detected features
    pipe.match_stereo()
    pipe.match_bow()
    # BoW path must produce non-stereo pair matches with inliers
    non_stereo = [k for k in pipe.matches if k[0][0] != k[1][0]]
    assert len(non_stereo) > 0
    assert sum(len(pipe.matches[k]["inliers"]) for k in non_stereo) > 50


def test_global_initialization(mini_pipeline):
    """Rotation/translation averaging bootstrap (global.h capability) must
    agree with the incremental reconstruction in the shared gauge."""
    from photometric_bundle_adjustment_tpu.pipeline import global_init
    from photometric_bundle_adjustment_tpu.pipeline.config import SfmConfig
    from photometric_bundle_adjustment_tpu.pipeline.sfm_pipeline import SfmPipeline

    src = mini_pipeline
    pipe = SfmPipeline(src.images, src.calib, SfmConfig(),
                       log=lambda *a: None)
    pipe.corners = src.corners
    pipe.matches = src.matches
    pipe.tracks = dict(src.tracks)

    fcids = global_init.global_initialize(pipe, log=lambda *a: None)
    assert len(fcids) == 6              # all cameras connected
    assert len(pipe.landmarks) > 80

    # polish with one BA and compare against the incremental solution
    pipe.optimize()
    import numpy as np

    shared = [f for f in pipe.cameras if f in src.cameras]
    assert len(shared) == 6
    dpos = [
        np.linalg.norm(np.asarray(pipe.cameras[f])[:3]
                       - np.asarray(src.cameras[f])[:3])
        for f in shared
    ]
    assert float(np.median(dpos)) < 0.05, dpos


@pytest.mark.slow
def test_optimize_intrinsics_option():
    """The reference's optimize_intrinsics BA option (map_utils.h:339-345):
    alternation refinement must run and keep (or improve) map quality."""
    if not os.path.isdir(DATA):
        pytest.skip("reference dataset not available")
    images, _ = dataset.load_images(DATA, max_frames=3)
    calib = calib_io.load_calibration(
        os.path.join(os.path.dirname(__file__), "data", "opt_calib_ds.json")
    )
    calib.intrinsics = np.asarray(calib.intrinsics).copy()
    fx0 = float(calib.intrinsics[0][0])
    cfg = SfmConfig(match_chunk_pairs=8, ba_optimize_intrinsics=True)
    logs = []
    pipe = SfmPipeline(images, calib, cfg, seed=0, log=logs.append)
    pipe.run()
    assert len(pipe.cameras) == 6
    # the refinement stage ran and reported monotone cost
    ref_lines = [s for s in logs if s.startswith("Intrinsics refinement")]
    assert ref_lines, logs[-5:]
    # intrinsics were actually updated (self-calibration from 3 frames is
    # near-degenerate — the reference's joint version is flagged broken,
    # map_utils.h:339 — so we assert consistency, not ground-truth recovery)
    assert float(pipe.calib.intrinsics[0][0]) != fx0
    from photometric_bundle_adjustment_tpu.utils import evaluation

    stats = evaluation.reprojection_stats(pipe)
    assert stats["mean_px"] < 1.0


def test_params_file_live_reload(tmp_path):
    """--params-file: SfmConfig fields update in place between steps (the
    headless analog of the reference's Pangolin parameter panel)."""
    import json

    calib = calib_io.load_calibration(
        os.path.join(os.path.dirname(__file__), "data", "opt_calib_ds.json")
    )
    images = {(0, 0): np.zeros((32, 32), np.uint8)}
    pf = tmp_path / "params.json"
    logs = []
    pipe = SfmPipeline(images, calib, SfmConfig(), log=logs.append,
                       params_file=str(pf))
    pipe._maybe_reload_params()  # file absent: no-op
    assert pipe.cfg.feature_match_max_dist == 70

    pf.write_text(json.dumps(
        {"feature_match_max_dist": 50, "reprojection_error_huber_pixel": 2,
         "no_such_knob": 1}
    ))
    pipe._maybe_reload_params()
    assert pipe.cfg.feature_match_max_dist == 50
    # ints coerce to the field's existing type (float)
    assert pipe.cfg.reprojection_error_huber_pixel == 2.0
    assert isinstance(pipe.cfg.reprojection_error_huber_pixel, float)
    assert any("unknown parameter" in s for s in logs)
    assert any("Parameters updated" in s for s in logs)

    # unchanged mtime: no re-read; half-written JSON: survives and retries
    pipe._maybe_reload_params()
    pf.write_text("{not json")
    os.utime(pf, (1e9, 1e9 + 1))
    pipe._maybe_reload_params()
    assert any("not reloaded" in s for s in logs)
    assert pipe.cfg.feature_match_max_dist == 50


def test_outlier_policy_matches_scalar_oracle():
    """The vectorised outlier policy (pipeline.sfm_pipeline.outlier_policy)
    must be bit-identical to the reference's per-track scan loop
    (sfm.cpp:2028-2131) — counters feed reference-matching log strings."""
    import numpy as np

    from photometric_bundle_adjustment_tpu.pipeline.sfm_pipeline import (
        OUTLIER_CAMERA_DISTANCE,
        OUTLIER_REPROJECTION_HUGE,
        OUTLIER_REPROJECTION_NORMAL,
        OUTLIER_Z_COORDINATE,
        outlier_policy,
    )

    def oracle(tid_k, fl):
        # the original scalar loop, verbatim semantics
        track = {}
        for t, f in zip(tid_k.tolist(), fl.tolist()):
            track.setdefault(t, []).append(f)
        any_severe = any(
            f & ~OUTLIER_REPROJECTION_NORMAL
            for fs in track.values() for f in fs
        )
        n_normal = n_huge = n_dist = n_z = 0
        removed = []
        for tid, fs in track.items():
            remove = False
            normal_counted = False
            for f in fs:
                if f & OUTLIER_REPROJECTION_HUGE:
                    n_huge += 1
                    remove = True
                    break
                if f & OUTLIER_REPROJECTION_NORMAL:
                    if not normal_counted:
                        n_normal += 1
                        normal_counted = True
                    if not any_severe:
                        remove = True
                        break
                if f & OUTLIER_CAMERA_DISTANCE:
                    remove = True
                    n_dist += 1
                    break
                if f & OUTLIER_Z_COORDINATE:
                    remove = True
                    n_z += 1
                    break
            if remove:
                removed.append(tid)
        return removed, n_huge, n_normal, n_dist, n_z, any_severe

    rng = np.random.default_rng(0)
    for trial in range(200):
        n_tracks = int(rng.integers(1, 30))
        rows_t, rows_f = [], []
        for t in range(n_tracks):
            for _ in range(int(rng.integers(1, 8))):
                rows_t.append(t * 7 + 3)
                # bias towards clean rows; occasionally force the
                # all-normal (not any_severe) regime
                if trial % 3 == 0:
                    f = int(rng.choice([0, 0, 0, 2]))
                else:
                    f = int(rng.integers(0, 16)) if rng.random() < 0.3 else 0
                rows_f.append(f)
        tid_k = np.asarray(rows_t, np.int64)
        fl = np.asarray(rows_f, np.int32)
        got = outlier_policy(tid_k, fl)
        want = oracle(tid_k, fl)
        assert got == want, (trial, got, want)

    # empty input
    assert outlier_policy(np.zeros(0, np.int64), np.zeros(0, np.int32)) \
        == ([], 0, 0, 0, 0, False)
