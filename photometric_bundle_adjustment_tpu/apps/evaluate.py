"""Compare two saved maps: ATE after SE3/Sim3 alignment, stereo-baseline
consistency, and map statistics.

Formalises the framework's regression oracle (the reference has none —
SURVEY §4; its de-facto validation is console counters + GUI overlays):

    python -m photometric_bundle_adjustment_tpu.apps.evaluate \
        --map map_a.pkl --ref map_b.pkl [--calib opt_calib.json]

With only --map, prints that map's own statistics (stereo baseline vs the
calibrated extrinsics, trajectory extent, landmark/observation counts).
"""

from __future__ import annotations

import argparse
import json
import pickle


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _stereo_baselines(cameras: dict):
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from photometric_bundle_adjustment_tpu.core import se3

    frames = sorted({f for (f, c) in cameras})
    bl = []
    for f in frames:
        if (f, 0) in cameras and (f, 1) in cameras:
            rel = se3.compose(
                se3.inverse(jnp.asarray(cameras[(f, 0)])),
                jnp.asarray(cameras[(f, 1)]),
            )
            bl.append(float(jnp.linalg.norm(se3.translation(rel))))
    return np.asarray(bl)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Map evaluation")
    parser.add_argument("--map", required=True, help="map pickle to evaluate")
    parser.add_argument("--ref", default=None,
                        help="reference map pickle for ATE comparison")
    parser.add_argument("--calib", default=None,
                        help="calibration JSON (for the baseline target)")
    parser.add_argument("--with-scale", action="store_true",
                        help="Sim3 (scale-corrected) alignment for ATE")
    args = parser.parse_args(argv)

    import numpy as np

    from photometric_bundle_adjustment_tpu.utils import evaluation

    m = _load(args.map)
    cams = m["cameras"]
    def _obs_of(lm):
        return lm["obs"] if isinstance(lm, dict) else lm.obs

    out = {
        "cameras": len(cams),
        "landmarks": len(m.get("landmarks", {})),
        "observations": sum(
            len(_obs_of(lm)) for lm in m.get("landmarks", {}).values()
        ) if m.get("landmarks") else None,
    }
    ps = np.stack([np.asarray(T)[:3] for T in cams.values()])
    ext = ps.max(0) - ps.min(0)
    out["trajectory_extent_m"] = [round(float(x), 3) for x in ext]

    bl = _stereo_baselines(cams)
    if len(bl):
        out["stereo_baseline_median_m"] = round(float(np.median(bl)), 4)
        out["stereo_baseline_std_m"] = round(float(bl.std()), 4)
    if args.calib:
        from photometric_bundle_adjustment_tpu.io import calib_io

        calib = calib_io.load_calibration(args.calib)
        t = np.asarray(calib.T_i_c[1])[:3] - np.asarray(calib.T_i_c[0])[:3]
        out["stereo_baseline_calibrated_m"] = round(
            float(np.linalg.norm(t)), 4
        )

    if args.ref:
        ref = _load(args.ref)
        shared = sorted(set(cams) & set(ref["cameras"]))
        out["shared_cameras"] = len(shared)
        if len(shared) >= 3:
            est = np.stack([np.asarray(cams[f])[:3] for f in shared])
            gt = np.stack([np.asarray(ref["cameras"][f])[:3] for f in shared])
            out["ate_rmse_m"] = round(
                evaluation.ate_rmse(est, gt, with_scale=args.with_scale), 4
            )
            s, R, t = evaluation.umeyama_alignment(
                est, gt, with_scale=args.with_scale
            )
            aligned = (s * (R @ est.T)).T + t
            err = np.linalg.norm(aligned - gt, axis=1)
            out["ate_median_m"] = round(float(np.median(err)), 4)
            out["ate_p95_m"] = round(float(np.percentile(err, 95)), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
