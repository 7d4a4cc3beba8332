"""Global SfM initialisation: rotation + translation averaging over the
pairwise match graph, then triangulation and one full BA.

The reference carries the averaging residuals for exactly this
(RotationAveragingCostFunctor / TranslationAveragingCostFunctor,
include/visnav/global.h:44-86) but never wires them into the pipeline;
this module completes the capability: a non-incremental bootstrap that
recovers every connected camera at once from the relative-pose
measurements, then lets the Schur-LM bundle adjustment polish.

Conventions: a match entry's ``T_i_j`` transforms camera-j coordinates to
camera-i coordinates (common_types.h:131-133), so its rotation is exactly
the functor's ``R_i_j`` and camera j's centre seen from i is its
translation; in the world frame the measured direction is
``R_wi @ t_ij / ||.||``.  Metric scale enters through the two fixed
cameras of the calibrated stereo pair (the same gauge as the incremental
path, sfm.cpp:1903).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.core import se3
from photometric_bundle_adjustment_tpu.features import geometry
from photometric_bundle_adjustment_tpu.models import pose_graph as pg


def build_edges(pipe, min_edge_inliers: int = 16):
    """Collect relative-pose edges from the match table."""
    edges = []
    for (fi, fj), md in pipe.matches.items():
        n = len(md["inliers"])
        if n < min_edge_inliers:
            continue
        edges.append((fi, fj, np.asarray(md["T_i_j"], np.float64), n))
    return edges


def global_initialize(
    pipe,
    min_edge_inliers: int = 16,
    max_iterations: int = 60,
    log=print,
):
    """Estimate all connected camera poses by averaging, write them into
    ``pipe.cameras``, and triangulate landmarks for all tracks visible in
    >= 2 mapped cameras.  Returns the list of mapped fcids."""
    edges = build_edges(pipe, min_edge_inliers)
    if not edges:
        log("Global init: no usable edges.")
        return []

    # connected component containing (0, 0)
    adj: dict = {}
    for fi, fj, _, _ in edges:
        adj.setdefault(fi, set()).add(fj)
        adj.setdefault(fj, set()).add(fi)
    root = (0, 0)
    if root not in adj:
        log("Global init: reference camera has no edges.")
        return []
    seen = {root}
    stack = [root]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    fcids = sorted(seen)
    index = {f: i for i, f in enumerate(fcids)}
    N = len(fcids)
    log(f"Global init: {N} cameras in the connected component, "
        f"{len(edges)} edges.")

    ei, ej, q_ij, t_hat_cam, w = [], [], [], [], []
    for fi, fj, T, n in edges:
        if fi not in index or fj not in index:
            continue
        ei.append(index[fi])
        ej.append(index[fj])
        q_ij.append(T[3:7])
        t = T[:3]
        norm = np.linalg.norm(t)
        t_hat_cam.append(t / norm if norm > 1e-9 else t * 0.0)
        w.append(np.sqrt(n))
    ei = jnp.asarray(np.asarray(ei, np.int32))
    ej = jnp.asarray(np.asarray(ej, np.int32))
    q_ij = jnp.asarray(np.stack(q_ij))
    t_hat_cam = jnp.asarray(np.stack(t_hat_cam))
    w = jnp.asarray(np.asarray(w))
    w = w / jnp.mean(w)

    # ---- rotation averaging (global.h:44-63 residuals) ----
    quats0 = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (N, 1))
    fixed_rot = jnp.zeros(N, bool).at[index[root]].set(True)
    rgraph = pg.RotationGraph(edge_i=ei, edge_j=ej, q_ij=q_ij, weight=w)
    # spanning-tree initialisation: chain measured rotations outward
    quats_init = np.tile([0.0, 0, 0, 1.0], (N, 1))
    placed = {index[root]}
    changed = True
    e_np = np.stack([np.asarray(ei), np.asarray(ej)], 1)
    q_np = np.asarray(q_ij)
    while changed:
        changed = False
        for k, (a, b) in enumerate(e_np):
            if a in placed and b not in placed:
                # R_wj = R_wi * R_i_j
                quats_init[b] = np.asarray(
                    se3.quat_mul(jnp.asarray(quats_init[a]),
                                 jnp.asarray(q_np[k]))
                )
                placed.add(b)
                changed = True
            elif b in placed and a not in placed:
                quats_init[a] = np.asarray(
                    se3.quat_mul(jnp.asarray(quats_init[b]),
                                 se3.quat_conj(jnp.asarray(q_np[k])))
                )
                placed.add(a)
                changed = True
    quats, rres = pg.rotation_averaging(
        jnp.asarray(quats_init), rgraph, fixed_rot,
        max_iterations=max_iterations,
    )
    log(f"Rotation averaging: cost {float(rres.initial_cost):.4e} -> "
        f"{float(rres.cost):.4e} in {int(rres.iterations)} iterations")

    # ---- translation averaging (global.h:65-86 residuals) ----
    # measured world-frame direction of (c_j - c_i): R_wi @ t_ij
    t_world = jax.vmap(se3.quat_rotate)(quats[ei], t_hat_cam)
    tgraph = pg.TranslationGraph(
        edge_i=ei, edge_j=ej, t_hat_ij=t_world, weight=w
    )
    # metric stereo edges: every mapped stereo pair has a KNOWN metric
    # relative translation from the calibration — these anchor the global
    # scale that direction-only residuals leave weakly constrained
    T_0_1_cal = se3.compose(
        se3.inverse(jnp.asarray(pipe.calib.T_i_c[0])),
        jnp.asarray(pipe.calib.T_i_c[1]),
    )
    t_stereo_cam = se3.translation(T_0_1_cal)
    mi, mj = [], []
    for f in sorted({f for (f, c) in index}):
        if (f, 0) in index and (f, 1) in index:
            mi.append(index[(f, 0)])
            mj.append(index[(f, 1)])
    metric = None
    if mi:
        mi = jnp.asarray(np.asarray(mi, np.int32))
        mj = jnp.asarray(np.asarray(mj, np.int32))
        t_m = jax.vmap(se3.quat_rotate)(
            quats[mi], jnp.broadcast_to(t_stereo_cam, (mi.shape[0], 3))
        )
        # weight chosen so ~1 cm converged stereo error sits at the Huber
        # boundary of translation_averaging (delta 0.1)
        metric = pg.MetricEdges(
            edge_i=mi, edge_j=mj, t_ij_world=t_m,
            weight=jnp.full((mi.shape[0],), 10.0, t_m.dtype),
        )
    # gauge: camera (0,0) at origin; (0,1) at the calibrated stereo offset
    t0 = np.zeros((N, 3))
    fixed_tr = np.zeros(N, bool)
    fixed_tr[index[root]] = True
    if (0, 1) in index:
        T_i_c0 = jnp.asarray(pipe.calib.T_i_c[0])
        T_i_c1 = jnp.asarray(pipe.calib.T_i_c[1])
        T_0_1 = se3.compose(se3.inverse(T_i_c0), T_i_c1)
        t0[index[(0, 1)]] = np.asarray(se3.translation(T_0_1))
        fixed_tr[index[(0, 1)]] = True
    # simple spanning-tree position init with unit edge lengths
    pos_placed = {index[root]}
    if (0, 1) in index:
        pos_placed.add(index[(0, 1)])
    t_world_np = np.asarray(t_world)
    changed = True
    while changed:
        changed = False
        for k, (a, b) in enumerate(e_np):
            if a in pos_placed and b not in pos_placed:
                t0[b] = t0[a] + 0.3 * t_world_np[k]
                pos_placed.add(b)
                changed = True
            elif b in pos_placed and a not in pos_placed:
                t0[a] = t0[b] - 0.3 * t_world_np[k]
                pos_placed.add(a)
                changed = True
    trans, tres = pg.translation_averaging(
        jnp.asarray(t0), tgraph, jnp.asarray(fixed_tr),
        max_iterations=max_iterations, metric=metric,
    )
    log(f"Translation averaging: cost {float(tres.initial_cost):.4e} -> "
        f"{float(tres.cost):.4e} in {int(tres.iterations)} iterations")

    # Direction-only residuals leave the global scale weakly constrained
    # (the two fixed cameras pin it in theory, but the solve can settle in
    # a uniformly rescaled local optimum).  Re-anchor metric scale with the
    # calibrated stereo baseline, measured over ALL mapped stereo pairs
    # (median — robust), then re-polish the translations.
    trans_np = np.asarray(trans)
    if (0, 1) in index:
        calib_baseline = float(np.linalg.norm(np.asarray(t0[index[(0, 1)]])))
        frames = sorted({f for (f, c) in index})
        measured = [
            np.linalg.norm(trans_np[index[(f, 1)]] - trans_np[index[(f, 0)]])
            for f in frames
            if (f, 0) in index and (f, 1) in index
        ]
        if measured and calib_baseline > 0:
            scale = calib_baseline / float(np.median(measured))
            if abs(scale - 1.0) > 1e-3:
                log(f"Global init: re-anchoring scale by x{scale:.4f} "
                    f"(median stereo baseline {np.median(measured):.4f} m "
                    f"vs calibrated {calib_baseline:.4f} m)")
                trans_rescaled = trans_np * scale
                trans_rescaled[index[root]] = 0.0
                if (0, 1) in index:
                    trans_rescaled[index[(0, 1)]] = np.asarray(
                        t0[index[(0, 1)]]
                    )
                trans, tres = pg.translation_averaging(
                    jnp.asarray(trans_rescaled), tgraph,
                    jnp.asarray(fixed_tr), max_iterations=max_iterations,
                    metric=metric,
                )
                trans_np = np.asarray(trans)
                # keep the better-scaled iterate even if the direction cost
                # ties (directions are scale-invariant)
                log(
                    "Translation averaging (rescaled): cost "
                    f"{float(tres.initial_cost):.4e} -> "
                    f"{float(tres.cost):.4e} in {int(tres.iterations)} "
                    "iterations"
                )

    poses = np.concatenate([trans_np, np.asarray(quats)], axis=1)
    pipe.clear_map()
    for f, i in index.items():
        pipe.cameras[f] = poses[i]

    # triangulate landmarks for every track seen by >= 2 mapped cameras,
    # reusing the pipeline's parallax-gated pairwise triangulation
    n_new = 0
    cams = list(pipe.cameras)
    for a_i in range(len(cams)):
        for b_i in range(a_i + 1, len(cams)):
            n_new += pipe.add_landmarks_between(cams[a_i], cams[b_i])
    log(f"Global init: triangulated {n_new} landmarks.")
    return fcids
