"""Batched image-pair matching: descriptor matching + relative-pose RANSAC
for chunks of image pairs in one compiled computation.

This is the TPU replacement for the reference's hottest stage — the TBB
``parallel_for`` over ~19,900 image pairs (sfm.cpp:1294-1319): pairs are
processed in fixed-size chunks, vmapped so every pair's (N1 x N2) Hamming
matrix, ratio/cross-check, and 128-hypothesis essential RANSAC fuse into
one XLA program.  With a device mesh, the chunk axis is sharded
data-parallel (each chip matches its slice of pairs; descriptors are small
enough to replicate — a ring pass over descriptor blocks only pays once
image counts reach thousands).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from photometric_bundle_adjustment_tpu.features import match, ransac
from photometric_bundle_adjustment_tpu.parallel.mesh import DATA_AXIS


def make_pair_matcher(
    desc: jax.Array,       # (I, F, 8) uint32
    valid: jax.Array,      # (I, F) bool
    bearings: jax.Array,   # (I, F, 3)
    max_matches: int,
    match_max_dist: int,
    match_ratio: float,
    ransac_thresh: float,
    ransac_min_inliers: int,
    ransac_hypotheses: int,
    mesh: Mesh | None = None,
):
    """Returns chunk_fn(i1 (C,), i2 (C,), key) -> per-pair results.

    Outputs: (pairs (C, MM, 2), pair_valid (C, MM), count (C,), T (C, 7),
    inlier_mask (C, MM), n_inliers (C,)).  With a mesh, inputs/outputs are
    sharded over the chunk axis.
    """
    MM = max_matches

    def one(a, b, k):
        m12 = match.match_descriptors(
            desc[a], desc[b], valid[a], valid[b], match_max_dist, match_ratio
        )
        pairs, pvalid, count = match.matches_to_pairs(m12, MM)
        b0 = bearings[a][pairs[:, 0]]
        b1 = bearings[b][pairs[:, 1]]
        T, inl, n_inl = ransac.ransac_relative_pose(
            b0, b1, pvalid, k,
            threshold=ransac_thresh,
            min_inliers=ransac_min_inliers,
            num_hypotheses=ransac_hypotheses,
        )
        enough = count > ransac_min_inliers
        inl = inl & enough
        return pairs, pvalid, count, T, inl, jnp.where(enough, n_inl, 0)

    def chunk(i1, i2, key):
        keys = jax.random.split(key, i1.shape[0])
        return jax.vmap(one)(i1, i2, keys)

    if mesh is None:
        return jax.jit(chunk)

    data = NamedSharding(mesh, P(DATA_AXIS))
    keyspec = NamedSharding(mesh, P())
    return jax.jit(
        chunk,
        in_shardings=(data, data, keyspec),
        out_shardings=(data, data, data, data, data, data),
    )


def make_ransac_chunk(
    bearings: jax.Array,   # (I, F, 3)
    ransac_thresh: float,
    ransac_min_inliers: int,
    ransac_hypotheses: int,
):
    """RANSAC-only chunk function for pre-computed matches (the native C++
    Hamming matcher supplies the match lists on CPU; see
    features/native_match.py).  chunk(i1, i2, pairs (C, MM, 2),
    pvalid (C, MM), count (C,), key) -> (T, inlier_mask, n_inliers)."""

    def one(a, b, pairs, pvalid, count, k):
        b0 = bearings[a][pairs[:, 0]]
        b1 = bearings[b][pairs[:, 1]]
        T, inl, n_inl = ransac.ransac_relative_pose(
            b0, b1, pvalid, k,
            threshold=ransac_thresh,
            min_inliers=ransac_min_inliers,
            num_hypotheses=ransac_hypotheses,
        )
        enough = count > ransac_min_inliers
        inl = inl & enough
        return T, inl, jnp.where(enough, n_inl, 0)

    def chunk(i1, i2, pairs, pvalid, count, key):
        keys = jax.random.split(key, i1.shape[0])
        return jax.vmap(one)(i1, i2, pairs, pvalid, count, keys)

    return jax.jit(chunk)


def compact_matches_np(m12_all, max_matches: int):
    """Vectorised numpy analog of match.matches_to_pairs over a (P, F)
    match table: returns (pairs (P, MM, 2) int32, pvalid (P, MM) bool,
    count (P,) int32)."""
    import numpy as np

    P, F = m12_all.shape
    ism = m12_all >= 0
    order = np.argsort(~ism, axis=1, kind="stable")
    rows = order[:, :max_matches].astype(np.int32)
    cols = m12_all[np.arange(P)[:, None], rows].astype(np.int32)
    count = np.minimum(ism.sum(1), max_matches).astype(np.int32)
    k = np.arange(max_matches, dtype=np.int32)
    pvalid = k[None, :] < count[:, None]
    pairs = np.stack(
        [np.where(pvalid, rows, 0), np.where(pvalid, cols, 0)], axis=-1
    )
    return pairs, pvalid, count
