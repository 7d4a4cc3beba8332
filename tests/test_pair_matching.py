"""Sharded pair-matching must agree with single-device matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.features import pair_matching
from photometric_bundle_adjustment_tpu.parallel import mesh as mesh_mod


def synth_features(I=6, F=128, seed=0):
    rng = np.random.default_rng(seed)
    # image 0's descriptors copied with small bit noise into all images so
    # that real matches exist
    base = rng.integers(0, 2**32, (F, 8), dtype=np.uint32)
    desc = np.stack([base ^ rng.integers(0, 2, (F, 8)).astype(np.uint32)
                     for _ in range(I)])
    valid = np.ones((I, F), bool)
    b = rng.normal(size=(I, F, 3))
    b[..., 2] = np.abs(b[..., 2]) + 1
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.asarray(desc), jnp.asarray(valid), jnp.asarray(b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
@pytest.mark.slow
def test_sharded_matching_matches_local():
    desc, valid, bear = synth_features()
    kwargs = dict(
        max_matches=64, match_max_dist=70, match_ratio=1.2,
        ransac_thresh=5e-5, ransac_min_inliers=16, ransac_hypotheses=32,
    )
    single = pair_matching.make_pair_matcher(desc, valid, bear, **kwargs)
    mesh = mesh_mod.make_mesh(8)
    sharded = pair_matching.make_pair_matcher(
        desc, valid, bear, mesh=mesh, **kwargs
    )
    i1 = jnp.asarray(np.array([1, 2, 3, 4, 5, 1, 2, 3], np.int32))
    i2 = jnp.asarray(np.array([0, 0, 0, 0, 0, 2, 4, 5], np.int32))
    key = jax.random.PRNGKey(0)
    out_a = single(i1, i2, key)
    out_b = sharded(i1, i2, key)
    for a, b in zip(out_a, out_b):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":  # pose floats may differ by reassociation
            np.testing.assert_allclose(a, b, atol=1e-8)
        else:
            np.testing.assert_array_equal(a, b)
    # the matcher actually found the planted correspondences
    counts = np.asarray(out_a[2])
    assert counts.min() >= 50  # nearly all F=128 features should match


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_ring_match_all_pairs_matches_direct():
    from photometric_bundle_adjustment_tpu.features import match

    desc, valid, _ = synth_features(I=8, F=96, seed=3)
    mesh = mesh_mod.make_mesh(8)
    pairs, pvalid, count = pair_matching.ring_match_all_pairs(
        desc, valid, mesh, max_matches=48, threshold=70, ratio=1.2
    )
    I = desc.shape[0]
    assert pairs.shape == (I, I, 48, 2)
    for a in range(I):
        for b in range(I):
            if a == b:
                continue
            m12 = match.match_descriptors(
                desc[a], desc[b], valid[a], valid[b], 70, 1.2
            )
            p_ref, v_ref, c_ref = match.matches_to_pairs(m12, 48)
            np.testing.assert_array_equal(
                np.asarray(pairs[a, b]), np.asarray(p_ref)
            )
            np.testing.assert_array_equal(
                np.asarray(pvalid[a, b]), np.asarray(v_ref)
            )
            assert int(count[a, b]) == int(c_ref)
    # planted correspondences are found across the ring
    off_diag = np.asarray(count)[~np.eye(I, dtype=bool)]
    assert off_diag.min() >= 40


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_ring_match_rejects_indivisible_image_count():
    desc, valid, _ = synth_features(I=6, F=32, seed=1)
    mesh = mesh_mod.make_mesh(8)
    with pytest.raises(ValueError):
        pair_matching.ring_match_all_pairs(
            desc, valid, mesh, max_matches=16
        )


def test_mega_matcher_matches_chunked():
    """make_mega_pair_matcher == chunk-at-a-time make_pair_matcher with the
    same per-chunk keys (the mega dispatch is a pure lax.map fold)."""
    desc, valid, bear = synth_features(I=6, F=64, seed=2)
    kwargs = dict(
        max_matches=32, match_max_dist=70, match_ratio=1.2,
        ransac_thresh=5e-5, ransac_min_inliers=8, ransac_hypotheses=16,
    )
    chunked = pair_matching.make_pair_matcher(desc, valid, bear, **kwargs)
    mega = pair_matching.make_mega_pair_matcher(desc, valid, bear, **kwargs)

    G, C = 3, 4
    rng = np.random.default_rng(0)
    i1 = rng.integers(1, 6, (G, C)).astype(np.int32)
    i2 = np.zeros((G, C), np.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), G)

    out_m = mega(jnp.asarray(i1), jnp.asarray(i2), keys)
    # mega returns the host-consumed subset: (pairs int16, count, T, inl)
    for g in range(G):
        pairs, pvalid, count, T, inl, n_inl = chunked(
            jnp.asarray(i1[g]), jnp.asarray(i2[g]), keys[g]
        )
        for a, b in zip(out_m, (pairs.astype(jnp.int16), count, T, inl)):
            np.testing.assert_array_equal(np.asarray(a[g]), np.asarray(b))
