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
