"""Pallas TPU kernel tests — skipped unless running on real TPU hardware
(the CPU suite covers the XLA reference path; drive this file manually with
``JAX_PLATFORMS=axon python -m pytest tests/test_pallas_tpu.py`` on a chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU hardware"
)


def test_pallas_hamming_matches_xla():
    from photometric_bundle_adjustment_tpu.features import match
    from photometric_bundle_adjustment_tpu.ops import hamming

    rng = np.random.default_rng(0)
    N1, N2 = 1536, 1536
    d1 = jnp.asarray(rng.integers(0, 2**32, (N1, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (N2, 8), dtype=np.uint32))
    n2 = N2 - 100

    best, second, idx = hamming.best_two_nn(d1, d2, jnp.asarray(n2))
    valid2 = jnp.arange(N2) < n2
    bx, sx, ix = match._best_two_xla(d1, d2, valid2)
    np.testing.assert_array_equal(np.asarray(best), np.asarray(bx))
    np.testing.assert_array_equal(np.asarray(second), np.asarray(sx))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ix))
