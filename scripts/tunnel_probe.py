"""Probe the axon tunnel: compile-cache hit, bulk bandwidth, stall check.

Diagnoses the wall-clock variance of full-pipeline runs on the tunneled
dev chip (RESULTS "Full-pipeline stability"): the persistent compilation
cache DOES hit across processes (second run of a distinctive program is
~0.04 s vs 0.59 s), bulk transfers run at 10-450 MB/s, but individual
dispatch/fetch requests intermittently STALL for minutes (measured 285 s
for a few-hundred-byte fetch in one probe).  Wall times over the tunnel
are therefore hostage to stochastic stalls; per-device-dispatch timing
(bench.py's fori_loop methodology) is the transferable measurement.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)

enable_compilation_cache()

t0 = time.time()
f = jax.jit(lambda x: jnp.tanh(x @ x.T * 1.234567) @ x)
y = f(jnp.ones((517, 263)))
y.block_until_ready()
print(f"distinctive-program first call (compile or cache hit): "
      f"{time.time()-t0:.2f}s")

x = np.random.randint(0, 255, (168, 480, 752), np.uint8)
t0 = time.time()
xd = jnp.asarray(x)
xd.block_until_ready()
print(f"upload 60.6MB: {time.time()-t0:.2f}s")

t0 = time.time()
small = np.asarray(xd.astype(jnp.float32).sum(axis=(1, 2)))
print(f"tiny eager compute+fetch: {time.time()-t0:.2f}s "
      f"(minutes => the tunnel is in a stall phase)")

big = xd.astype(jnp.float32)[:, :100]
big.block_until_ready()
t0 = time.time()
_ = np.asarray(big)
dt = time.time() - t0
print(f"fetch 32MB: {dt:.2f}s ({32.3/dt:.1f} MB/s)")
