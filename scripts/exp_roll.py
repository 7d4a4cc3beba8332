"""Experiment: does Mosaic support (a) pltpu.roll with a traced shift,
(b) dynamic lane slicing at non-128-aligned starts, inside a kernel?"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

which = sys.argv[1] if len(sys.argv) > 1 else "roll"


def make(which):
    def kernel(sref, xref, oref):
        s = sref[0]
        t = xref[:]                      # (24, 256)
        if which == "roll":
            r = pltpu.roll(t, -s, 1)     # dynamic shift on lanes
            oref[:] = r[:, :128]
        elif which == "dynslice":
            oref[:] = xref[pl.ds(0, 24), pl.ds(s, 128)]
        elif which == "rollstatic":
            r = pltpu.roll(t, -8, 1)
            oref[:] = r[:, :128]
    return kernel


x = jnp.asarray(np.arange(24 * 256, dtype=np.float32).reshape(24, 256))
s = jnp.asarray([13], jnp.int32)

out = pl.pallas_call(
    make(which),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((24, 128), jnp.float32),
)(s, x)
ref = np.roll(np.asarray(x), -(13 if which != "rollstatic" else 8), axis=1)[:, :128]
if which == "dynslice":
    ref = np.asarray(x)[:, 13:13 + 128]
print(which, "ok:", np.array_equal(np.asarray(out), ref))
