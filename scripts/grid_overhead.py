"""Isolate the Pallas grid fixed cost of the megakernel's shape: 160 steps,
(184, 256) out block, with input blocks added incrementally."""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)
from scripts.devtime import devtime

enable_compilation_cache()
print("backend:", jax.default_backend())

NG = 160
GROUP = 256
OUT_ROWS = 184
Hp, Wp = 480, 896
Kimg = 164


def run_variant(n_lane_inputs, with_img, lane_rows=(8, 8, 2, 104, 104, 8, 4),
                label=""):
    rows = lane_rows[:n_lane_inputs]

    def kernel(*refs):
        out_ref = refs[-1]
        out_ref[...] = jnp.zeros((OUT_ROWS, GROUP), jnp.float32)

    def lane(r):
        return pl.BlockSpec((r, GROUP), lambda g, i: (0, g),
                            memory_space=pltpu.VMEM)

    in_specs = [lane(r) for r in rows]
    if with_img:
        in_specs.append(pl.BlockSpec(
            (1, Hp, Wp), lambda g, iog: (iog[g], 0, 0),
            memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NG,), in_specs=in_specs,
        out_specs=pl.BlockSpec((OUT_ROWS, GROUP), lambda g, i: (0, g),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, NG * GROUP), jnp.float32),
    )
    iog = jnp.arange(NG, dtype=jnp.int32) * Kimg // NG
    ins = [jnp.ones((r, NG * GROUP), jnp.float32) for r in rows]
    img = jnp.ones((Kimg, Hp, Wp), jnp.float32)

    if with_img:
        def f(iog, img, *ins):
            return call(iog, *ins, img)
        devtime(f, iog, img, *ins, iters=20, label=label)
    else:
        def f(iog, *ins):
            return call(iog, *ins)
        devtime(f, iog, *ins, iters=20, label=label)


run_variant(0, False, label="grid+out only")
run_variant(0, True, label="+ image block (prefetch-indexed)")
run_variant(2, True, label="+ 2 lane inputs")
run_variant(7, True, label="+ all 7 lane inputs")
run_variant(7, False, label="7 lane inputs, no image")


def run_full_shape(big_code, with_scratch, label=""):
    """Replicate the real kernel's harness: 3 scalar-prefetch operands
    (incl. the 40960-entry code array) and the two scratch buffers."""
    rows = (8, 8, 2, 104, 104, 8, 4)

    def kernel(*refs):
        out_ref = refs[-1] if not with_scratch else refs[-3]
        out_ref[...] = jnp.zeros((OUT_ROWS, GROUP), jnp.float32)

    def lane(r):
        return pl.BlockSpec((r, GROUP), lambda g, i, c, cd: (0, g),
                            memory_space=pltpu.VMEM)

    in_specs = [lane(r) for r in rows]
    in_specs.append(pl.BlockSpec(
        (1, Hp, Wp), lambda g, iog, c, cd: (iog[g], 0, 0),
        memory_space=pltpu.VMEM))

    scratch = []
    if with_scratch:
        scratch = [pltpu.VMEM((16, GROUP, 256), jnp.float32),
                   pltpu.VMEM((16, GROUP, 24), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(NG,), in_specs=in_specs,
        out_specs=pl.BlockSpec((OUT_ROWS, GROUP), lambda g, i, c, cd: (0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, NG * GROUP), jnp.float32),
    )
    iog = jnp.arange(NG, dtype=jnp.int32) * 40 // NG   # ~40 distinct images
    cnt = jnp.full((NG,), GROUP, jnp.int32)
    code = jnp.ones((NG * GROUP if big_code else NG,), jnp.int32)
    ins = [jnp.ones((r, NG * GROUP), jnp.float32) for r in rows]
    img = jnp.ones((Kimg, Hp, Wp), jnp.float32)

    def f(iog, cnt, code, img, *ins):
        return call(iog, cnt, code, *ins, img)
    devtime(f, iog, cnt, code, img, *ins, iters=20, label=label)


print("--- full harness shape ---")
run_full_shape(False, False, label="3 prefetch (small code), no scratch")
run_full_shape(True, False, label="3 prefetch (40960 code), no scratch")
run_full_shape(True, True, label="3 prefetch (40960 code) + scratch")


def run_img_revisit(pattern, label=""):
    def kernel(iog_ref, img_ref, out_ref):
        out_ref[...] = jnp.zeros((OUT_ROWS, GROUP), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NG,),
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda g, iog: (iog[g], 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((OUT_ROWS, GROUP), lambda g, i: (0, g),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, NG * GROUP), jnp.float32),
    )
    img = jnp.ones((Kimg, Hp, Wp), jnp.float32)
    iog = jnp.asarray(pattern, jnp.int32)

    def f(iog, img):
        return call(iog, img)
    devtime(f, iog, img, iters=20, label=label)


print("--- image revisit test ---")
run_img_revisit([0] * NG, label="img block: constant index")
run_img_revisit([g * 40 // NG for g in range(NG)], label="img block: 4-runs")
run_img_revisit([g % Kimg for g in range(NG)], label="img block: all distinct")
