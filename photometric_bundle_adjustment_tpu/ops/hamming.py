"""Pallas TPU kernel: brute-force 256-bit Hamming matching.

The reference's hottest front-end loop is the O(N1*N2) descriptor match over
~20k image pairs (keypoints.h:223-257 ``matchSets`` called from the TBB
fan-out at sfm.cpp:1294-1319).  Descriptors are (N, 8) uint32 words; this
kernel computes, for each left descriptor row, the best and second-best
Hamming distances and the best index against all right descriptors —
entirely in VMEM, one grid step per 128-row tile, XOR + population-count on
the VPU, with no (N1, N2) matrix ever touching HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
BIG = 1 << 20  # plain int: pallas kernels cannot capture traced constants


def _popcount(x: jax.Array) -> jax.Array:
    """32-bit population count via the classic bit-parallel reduction
    (uint32 in, int32 out)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _match_kernel(d1_ref, d2_ref, n2_ref, best_ref, second_ref, idx_ref):
    d1 = d1_ref[:]          # (TILE_M, 8) uint32
    d2 = d2_ref[:]          # (N2pad, 8) uint32
    n2 = n2_ref[0]

    # accumulate Hamming distances word by word: (TILE_M, N2pad)
    dist = jnp.zeros((d1.shape[0], d2.shape[0]), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(d1[:, w][:, None], d2[:, w][None, :])
        dist = dist + _popcount(x)

    # mask padding columns
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist = jnp.where(col < n2, dist, BIG)

    best = jnp.min(dist, axis=1)
    # argmin via min-of-matching-columns (Mosaic only lowers f32 argmin)
    bidx = jnp.min(
        jnp.where(dist == best[:, None], col, BIG), axis=1
    ).astype(jnp.int32)
    masked = jnp.where(col == bidx[:, None], BIG, dist)
    second = jnp.min(masked, axis=1)

    best_ref[0, :] = best
    second_ref[0, :] = second
    idx_ref[0, :] = bidx


@functools.partial(jax.jit, static_argnames=())
def best_two_nn(d1: jax.Array, d2: jax.Array, n2: jax.Array):
    """For each row of d1: (best_dist, second_dist, best_idx) vs rows of d2.

    d1: (N1, 8) uint32 (N1 padded to a multiple of 128),
    d2: (N2pad, 8) uint32, n2: actual column count (scalar int32).
    """
    N1 = d1.shape[0]
    grid = (N1 // TILE_M,)
    out = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            # (1, N1) row layouts keep the lane dimension 128-aligned
            pl.BlockSpec((1, TILE_M), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N1), jnp.int32),
            jax.ShapeDtypeStruct((1, N1), jnp.int32),
            jax.ShapeDtypeStruct((1, N1), jnp.int32),
        ],
    )(d1, d2, jnp.asarray(n2, jnp.int32).reshape(1))
    return out[0][0], out[1][0], out[2][0]
