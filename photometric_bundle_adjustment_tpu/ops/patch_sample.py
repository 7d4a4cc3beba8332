"""Pallas TPU kernel: photometric patch sampling from VMEM-staged images.

The photometric-BA hot loop samples 8 patch pixels x 4 bilinear taps per
observation from the target images (models/photometric_ba.py).  As XLA
gathers, those 768k random 4-byte HBM reads dominate the LM iteration
(measured 9.4 ms per residual evaluation at EuRoC scale, TPU v5e).

Kernel structure (shaped entirely by Mosaic's alignment rules — sublane
starts multiple of 8, lane starts multiple of 128):

  * observations are pre-sorted by target image and padded so every
    image's range is a multiple of GROUP=128 (host-side, once per solve —
    the observation graph is static);
  * the grid runs one step per 128-observation group; the group's target
    image index is a scalar-prefetch operand driving the image BlockSpec
    index map, so Pallas DMAs each image HBM->VMEM once and reuses it for
    all of its groups (consecutive equal block indices skip the copy);
  * per observation, a (TILE_H, TILE_W) = (24, 256) tile whose start is
    quantized to the (8, 128) alignment grid is sliced from the on-chip
    image, and all 8 patch pixels' bilinear taps resolve as dense two-tap
    weight contractions:

        val = wy tile wx^T,  dval/dx = wy tile dwx^T,  dval/dy = dwy tile wx^T

    with wy (P, TILE_H), wx (P, TILE_W) holding (1-f, f) at the two
    integer neighbours — exactly the 4-tap bilinear math of
    photometric_ba.bilinear_sample_and_grad, with zero HBM gathers;
  * the 128 per-observation bodies are statically unrolled so every
    slab/column access uses static lane offsets; results accumulate in a
    (P, GROUP) scratch and store with one aligned write per group.

Out-of-image samples clamp with zero gradient (reference semantics);
pixels warped further than the tile radius from the patch minimum
(> ~3x patch stretch — far past Huber saturation) clamp to the tile
edge, also with zero gradient.

Tile starts are precomputed in XLA and packed as one int32 per
observation ((y0/8) * 4096 + x0/128) in SMEM, so the kernel never
converts vectors to scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 24
TILE_W = 256
P = 8        # DSO patch size
GROUP = 128  # observations per grid step (lane-aligned slabs)
# groups per pallas_call: bounds the whole-resident scalar-prefetch SMEM
# (code is GROUP int32s per group; 1536 groups -> 768 KiB of 1 MiB SMEM)
_SEG_GROUPS = 1536


def _make_kernel(n_groups: int, want_grads: bool):
    def kernel(img_of_group_ref, cnt_ref, code_ref, rx2_ref, ry2_ref,
               img_ref, val_ref, gx_ref, gy_ref, acc_val, acc_gx, acc_gy,
               wxd_s, wyd_s):
        g = pl.program_id(0)
        base = g * GROUP
        cnt = cnt_ref[g]

        Q = 2 * P if want_grads else P
        rx_g = rx2_ref[:, pl.ds(base, GROUP)]   # (Q, GROUP) tile-relative
        ry_g = ry2_ref[:, pl.ds(base, GROUP)]

        # Stacked-tap formulation: rows 0..P-1 of the (Q, .) weight arrays
        # carry the bilinear value taps (1-f, f), rows P..2P-1 the
        # derivative taps (-1, +1); derivative rows whose coordinate is
        # encoded as -2 (invalid gradient) match no integer column and
        # vanish.  One MXU product TY = WYs . tile gives the y-contraction
        # for value AND y-derivative rows at once; the three lane
        # reductions (val, gx, gy) are independent ones-vector dots.
        # Everything slab-wide (floors, coefficient stacks, and the
        # bilinear tap masks themselves — see wxd_s/wyd_s below) is
        # hoisted out of the unrolled per-observation bodies (the unroll
        # is what makes every slab access a static lane offset, as Mosaic
        # requires).
        cx_s = jnp.floor(rx_g)
        cy_s = jnp.floor(ry_g)
        fx_s = rx_g - cx_s
        fy_s = ry_g - cy_s
        cxi_s = cx_s.astype(jnp.int32)
        cyi_s = cy_s.astype(jnp.int32)
        if want_grads:
            topv = jax.lax.broadcasted_iota(jnp.int32, (Q, GROUP), 0) < P
            onev = jnp.ones_like(fx_s)
            a0x_s = jnp.where(topv, 1.0 - fx_s, -onev)
            a1x_s = jnp.where(topv, fx_s, onev)
            a0y_s = jnp.where(topv, 1.0 - fy_s, -onev)
            a1y_s = jnp.where(topv, fy_s, onev)
        else:
            a0x_s, a1x_s = 1.0 - fx_s, fx_s
            a0y_s, a1y_s = 1.0 - fy_s, fy_s

        # slab-wide bilinear-tap mask construction: ONE vectorised pass
        # over (GROUP, Q, TILE_*) scratch instead of ~12 wide compare/
        # select/multiply ops inside each of the 128 unrolled bodies —
        # the bodies were issue-rate-bound, not compute-bound, and this
        # roughly halves their op count (the remaining body is one tile
        # slice, two MXU dots, and the accumulator writes).
        dtype = rx_g.dtype
        cxiT = cxi_s.T                               # (GROUP, Q)
        cyiT = cyi_s.T
        cols3 = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, Q, TILE_W), 2)
        rows3 = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, Q, TILE_H), 2)
        wxd_s[...] = (
            (cols3 == cxiT[:, :, None]).astype(dtype)
            * a0x_s.T[:, :, None]
            + (cols3 == cxiT[:, :, None] + 1).astype(dtype)
            * a1x_s.T[:, :, None]
        )
        wyd_s[...] = (
            (rows3 == cyiT[:, :, None]).astype(dtype)
            * a0y_s.T[:, :, None]
            + (rows3 == cyiT[:, :, None] + 1).astype(dtype)
            * a1y_s.T[:, :, None]
        )

        ones_w = jnp.ones((1, TILE_W), jnp.float32)
        dn = (((1,), (1,)), ((), ()))  # contract lane dims (B^T form)

        for t in range(GROUP):
          # predicated: tail groups skip their padding slots entirely
          @pl.when(t < cnt)
          def _(t=t):
              code = code_ref[base + t]
              y0 = pl.multiple_of((code >> 12) * 8, 8)
              x0 = pl.multiple_of((code & 0xFFF) * 128, 128)
              tile = img_ref[0, pl.ds(y0, TILE_H), pl.ds(x0, TILE_W)]

              wxd = wxd_s[t]
              wyd = wyd_s[t]

              TY = jnp.dot(wyd, tile, preferred_element_type=tile.dtype)
              if want_grads:
                  # three independent value-free dots (no staging scratch:
                  # a shared prod buffer created write-read chains between
                  # consecutive unrolled bodies and serialized them)
                  acc_val[:, t : t + 1] = jax.lax.dot_general(
                      TY[0:P, :] * wxd[0:P, :], ones_w, dn,
                      preferred_element_type=jnp.float32)
                  acc_gx[:, t : t + 1] = jax.lax.dot_general(
                      TY[0:P, :] * wxd[P:, :], ones_w, dn,
                      preferred_element_type=jnp.float32)
                  acc_gy[:, t : t + 1] = jax.lax.dot_general(
                      TY[P:, :] * wxd[0:P, :], ones_w, dn,
                      preferred_element_type=jnp.float32)
              else:
                  red = jax.lax.dot_general(
                      TY * wxd, ones_w, dn,
                      preferred_element_type=jnp.float32,
                  )                                            # (P, 1)
                  acc_val[:, t : t + 1] = red

        val_ref[:, pl.ds(base, GROUP)] = acc_val[:]
        if want_grads:
            gx_ref[:, pl.ds(base, GROUP)] = acc_gx[:]
            gy_ref[:, pl.ds(base, GROUP)] = acc_gy[:]
        else:
            gx_ref[:, pl.ds(base, GROUP)] = jnp.zeros_like(acc_gx)
            gy_ref[:, pl.ds(base, GROUP)] = jnp.zeros_like(acc_gy)

    return kernel


def pad_images(images3d: jax.Array):
    """Pad the lane (width) axis so every quantized 256-wide tile fits:
    Wp = ((W-2)//128)*128 + TILE_W.  Do this ONCE per solve and pass the
    padded stack plus the true W to sample_patches_grouped."""
    Kimg, H, W = images3d.shape
    Wp = ((W - 2) // 128) * 128 + TILE_W
    Hp = -(-H // 8) * 8
    if Hp != H or Wp != W:
        images3d = jnp.pad(images3d, ((0, 0), (0, Hp - H), (0, Wp - W)))
    return images3d, (H, W)


def group_layout(target_img: np.ndarray, n_images: int):
    """Host-side layout: sort observations by target image and pad each image's
    range to a multiple of GROUP.  Returns (order, img_of_group) where
    ``order`` is (Opad,) with -1 padding slots; reorder every per-observation
    array with ``np.where(order >= 0, arr[order], fill)``."""
    target_img = np.asarray(target_img)
    counts = np.bincount(target_img, minlength=n_images)
    padded = -(-counts // GROUP) * GROUP
    padded = np.maximum(padded, 0)
    offs = np.r_[0, np.cumsum(padded)]
    order = np.full(offs[-1], -1, np.int64)
    sort_idx = np.argsort(target_img, kind="stable")
    starts = np.r_[0, np.cumsum(counts)]
    for i in range(n_images):
        if counts[i]:
            order[offs[i] : offs[i] + counts[i]] = (
                sort_idx[starts[i] : starts[i] + counts[i]]
            )
    img_of_group = np.repeat(np.arange(n_images), padded // GROUP)
    # valid slots per group: full groups then the per-image remainder
    slot_base = np.arange(offs[-1]) - np.repeat(offs[:-1], padded)
    grp_start = slot_base[::GROUP] if offs[-1] else np.zeros(0, np.int64)
    cnt_img = np.repeat(counts, padded // GROUP)
    group_counts = np.clip(cnt_img - grp_start, 0, GROUP)
    return order, img_of_group.astype(np.int32), group_counts.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("HW", "want_grads", "interpret"))
def sample_patches_grouped(
    images3d: jax.Array,    # (Kimg, Hp, Wp) float32, padded (pad_images)
    ux: jax.Array,          # (P, Opad) raw target x, group layout
    uy: jax.Array,          # (P, Opad)
    img_of_group: jax.Array,  # (n_groups,) int32
    group_counts: jax.Array,  # (n_groups,) int32 valid slots per group
    HW: tuple[int, int],    # true (H, W) before padding
    want_grads: bool = True,
    interpret: bool = False,
):
    """(val, gx, gy), each (P, Opad), sampled at (ux, uy) in each group's
    target image.  Columns in padding slots return garbage — mask with the
    observation validity downstream (their tile start is clamped in-range,
    so no out-of-bounds access occurs)."""
    H, W = HW
    Kimg, Hp, Wp = images3d.shape
    O = ux.shape[1]
    n_groups = O // GROUP
    dtype = images3d.dtype

    # tile starts on the (8, 128) alignment grid + tile-relative coords,
    # all cheap XLA vector math
    xc = jnp.clip(ux, 0.0, W - 1.001)
    yc = jnp.clip(uy, 0.0, H - 1.001)
    x0 = jnp.maximum(
        jnp.floor(jnp.min(xc, axis=0)).astype(jnp.int32) - 1, 0
    ) // 128 * 128
    y0 = jnp.clip(
        jnp.floor(jnp.min(yc, axis=0)).astype(jnp.int32) - 1, 0, Hp - TILE_H
    ) // 8 * 8
    code = (y0 // 8) * 4096 + x0 // 128                    # (Opad,) int32
    rx = jnp.clip(xc - x0.astype(dtype)[None, :], 0.0, TILE_W - 1.001)
    ry = jnp.clip(yc - y0.astype(dtype)[None, :], 0.0, TILE_H - 1.001)
    in_x = (ux >= 0.0) & (ux <= W - 1.001) & (
        xc - x0.astype(dtype)[None, :] <= TILE_W - 1.001
    )
    in_y = (uy >= 0.0) & (uy <= H - 1.001) & (
        yc - y0.astype(dtype)[None, :] <= TILE_H - 1.001
    )
    if want_grads:
        # derivative rows: rx = -2 encodes "gradient invalid" (clamped
        # sample) — floor(-2) = -2 and -2+1 = -1 match no integer column,
        # so the derivative taps vanish (-1 would still match column 0
        # through the +1 neighbour)
        rx2 = jnp.concatenate([rx, jnp.where(in_x, rx, -2.0)], axis=0)
        ry2 = jnp.concatenate([ry, jnp.where(in_y, ry, -2.0)], axis=0)
    else:
        rx2, ry2 = rx, ry

    def invoke(iog_s, cnt_s, code_s, rx2_s, ry2_s):
        ng = iog_s.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # img_of_group, group counts, code
            grid=(ng,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # rx2
                pl.BlockSpec(memory_space=pltpu.VMEM),  # ry2
                pl.BlockSpec(
                    (1, Hp, Wp),
                    lambda g, img_of_group, cnt, code: (
                        img_of_group[g], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((P, GROUP), dtype),
                pltpu.VMEM((P, GROUP), dtype),
                pltpu.VMEM((P, GROUP), dtype),
                pltpu.VMEM((GROUP, (2 * P if want_grads else P), TILE_W),
                           dtype),
                pltpu.VMEM((GROUP, (2 * P if want_grads else P), TILE_H),
                           dtype),
            ],
        )
        out_shape = [jax.ShapeDtypeStruct((P, ng * GROUP), dtype)
                     for _ in range(3)]
        return pl.pallas_call(
            _make_kernel(ng, want_grads),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(iog_s.astype(jnp.int32), cnt_s.astype(jnp.int32),
          code_s.astype(jnp.int32), rx2_s, ry2_s, images3d)

    # The code/count/img_of_group scalar-prefetch operands are resident
    # WHOLE in the 1 MiB SMEM; above ~200k observation rows the code
    # array alone would overflow it (seen on the real-map slot-major
    # layout), so the call is segmented over group ranges — images are
    # re-staged per segment, a negligible cost next to the per-group DMA
    # reuse within one.
    if n_groups <= _SEG_GROUPS:
        val, gx, gy = invoke(img_of_group, group_counts, code, rx2, ry2)
    else:
        parts = []
        for s in range(0, n_groups, _SEG_GROUPS):
            e = min(s + _SEG_GROUPS, n_groups)
            parts.append(invoke(
                img_of_group[s:e], group_counts[s:e],
                code[s * GROUP : e * GROUP],
                rx2[:, s * GROUP : e * GROUP],
                ry2[:, s * GROUP : e * GROUP],
            ))
        val, gx, gy = (jnp.concatenate([p[i] for p in parts], axis=1)
                       for i in range(3))
    return val, gx, gy
