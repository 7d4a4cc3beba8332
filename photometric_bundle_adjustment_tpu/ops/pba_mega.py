"""Fused photometric-BA megakernel: warp + patch sampling + Jacobian +
Huber + per-observation normal-equation payloads in ONE Pallas pass.

This is the round-4 redesign of the photometric LM iteration (the flagship
capability — the reference repo's raison d'etre is DSO-style photometric
bundle adjustment, /root/reference/README.md:2, on the anchored
inverse-depth warp of include/visnav/reprojection.h:74-118 and the patch
residual of common_types.h:188-219).  The round-3 pipeline evaluated the
warp chain in XLA (vmapped per-observation, small-trailing-dim arrays),
sampled through the Pallas patch kernel, and re-assembled Jacobians in XLA
— the device trace showed ~8.7 ms of fragmented XLA fusions + layout
bridges around a 6.3 ms sampler (17.5 ms/iteration total).  Here the whole
residual+Jacobian evaluation runs in GROUP ORDER end-to-end:

  phase 1 (XLA, transposed "plane" layout): pose gathers, the ray-form
    warp q = M d + rho u, the model projection + its analytic Jacobian
    (core/camera_slab.py), and the two 13-column coefficient slabs

        A[k] = dpi_u/dq . dq/dtheta_k,   B[k] = dpi_v/dq . dq/dtheta_k

    such that the full geometric Jacobian row is
    J_geo[p, k] = gx[p] A[p, k] + gy[p] B[p, k].  Every array is
    (rows, O) with the observation axis in lanes — no (P, 2, 3)/(P, 3, 13)
    tile-padded intermediates, which is what fragmented round 3.

  phase 2 (Pallas): per 256-observation group (observations pre-sorted by
    target image; images are staged HBM->VMEM by an in-kernel
    double-buffered manual DMA pipeline — ONE fetch per image, prefetched
    under the previous image's compute, because a scalar-prefetch-indexed
    BlockSpec re-issues its DMA every grid step), each unrolled sampler
    body runs ONE MXU dot (the y-tap contraction TY = wy_t @ tile) into
    the ty3 scratch; the x-taps, value/gradient combine and lane
    reductions run BATCHED over the whole group after the loop (v1's
    three per-body (P, XW) x (XW, 1) dots wasted 15/16 of every 128-row
    MXU pass).  The slab epilogue then forms the residual,
    affine-brightness partials, Huber weights, the sqrt-weighted Jacobian
    rows, the robust cost, AND the per-observation Schur payloads
    A0 = J^T J_rho-col and A1 = J^T r — so the downstream assembly
    (dense slot-major or chunk-plan) needs no J-column passes at all.
    Window-relative tap coordinates are rebuilt ON-CHIP from the pixel
    planes (shipping them transposed cost ~1.5 ms/build in relayouts).
    ``sample_bf16`` runs the body dot in bf16 (uint8 intensities exact,
    y-taps <=2^-8 relative, f32 accumulation) for a ~1 ms/build cut.

Output packing (one (184, Og) f32 array; rows):
  [0:136)    the sqrt(weight)-scaled Jacobian rows P-MAJOR: row p*17 + c
             with c the standard W column order [se3_a(6), aff_a(2),
             se3_c(6), aff_c(2), rho] — i.e. out[:136].T IS the (Og, 136)
             J2 matrix the pair-Gram assembly consumes (round 5; the
             k-major layout of round 4 forced a 136-column lane gather on
             every build)
  [136:144)  r * sw
  144        per-observation robust cost (0.5 rho(|r|^2))
  [145:162)  A0 in W-column order [k0..5, aa, ab, k6..11, ca, cb, k12]
  [162:179)  A1 in the same order
  [179:184)  zero padding to the sublane multiple

NaN semantics match the gather sampler (models/photometric_ba.py): a
non-finite projection poisons that observation's residual (and so the
robust cost) with NaN, which the LM accept check rejects; clamped
(off-image / off-tile) samples contribute value-with-zero-gradient.

Reference parity: this computes the exact residual/Jacobian of
models/photometric_ba.make_rj_fn (golden-tested against it); the Ceres
configuration it replaces is SPARSE_SCHUR with autodiff patch residuals
(include/visnav/map_utils.h:322-399).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photometric_bundle_adjustment_tpu.core import camera_slab, cameras, se3
from photometric_bundle_adjustment_tpu.optim import ba
from photometric_bundle_adjustment_tpu.optim.schur_plan import (
    DenseLmSchurPlan,
    SchurPlan,
    _chunk_segments,
    _round_up,
    build_schur_plan,
)

P = 8            # DSO patch size
GROUP = 256      # observations per grid step
TILE_H = 24      # sublane window rows (8-aligned starts — Mosaic cannot
#                  lower unaligned sublane vector loads; the <=7 wasted
#                  rows are the price of alignment)
TILE_W = 128     # fetched tile width.  Round 5: 256 -> 128 via 64-GRANULAR
#                  window starts — split_pack_images ships each image
#                  TWICE (the original and a 64-lane-left-rotated copy),
#                  so every window start xw = 64*floor(xs/64) is a
#                  128-ALIGNED load in one of the two copies and the
#                  patch (<= ~12 px wide, landing at lane xs-xw in
#                  [0, 63]) always fits a 128-lane tile.  This halves the
#                  per-body MXU dot's N extent, the ty3 scratch, and the
#                  post-loop x-combine vs the 256-lane formulation
#                  (whose 128-aligned starts put the patch anywhere in
#                  lanes [0, 137]).  Patches wider than the remaining
#                  window clamp to the edge with zero gradient — still a
#                  strict superset of the reference tile-sampling
#                  semantics' (12, 16) span (models/photometric_ba.py
#                  TILE_H/TILE_W), so kernel/gather parity is unchanged.
XW = 128         # sampling window width = TILE_W
OUT_ROWS = 184   # 179 payload rows padded to a sublane multiple
ROW_COST = 144
_SEG_GROUPS = 1536  # bounds scalar-prefetch SMEM residency (see patch_sample)

# (round 5) the kernel writes its Jacobian rows p-major in W order
# directly, so no J2 column permutation exists anymore; the identity is
# kept only for diagnostics that still reference it.
PERMCOLS = np.arange(136, dtype=np.int32)


class MegaConsts(NamedTuple):
    """Static (per-solve) device slabs, all in group order."""

    d3: jax.Array       # (3P, Og) unprojected anchor-patch dirs, row j*P+p
    intr_t: jax.Array   # (8, Og) target intrinsics slab
    refp: jax.Array     # (P, Og) reference patch intensities
    an: jax.Array       # (Og,) int32 anchor camera
    tn: jax.Array       # (Og,) int32 target camera
    lm: jax.Array       # (Og,) int32 landmark
    timg: jax.Array     # (Og,) int32 target image (sampling source)
    iog: jax.Array      # (ng,) int32 image of group
    cnt: jax.Array      # (ng,) int32 valid observations per group
    ictl: jax.Array     # (ng,) int32 image-staging control: buf | first<<1
    #                     | has_next<<2 (kernel double-buffer pipeline)
    inxt: jax.Array     # (ng,) int32 next distinct image to prefetch


class MegaPlan(NamedTuple):
    """Assembly plan: group-space pair chunks + slot-space lift tables."""

    pg: jax.Array             # (NCp, Bp) int32 group-row ids; dummy -> zrow
    cc_rows4: jax.Array       # (NCp, 4) int32 into K*K [+1 dropped]
    g_of_s: jax.Array         # (Os,) int32 slot row -> group row; pad -> zrow
    obs_anchor_cam: jax.Array  # (Os,) int32; K for padding slots
    obs_target_cam: jax.Array  # (Os,)
    lm_cam: jax.Array          # (S, L) int32; K for padding
    anchor_cam_of_lm: jax.Array  # (L,) int32; K if landmark has no obs


# ---------------------------------------------------------------------------
# host-side layout
# ---------------------------------------------------------------------------


def mega_layout(target_img: np.ndarray, valid: np.ndarray, n_images: int):
    """Group layout over VALID observations only (unlike
    patch_sample.group_layout, which lays out every row): rows are sorted
    by target image and each image's range padded to a GROUP multiple.

    Returns ``(order, img_of_group, group_counts, g_of_s, zrow)`` where
    ``order`` maps group rows to slot rows (-1 = padding), ``g_of_s`` maps
    slot rows to group rows (invalid/padding slots -> ``zrow``), and
    ``zrow`` is a guaranteed padding group row whose kernel outputs are
    exactly zero (used as the gather dummy)."""
    ti = np.asarray(target_img)
    v = np.asarray(valid).astype(bool)
    Os = ti.shape[0]
    vidx = np.flatnonzero(v)
    counts = np.bincount(ti[vidx], minlength=n_images)
    padded = -(-counts // GROUP) * GROUP
    if padded.sum() == counts.sum():
        # no padding slot anywhere: append one empty group to provide the
        # zero row (an all-full layout is otherwise possible)
        padded[0] += GROUP
    offs = np.r_[0, np.cumsum(padded)]
    order = np.full(offs[-1], -1, np.int64)
    sort_idx = vidx[np.argsort(ti[vidx], kind="stable")]
    starts = np.r_[0, np.cumsum(counts)]
    for i in range(n_images):
        if counts[i]:
            order[offs[i]: offs[i] + counts[i]] = (
                sort_idx[starts[i]: starts[i] + counts[i]]
            )
    img_of_group = np.repeat(np.arange(n_images), padded // GROUP)
    slot_base = np.arange(offs[-1]) - np.repeat(offs[:-1], padded)
    grp_start = slot_base[::GROUP]
    cnt_img = np.repeat(counts, padded // GROUP)
    group_counts = np.clip(cnt_img - grp_start, 0, GROUP)
    zrow = int(np.flatnonzero(order < 0)[0])
    g_of_s = np.full(Os, zrow, np.int64)
    g_of_s[order[order >= 0]] = np.flatnonzero(order >= 0)
    return (order, img_of_group.astype(np.int32),
            group_counts.astype(np.int32), g_of_s, zrow)


def build_mega_plan(problem_slot: ba.BAProblem, plan_slot: DenseLmSchurPlan,
                    n_images: int, *, pair_chunk: int = 32,
                    nc_bucket: int = 64, pow2_buckets: bool = False):
    """Build (consts, plan, meta) for a slot-major photometric problem.

    ``problem_slot``/``plan_slot`` come from ``fused.densify_problem``; the
    group layout, pair chunks (in GROUP space) and slot->group map are
    built here, the slot-space lift tables are reused from the dense plan.
    """
    o = problem_slot.obs
    aux = o.aux
    K = jax.tree_util.tree_leaves(problem_slot.cam_states)[0].shape[0]
    valid = np.asarray(o.valid) != 0
    timg = np.asarray(aux.target_img)
    order, iog, cnt, g_of_s, zrow = mega_layout(timg, valid, n_images)
    Og = order.shape[0]
    take = np.where(order >= 0, order, 0)

    an_s = np.asarray(o.anchor_cam)
    tn_s = np.asarray(o.target_cam)
    lm_s = np.asarray(o.landmark)
    an_g = an_s[take].astype(np.int32)
    tn_g = tn_s[take].astype(np.int32)
    lm_g = lm_s[take].astype(np.int32)
    timg_g = timg[take].astype(np.int32)
    # padding rows sample their group's image (well-defined location)
    timg_g[order < 0] = np.repeat(iog, GROUP)[order < 0]

    # pair-Gram chunks over GROUP rows (valid rows only; dummy -> zrow)
    gv = np.flatnonzero(order >= 0)
    pair_ids = an_g[gv] * K + tn_g[gv]
    gidx, prows = _chunk_segments(pair_ids, pair_chunk)
    gidx = np.where(gidx >= 0, gv[np.clip(gidx, 0, None)], zrow)
    NCp = gidx.shape[0]
    NCpb = _round_up(NCp, nc_bucket, pow2_buckets)
    pg = np.full((NCpb, pair_chunk), zrow, np.int64)
    pg[:NCp] = gidx
    pa, pc = prows // K, prows % K
    rows4 = np.stack(
        [pa * K + pa, pa * K + pc, pc * K + pa, pc * K + pc], 1
    )
    cc_rows4 = np.full((NCpb, 4), K * K, np.int64)
    cc_rows4[:NCp] = rows4

    plan = MegaPlan(
        pg=jnp.asarray(pg.astype(np.int32)),
        cc_rows4=jnp.asarray(cc_rows4.astype(np.int32)),
        g_of_s=jnp.asarray(g_of_s.astype(np.int32)),
        obs_anchor_cam=jnp.asarray(plan_slot.obs_anchor_cam),
        obs_target_cam=jnp.asarray(plan_slot.obs_target_cam),
        lm_cam=jnp.asarray(plan_slot.lm_cam),
        anchor_cam_of_lm=jnp.asarray(plan_slot.anchor_cam_of_lm),
    )
    meta = dict(order=order, take=take, Og=Og, zrow=zrow)
    return plan, meta, (an_g, tn_g, lm_g, timg_g, iog, cnt)


def make_mega_consts(model: str, problem_slot: ba.BAProblem, meta,
                     idx_arrays, dtype=jnp.float32) -> MegaConsts:
    """Precompute the static group-order slabs (host-side, once per solve)."""
    from photometric_bundle_adjustment_tpu.models.photometric_ba import (
        PATCH_OFFSETS,
    )

    an_g, tn_g, lm_g, timg_g, iog, cnt = idx_arrays
    take = meta["take"]
    aux = problem_slot.obs.aux
    uv_ref = np.asarray(aux.uv_ref)[take]
    intr_ref = np.asarray(aux.intr_ref)[take]
    intr_t = np.asarray(aux.intr_target)[take]
    refp = np.asarray(aux.ref_patch)[take]

    # computed at the PROBLEM dtype so the result is bit-comparable with the
    # gather path (models/photometric_ba.make_rj_fn computes dirs in-loop at
    # the same precision)
    uv_patch = uv_ref[:, None, :] + PATCH_OFFSETS[None, :, :]  # (Og, P, 2)
    dirs = np.asarray(
        cameras.unproject_unit(
            model, jnp.asarray(intr_ref, dtype)[:, None, :],
            jnp.asarray(uv_patch, dtype),
        )
    )                                                          # (Og, P, 3)
    d3 = np.transpose(dirs, (2, 1, 0)).reshape(3 * P, -1)      # row j*P+p

    # image-staging pipeline control (kernel double buffer): per group,
    # which half-buffer holds its image, whether it starts a new image,
    # and which image to prefetch into the other half at that point.
    # Each _SEG_GROUPS segment is its own pallas_call, so the pipeline
    # restarts there: parity resets, a segment-crossing run re-fetches,
    # and prefetches never target an image of the NEXT segment (a started
    # DMA must be waited within its own kernel instance).
    iog_np = np.asarray(iog)
    ng = iog_np.shape[0]
    seg_first = (np.arange(ng) % _SEG_GROUPS) == 0
    firsts = np.r_[True, iog_np[1:] != iog_np[:-1]] | seg_first
    cf = np.cumsum(firsts.astype(np.int64))             # firsts incl. self
    seg_id = np.arange(ng) // _SEG_GROUPS
    buf = ((cf - cf[seg_id * _SEG_GROUPS]) % 2).astype(np.int32)
    fidx = np.flatnonzero(firsts)
    run_img = iog_np[fidx]                              # (n_runs,)
    run_seg = seg_id[fidx]
    nxt_run = np.r_[run_img[1:], -1]
    nxt_same_seg = np.r_[run_seg[1:] == run_seg[:-1], False]
    run_of_g = cf - 1
    nxt = nxt_run[run_of_g]
    has = nxt_same_seg[run_of_g] & (nxt >= 0)
    ictl = (buf | (firsts.astype(np.int32) << 1)
            | (has.astype(np.int32) << 2))
    inxt = np.where(has, nxt, 0).astype(np.int32)

    return MegaConsts(
        d3=jnp.asarray(d3, dtype),
        intr_t=jnp.asarray(intr_t.T, dtype),
        refp=jnp.asarray(refp.T, dtype),
        an=jnp.asarray(an_g),
        tn=jnp.asarray(tn_g),
        lm=jnp.asarray(lm_g),
        timg=jnp.asarray(timg_g),
        iog=jnp.asarray(iog),
        cnt=jnp.asarray(cnt),
        ictl=jnp.asarray(ictl),
        inxt=jnp.asarray(inxt),
    )


# ---------------------------------------------------------------------------
# phase 1: warp + projection + Jacobian coefficient slabs (XLA)
# ---------------------------------------------------------------------------


def _state_row_gather(vec, idx):
    """``vec (L,)`` gathered at ``idx (N,)`` through the 8-wide row-gather
    fast path.  1-D gathers lower to a pathological per-element loop on
    TPU (measured ~0.3 ms for 41k elements).  The state is broadcast to
    8 IDENTICAL columns behind an optimization barrier, row-gathered, and
    reduced by sum/8 — exact in f32 (x*8 and /8 are exact), and neither
    the zero-pad simplification (sum of pad = column 0) nor a narrowing
    slice can fold the gather back to 1-D through the barrier, which both
    defeated the earlier pad-and-slice formulations."""
    wide = jax.lax.optimization_barrier(
        jnp.broadcast_to(vec[:, None], (vec.shape[0], 8))
    )
    return wide[idx].sum(axis=1) * 0.125


def _rot_planes(q):
    """Unit quaternion rows (N, 4) -> 3x3 list of (N,) rotation entries
    (same element formulas as se3.quat_to_matrix)."""
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(x)
    return [
        [one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy)],
    ]


def warp_slabs(model: str, cam_states, inv_depth, consts: MegaConsts):
    """Phase-1: group-order plane-layout warp evaluation.

    Returns (ux, uy, fin, GA, GB): pixel planes (P, Og) with non-finite
    projections replaced by -1e6, the finite mask (P, Og), and the two
    (104, Og) Jacobian coefficient slabs (k-major rows k*P + p).
    """
    poses = cam_states.pose                        # (K, 7)
    pa = poses[consts.an]                          # (Og, 7)
    pc = poses[consts.tn]
    rho = _state_row_gather(inv_depth, consts.lm)[None, :]  # (1, Og)
    Ra = _rot_planes(pa[:, 3:7])
    Rc = _rot_planes(pc[:, 3:7])
    # M[j][c] = sum_i Rc[i][j] Ra[i][c]  (M = Rc^T Ra);  u_j = Rc^T (ta-tc)
    M = [[sum(Rc[i][j] * Ra[i][c] for i in range(3))[None, :]
          for c in range(3)] for j in range(3)]
    dt = [pa[:, i] - pc[:, i] for i in range(3)]
    u = [sum(Rc[i][j] * dt[i] for i in range(3))[None, :] for j in range(3)]

    d = [consts.d3[j * P:(j + 1) * P] for j in range(3)]   # 3 x (P, Og)
    q = [M[j][0] * d[0] + M[j][1] * d[1] + M[j][2] * d[2] + rho * u[j]
         for j in range(3)]

    ux0, uy0, Jpi0, Jpi1 = camera_slab.project_slab(
        model, consts.intr_t, q[0], q[1], q[2]
    )

    def coeff(Jp):
        a = [Jp[0] * M[0][c] + Jp[1] * M[1][c] + Jp[2] * M[2][c]
             for c in range(3)]
        blocks = [rho * a[0], rho * a[1], rho * a[2]]
        # dphi_a: d x a
        blocks += [d[1] * a[2] - d[2] * a[1],
                   d[2] * a[0] - d[0] * a[2],
                   d[0] * a[1] - d[1] * a[0]]
        # dt_c: -rho * Jpi
        blocks += [-rho * Jp[0], -rho * Jp[1], -rho * Jp[2]]
        # dphi_c: Jpi x q
        blocks += [Jp[1] * q[2] - Jp[2] * q[1],
                   Jp[2] * q[0] - Jp[0] * q[2],
                   Jp[0] * q[1] - Jp[1] * q[0]]
        # drho: Jpi . u
        blocks += [Jp[0] * u[0] + Jp[1] * u[1] + Jp[2] * u[2]]
        return jnp.concatenate(blocks, axis=0)     # (104, Og)

    GA = coeff(Jpi0)
    GB = coeff(Jpi1)
    fin = jnp.isfinite(ux0) & jnp.isfinite(uy0)
    ux = jnp.where(fin, ux0, -1e6)
    uy = jnp.where(fin, uy0, -1e6)
    return ux, uy, fin, GA, GB


def _tile_prologue(ux, uy, H, W, Hp, Wp):
    """Tile-start codes + window-start rows (XLA).

    The code packs (y0/8, hicol) for the kernel's (TILE_H, TILE_W) image
    slice, where ``hicol`` is the 128-aligned LOAD column into the
    4-panel split-packed image ([hi | hi<<64 | lo | lo<<64], see
    split_pack_images): window start xw = 64*floor(xs/64) loads at
    column xw from the un-rotated panel when xw is a 128-multiple, and
    at column (xw - 64) + Wp from the 64-rotated panel otherwise — both
    128-aligned.  ``wsy`` carries (xw, y0) in ORIGINAL image coordinates
    as a float (2, Og) row so the kernel can rebuild window-relative tap
    coordinates ON-CHIP.  Round 3 computed rx/ry/mask slabs here and
    shipped them transposed into the kernel — the (8, Og) -> (Og, 8)
    sublane->lane relayouts alone cost ~1.5 ms/build; v2 ships only the
    native-layout pixel planes and does the rest in the kernel."""
    dtype = ux.dtype
    xc = jnp.clip(ux, 0.0, W - 1.001)
    yc = jnp.clip(uy, 0.0, H - 1.001)
    # keepdims: every op below stays (1, Og) 2-D — 1-D (Og,) int vectors
    # relayout on EVERY op on TPU (measured ~1.8 ms for this block in the
    # 1-D formulation vs ~0.1 ms here); one final reshape for the SMEM
    # prefetch operand
    xs = jnp.maximum(
        jnp.floor(jnp.min(xc, axis=0, keepdims=True)).astype(jnp.int32) - 1,
        0,
    )                                                   # (1, Og)
    # 64-granular window start, clipped so the 128-lane window stays
    # inside the padded image (Wp - W >= the clip slack: rx stays < XW)
    xw = jnp.clip(xs // 64 * 64, 0, Wp - TILE_W)
    k = (xw // 64) % 2                                  # rotated-copy bit
    hicol = xw - 64 * k + Wp * k
    y0 = jnp.clip(
        jnp.floor(jnp.min(yc, axis=0, keepdims=True)).astype(jnp.int32) - 1,
        0, Hp - TILE_H,
    ) // 8 * 8
    code = ((y0 // 8) * 16384 + hicol).reshape(-1)
    wsy = jnp.concatenate(
        [xw.astype(dtype), y0.astype(dtype)], axis=0
    )                                                   # (2, Og)
    return code, wsy


# ---------------------------------------------------------------------------
# phase 2: the megakernel
# ---------------------------------------------------------------------------


def _make_kernel(huber_delta: float, H: int, W: int, mode: str = "full",
                 sample_dtype=jnp.float32):
    """``mode`` is a profiling aid: "full" (production), "loop_only"
    (sampler loop + raw tile sums out, no combine), "weights_only"
    (weight construction + combine on stale samples, no loop).

    v2 body structure (one MXU dot per observation): each unrolled body
    computes ONLY the y-contraction TY = wy_t (2P, TILE_H) @ tile and
    stores it to the ty3 scratch; the x-taps, the value/gradient combine,
    and the lane reduction run BATCHED over the whole group after the
    loop (3 elementwise muls + 3 lane-sums on (P, GROUP, XW)), replacing
    round 3's three per-body (P, XW) x (XW, 1) MXU dots whose M=8 wasted
    15/16 of every 128-row MXU pass.  ``sample_dtype=bfloat16`` runs the
    per-body dot in bf16 (uint8 image intensities are EXACT in bf16; the
    bilinear y-taps lose <=2^-8 relative) — one MXU pass instead of the
    3-pass f32 emulation; accumulation stays f32."""
    Q = 2 * P
    R3 = 3 * P
    # f32 tier = split-bf16x3 sampling (hi/lo images + hi/lo value taps);
    # bf16 tier = hi-only single pass
    split = sample_dtype == jnp.float32

    def kernel(iog_ref, cnt_ref, code_ref, ictl_ref, inxt_ref,
               ux_ref, uy_ref, wsy_ref,
               ga_ref, gb_ref, refp_ref, aff_ref, img_ref, out_ref,
               ty3, wy23, imgbuf, imgsem0, imgsem1):
        g = pl.program_id(0)
        base = g * GROUP
        cnt = cnt_ref[g]
        Hi = img_ref.shape[1]

        # manual double-buffered image staging: groups are image-sorted,
        # so the image changes only at run boundaries.  A BlockSpec with a
        # prefetch-scalar index map re-issues its DMA EVERY step even for
        # a repeated index (measured 0.93 ms/build for 160 constant-index
        # (1, Hp, Wp) steps), and a blocking fetch stalls the loop at
        # every boundary — so: at each image's first group, WAIT on this
        # image's half-buffer (its copy was started one image ago) and
        # START the next image's copy into the other half, which overlaps
        # with this image's sampling compute.
        ctl = ictl_ref[g]
        buf = ctl & 1
        first = (ctl & 2) != 0
        has_nxt = (ctl & 4) != 0

        @pl.when(g == 0)
        def _():
            pltpu.make_async_copy(
                img_ref.at[iog_ref[0]], imgbuf.at[pl.ds(0, Hi)], imgsem0
            ).start()

        @pl.when(first & (buf == 0))
        def _():
            pltpu.make_async_copy(
                img_ref.at[iog_ref[g]], imgbuf.at[pl.ds(0, Hi)], imgsem0
            ).wait()

        @pl.when(first & (buf == 1))
        def _():
            pltpu.make_async_copy(
                img_ref.at[iog_ref[g]], imgbuf.at[pl.ds(Hi, Hi)], imgsem1
            ).wait()

        @pl.when(first & has_nxt & (buf == 0))
        def _():
            pltpu.make_async_copy(
                img_ref.at[inxt_ref[g]], imgbuf.at[pl.ds(Hi, Hi)], imgsem1
            ).start()

        @pl.when(first & has_nxt & (buf == 1))
        def _():
            pltpu.make_async_copy(
                img_ref.at[inxt_ref[g]], imgbuf.at[pl.ds(0, Hi)], imgsem0
            ).start()

        if mode == "empty":
            out_ref[...] = jnp.zeros((OUT_ROWS, GROUP), jnp.float32)
            return

        ux = ux_ref[:]                         # (P, GROUP) pixel planes
        uy = uy_ref[:]
        ws = wsy_ref[0:1, :]                   # (1, GROUP) window starts
        y0f = wsy_ref[1:2, :]
        dtype = ux.dtype

        # window-relative tap coordinates, on-chip (v1 shipped these as
        # (Og, 8) transposed inputs; the relayouts cost ~1.5 ms/build)
        xc = jnp.clip(ux, 0.0, W - 1.001)
        yc = jnp.clip(uy, 0.0, H - 1.001)
        rx = jnp.clip(xc - ws, 0.0, XW - 1.001)
        ry = jnp.clip(yc - y0f, 0.0, TILE_H - 1.001)

        # stacked-tap weights: value taps (1-f, f) and derivative taps
        # (-1, +1) share the VALUE coordinates' one-hot columns — gradient
        # invalidation happens in the slab epilogue via inx/iny masks, so
        # only P rows of compares are built per axis.  Only the y-taps are
        # staged to scratch (the loop's dot reads them per body); the
        # x-taps are values of the POST-loop combine, so they live as
        # compiler-managed temporaries, not scratch (scoped-vmem budget).
        cx = jnp.floor(rx)
        cy = jnp.floor(ry)
        fx = rx - cx
        fy = ry - cy
        cxi = cx.astype(jnp.int32)
        cyi = cy.astype(jnp.int32)

        ioy = jax.lax.broadcasted_iota(jnp.int32, (P, GROUP, TILE_H), 2)
        isy0 = (ioy == cyi[:, :, None]).astype(dtype)
        isy1 = (ioy == cyi[:, :, None] + 1).astype(dtype)
        # split-bf16 tap weights: hi rows always; the f32 tier adds the
        # value-tap residual rows (derivative taps are +-1/0 — exact in
        # bf16, no residual)
        wv = isy0 * (1.0 - fy[:, :, None]) + isy1 * fy[:, :, None]
        wv_hi = wv.astype(jnp.bfloat16)
        wy23[0:P] = wv_hi
        wy23[P:Q] = (isy1 - isy0).astype(jnp.bfloat16)
        if split:
            wy23[Q:Q + P] = (
                wv - wv_hi.astype(jnp.float32)
            ).astype(jnp.bfloat16)

        # the image panels: [hi | hi<<64 | lo | lo<<64] each Wpk wide
        # (split_pack_images); a body's lo tile sits exactly 2*Wpk lanes
        # right of its hi tile, whichever rotation copy it loads from
        Wpk = img_ref.shape[2] // 4

        if mode != "weights_only":
            for t in range(GROUP):
                @pl.when(t < cnt)
                def _(t=t):
                    code = code_ref[base + t]
                    # buf folds into the row offset: imgbuf is (2*Hi, 4*Wpk)
                    y0 = pl.multiple_of(
                        (code >> 14) * 8 + buf * Hi, 8
                    )
                    x0 = pl.multiple_of(code & 16383, 128)
                    t_hi = imgbuf[pl.ds(y0, TILE_H), pl.ds(x0, TILE_W)]
                    # bf16 inputs must carry DEFAULT precision: an ambient
                    # default_matmul_precision("float32") would stamp the
                    # op contract_precision<fp32>, which Mosaic rejects
                    # for non-f32 operands ("Bad lhs type")
                    if split:
                        # THREE single-pass bf16 dots (measured faster
                        # than folding the lo taps into one M=24 pass —
                        # pass cost steps at sublane-tile granularity):
                        # hi taps x hi image, lo value-taps x hi image,
                        # hi taps x lo image
                        d1 = jnp.dot(
                            wy23[0:Q, t, :], t_hi,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                        d2 = jnp.dot(
                            wy23[Q:R3, t, :], t_hi,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                        x0l = pl.multiple_of(2 * Wpk + x0, 128)
                        t_lo = imgbuf[pl.ds(y0, TILE_H), pl.ds(x0l, TILE_W)]
                        d3 = jnp.dot(
                            wy23[0:Q, t, :], t_lo,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                        ty3[0:P, t, :] = d1[0:P] + d2 + d3[0:P]
                        ty3[P:Q, t, :] = d1[P:Q] + d3[P:Q]
                    else:
                        ty3[:, t, :] = jnp.dot(
                            wy23[0:Q, t, :], t_hi,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )

        if mode == "loop_only":
            out_ref[0:P, :] = jnp.sum(ty3[0:P], axis=-1)
            out_ref[P:2 * P, :] = jnp.sum(ty3[P:Q], axis=-1)
            out_ref[2 * P:OUT_ROWS, :] = jnp.zeros(
                (OUT_ROWS - 2 * P, GROUP), jnp.float32
            )
            return

        # ---- batched x-combine: muls + lane reductions, chunked per patch
        # row so the peak temp is (1, GROUP, XW) = 256 KB instead of three
        # (P, GROUP, XW) = 2 MB slabs — the smaller stack lets Mosaic keep
        # the image block double-buffered (scoped-vmem limit 16 MB)
        iox1 = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP, XW), 2)
        vals, gxs, gys = [], [], []
        for p in range(P):
            i0 = (iox1 == cxi[p:p + 1][:, :, None]).astype(dtype)
            i1 = (iox1 == cxi[p:p + 1][:, :, None] + 1).astype(dtype)
            wv = (i0 * (1.0 - fx[p:p + 1][:, :, None])
                  + i1 * fx[p:p + 1][:, :, None])
            vals.append(jnp.sum(ty3[p:p + 1] * wv, axis=-1))
            gxs.append(jnp.sum(ty3[p:p + 1] * (i1 - i0), axis=-1))
            gys.append(jnp.sum(ty3[P + p:P + p + 1] * wv, axis=-1))
        val = jnp.concatenate(vals, axis=0)                  # (P, GROUP)
        gx = jnp.concatenate(gxs, axis=0)
        gy = jnp.concatenate(gys, axis=0)

        # ---- slab epilogue: residual, Huber, Jacobian rows, payloads ----
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
        slot_ok = lanes < cnt                                # (1, GROUP)
        fin = ux > -1e5                                      # (P, GROUP)
        inx = (ux >= 0.0) & (ux <= W - 1.001) & (xc - ws <= XW - 1.001)
        iny = (uy >= 0.0) & (uy <= H - 1.001) & (yc - y0f <= TILE_H - 1.001)

        aff = aff_ref[:]                                     # (4, GROUP)
        e = jnp.exp(aff[2:3, :] - aff[0:1, :])               # (1, GROUP)
        ref_term = refp_ref[:] - aff[1:2, :]                 # (P, GROUP)
        r0 = (val - aff[3:4, :]) - e * ref_term
        r0 = jnp.where(fin, r0, jnp.nan)
        r = jnp.where(slot_ok, r0, 0.0)
        gxm = jnp.where(slot_ok & inx, gx, 0.0)
        gym = jnp.where(slot_ok & iny, gy, 0.0)

        r2 = jnp.sum(r * r, axis=0, keepdims=True)           # (1, GROUP)
        if huber_delta > 0:
            sq = jnp.sqrt(jnp.maximum(r2, 1e-300))
            inl = r2 <= huber_delta * huber_delta
            w = jnp.where(inl, jnp.ones_like(r2), huber_delta / sq)
            cost_row = 0.5 * jnp.where(
                inl, r2, 2.0 * huber_delta * sq - huber_delta * huber_delta
            )
        else:
            w = jnp.ones_like(r2)
            cost_row = 0.5 * r2
        w = jnp.where(slot_ok, w, 0.0)
        sw = jnp.sqrt(w)                                     # (1, GROUP)

        gx13 = jnp.concatenate([gxm] * 13, axis=0)           # (104, GROUP)
        gy13 = jnp.concatenate([gym] * 13, axis=0)
        Jgeo = (gx13 * ga_ref[:] + gy13 * gb_ref[:]) * sw
        J_aa = e * ref_term * sw                             # (P, GROUP)
        J_ab = jnp.broadcast_to(e * sw, (P, GROUP))
        J_ca = -e * ref_term * sw
        J_cb = jnp.broadcast_to(-sw, (P, GROUP))
        rsw = r * sw

        blocks17 = (
            [Jgeo[k * P:(k + 1) * P, :] for k in range(6)]
            + [J_aa, J_ab]
            + [Jgeo[(k + 6) * P:(k + 7) * P, :] for k in range(6)]
            + [J_ca, J_cb]
            + [Jgeo[12 * P:13 * P, :]]
        )
        Jp_blk = blocks17[16]
        A0 = jnp.concatenate(
            [jnp.sum(b * Jp_blk, axis=0, keepdims=True) for b in blocks17],
            axis=0,
        )                                                    # (17, GROUP)
        A1 = jnp.concatenate(
            [jnp.sum(b * rsw, axis=0, keepdims=True) for b in blocks17],
            axis=0,
        )

        # J rows are written P-MAJOR (row p*17 + c, c in W order): the
        # camera-pair Gram consumes (obs, p*17+c) rows directly, so the
        # (Og, 136) column permutation the k-major layout forced on every
        # build (~0.3-0.5 ms as an XLA lane-gather) disappears.  The
        # interleave here is a static sublane shuffle of VMEM rows.
        out_ref[0:136, :] = jnp.concatenate(
            [blocks17[c][p: p + 1, :] for p in range(P) for c in range(17)],
            axis=0,
        )
        out_ref[136:144, :] = rsw
        out_ref[144:145, :] = cost_row
        out_ref[145:162, :] = A0
        out_ref[162:179, :] = A1
        out_ref[179:OUT_ROWS, :] = jnp.zeros(
            (OUT_ROWS - 179, GROUP), jnp.float32
        )

    return kernel


def split_pack_images(images3d):
    """(Kimg, Hp, Wp) f32 -> (Kimg, Hp, 4*Wp) bf16 panels
    [hi | hi<<64 | lo | lo<<64].

    hi is the bf16 image, lo the residual lo = img - hi: the split lets
    the kernel's per-body contraction run as THREE single-pass bf16 dots
    (wy_hi.hi + wy_lo.hi + wy_hi.lo, error ~2^-15 relative, the dropped
    lo.lo term) instead of XLA's 6-pass f32 emulation — measured
    0.88 ms/build of pure pass count at EuRoC scale.  The <<64 copies
    (each image rotated 64 lanes left) give the kernel 64-GRANULAR
    window starts from 128-ALIGNED loads, halving the dot's N extent to
    TILE_W=128 (see the TILE_W note at the top).  2x the f32 stack's
    bytes in HBM and per-image DMA — measured well under the MXU/issue
    time it buys back.  Do this ONCE per solve (make_mega_solver);
    mega_rj packs on the fly only for stray f32 callers."""
    hi = images3d.astype(jnp.bfloat16)
    lo = (images3d - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate(
        [hi, jnp.roll(hi, -64, axis=2), lo, jnp.roll(lo, -64, axis=2)],
        axis=2,
    )


@functools.partial(
    jax.jit,
    static_argnames=("HW", "huber_delta", "interpret", "mode", "bf16"),
)
def mega_rj(images3d, ux, uy, GA, GB, refp, aff, iog, cnt, ictl, inxt,
            HW, huber_delta: float, interpret: bool = False,
            mode: str = "full", bf16: bool = False):
    """Run the megakernel: (184, Og) payload array (see module docstring).

    ``images3d`` is the split-packed bf16 stack (``split_pack_images``;
    a raw f32 pad_images stack is packed on the fly); ``aff`` is the
    (4, Og) affine slab [a_r, b_r, a_t, b_t]; ``ux``/``uy`` are the
    (P, Og) projected pixel planes from ``warp_slabs`` (non-finite
    projections encoded as -1e6).  The f32 tier samples via the 3-pass
    weight/image split (error ~2^-15 relative — the dropped lo.lo term);
    ``bf16=True`` uses the hi image and hi weights only (one MXU pass,
    <=2^-8 relative, identical numerics to the round-4 bf16 tier).
    """
    H, W = HW
    if images3d.dtype != jnp.bfloat16:
        images3d = split_pack_images(images3d)
    Kimg, Hp, Wp2 = images3d.shape
    Wp = Wp2 // 4
    Og = ux.shape[1]
    n_groups = Og // GROUP
    code, wsy = _tile_prologue(ux, uy, H, W, Hp, Wp)
    sample_dtype = jnp.bfloat16 if bf16 else jnp.float32
    ux = ux.astype(jnp.float32)
    uy = uy.astype(jnp.float32)
    wsy = wsy.astype(jnp.float32)

    def invoke(iog_s, cnt_s, code_s, ictl_s, inxt_s, ux_s, uy_s, wsy_s,
               ga_s, gb_s, refp_s, aff_s):
        ng = iog_s.shape[0]

        def lane(rows):
            return pl.BlockSpec(
                (rows, GROUP), lambda g, a, b, c, d, e: (0, g),
                memory_space=pltpu.VMEM,
            )

        lane_spec = [
            lane(P),            # ux
            lane(P),            # uy
            lane(2),            # wsy
            lane(104),          # GA
            lane(104),          # GB
            lane(P),            # refp
            lane(4),            # aff
            # full image stack stays in HBM; the kernel stages images into
            # the double-buffered imgbuf scratch (see kernel docstring)
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # iog, counts, code, ictl, inxt
            grid=(ng,),
            in_specs=lane_spec,
            out_specs=pl.BlockSpec(
                (OUT_ROWS, GROUP), lambda g, a, b, c, d, e: (0, g),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * P, GROUP, XW), jnp.float32),     # ty3
                # hi taps rows [0, 2P); lo value-tap rows [2P, 3P)
                pltpu.VMEM((3 * P, GROUP, TILE_H), jnp.bfloat16),  # wy23
                pltpu.VMEM((2 * Hp, Wp2), jnp.bfloat16),        # imgbuf
                pltpu.SemaphoreType.DMA,                         # imgsem0
                pltpu.SemaphoreType.DMA,                         # imgsem1
            ],
        )
        return pl.pallas_call(
            _make_kernel(float(huber_delta), H, W, mode, sample_dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (OUT_ROWS, ng * GROUP), jnp.float32
            ),
            interpret=interpret,
        )(iog_s.astype(jnp.int32), cnt_s.astype(jnp.int32),
          code_s.astype(jnp.int32), ictl_s.astype(jnp.int32),
          inxt_s.astype(jnp.int32), ux_s, uy_s, wsy_s, ga_s, gb_s,
          refp_s, aff_s, images3d)

    if n_groups <= _SEG_GROUPS:
        return invoke(iog, cnt, code, ictl, inxt, ux, uy, wsy,
                      GA, GB, refp, aff)
    parts = []
    for s in range(0, n_groups, _SEG_GROUPS):
        e_ = min(s + _SEG_GROUPS, n_groups)
        sl = slice(s * GROUP, e_ * GROUP)
        # each segment restarts its own image pipeline (make_mega_consts
        # computes ictl/inxt with per-_SEG_GROUPS parity/prefetch resets)
        parts.append(invoke(
            iog[s:e_], cnt[s:e_], code[sl], ictl[s:e_], inxt[s:e_],
            ux[:, sl], uy[:, sl], wsy[:, sl], GA[:, sl], GB[:, sl],
            refp[:, sl], aff[:, sl],
        ))
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# build: megakernel + dense Schur assembly (optim/fused.py semantics)
# ---------------------------------------------------------------------------


def build_mega(model: str, images3d, problem: ba.BAProblem,
               consts: MegaConsts, plan: MegaPlan, cfg: ba.BAConfig,
               HW, interpret: bool = False):
    """One normal-equation assembly; returns ``(cost, neq)`` with the same
    neq tuple as optim/fused.py build_dense (H_cc_mat, S_corr0, rhs_corr0,
    H_pp, g_c, g_p, M, inv0)."""
    C = 8
    K = jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
    L = problem.inv_depth.shape[0]

    ux, uy, fin, GA, GB = warp_slabs(
        model, problem.cam_states, problem.inv_depth, consts
    )
    # affine rows via 8-wide padded row gathers (1-D gathers are ~400 us
    # each on TPU; row gathers are ~free)
    affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))  # (K, 8)
    aff_a = affp[consts.an]                            # (Og, 8)
    aff_t = affp[consts.tn]
    aff = jnp.stack(
        [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
    )                                                  # (4, Og)

    out = mega_rj(images3d, ux, uy, GA, GB, consts.refp, aff,
                  consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=HW,
                  huber_delta=float(cfg.huber_delta), interpret=interpret,
                  bf16=bool(getattr(cfg, "sample_bf16", False)))

    cost = jnp.sum(out[ROW_COST])
    outT = out.T                                       # (Og, 184)
    dtype = outT.dtype

    # H_cc via camera-pair Gram chunks over group rows (the kernel emits
    # J rows p-major = the standard J2 column order; no permutation)
    J2 = outT[:, :136]                                 # (Og, 136)
    rows = J2[plan.pg]                                 # (NCp, Bp, 136)
    rows2 = rows.reshape(rows.shape[0], -1, 17)[..., :16]
    G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)      # (NCp, 16, 16)
    blocks = jnp.stack(
        [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C], G2[:, C:, C:]],
        axis=1,
    ).reshape(-1, C * C)
    H_cc = (
        jnp.zeros((K * K + 1, C * C), dtype)
        .at[plan.cc_rows4.reshape(-1)]
        .add(blocks)[: K * K]
        .reshape(K, K, C, C)
    )

    # per-observation Schur payloads, gathered back to slot order
    AB = outT[:, 145:179][plan.g_of_s]                 # (Os, 34)
    A0s = AB[:, :17]
    A1s = AB[:, 17:]
    S_ = plan.lm_cam.shape[0]
    A0r = A0s.reshape(S_, L, 17)
    red0 = A0r.sum(0)                                  # (L, 17)
    anchor_v = red0[:, :C]
    H_pp = red0[:, 16]
    g_p = A1s[:, 16].reshape(S_, L).sum(0)

    oh_an = jax.nn.one_hot(plan.obs_anchor_cam, K, dtype=dtype)
    oh_tn = jax.nn.one_hot(plan.obs_target_cam, K, dtype=dtype)
    g_c = oh_an.T @ A1s[:, :C] + oh_tn.T @ A1s[:, C:2 * C]

    lm_mask = problem.lm_valid.astype(dtype)
    inv0 = lm_mask / jnp.maximum(H_pp, cfg.min_inv_depth_hessian)
    vt_sl = A0r[:, :, C:2 * C]                         # (S, L, C)
    oh = jax.nn.one_hot(plan.lm_cam, K, dtype=dtype)
    M = jnp.einsum("slk,slc->lkc", oh, vt_sl).reshape(L, K * C)
    oh_a = jax.nn.one_hot(plan.anchor_cam_of_lm, K, dtype=dtype)
    M = M + (oh_a[:, :, None] * anchor_v[:, None, :]).reshape(L, K * C)

    Mw = M * inv0[:, None]
    if cfg.skip_schur_gram:
        S_corr0 = None
    else:
        prec = (jax.lax.Precision.HIGH
                if cfg.schur_matmul_precision == "high"
                else jax.lax.Precision.HIGHEST)
        S_corr0 = jax.lax.dot(Mw.T, M, precision=prec)
    rhs_corr0 = Mw.T @ g_p

    H_cc_mat = jnp.transpose(H_cc, (0, 2, 1, 3)).reshape(K * C, K * C)
    return cost, (H_cc_mat, S_corr0, rhs_corr0, H_pp, g_c, g_p, M, inv0)


def build_mega2(model: str, images3d, problem: ba.BAProblem,
                consts: MegaConsts, plan: MegaPlan, cfg: ba.BAConfig,
                HW, interpret: bool = False):
    """Round-5 assembly redesign of :func:`build_mega` (the geo_mega v2
    treatment applied to the photometric build):

      * the 136-column lane PERMUTATION of the kernel output is GONE —
        the kernel now emits its Jacobian rows p-major in W order, so the
        camera-pair Gram consumes out[:136].T directly,
      * the camera lifts (g_c, Schur coupling) are compare+multiply+reduce
        with the anchor as one extra virtual slot (exact f32; the one-hot
        MATMULS of v1 both rounded at matmul precision and cost extra
        passes),
      * the coupling is pre-scaled by sqrt(inv0) during the lift, so the
        gram  S_corr0 = Ms^T Ms  needs no separate weighted copy.

    Returns ``(cost, neq)`` with the v2 contract consumed by
    :func:`solve_lam2`: ``(H_cc_mat, S_corr0, rhs_corr0, g_c, g_p,
    Ms (L, K*C), inv0, s)``.  Parity with build_mega + solve_lam is
    tested at the damped-solve output (tests/test_pba_mega.py)."""
    C = 8
    K = jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
    L = problem.inv_depth.shape[0]

    ux, uy, fin, GA, GB = warp_slabs(
        model, problem.cam_states, problem.inv_depth, consts
    )
    affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))  # (K, 8)
    aff_a = affp[consts.an]
    aff_t = affp[consts.tn]
    aff = jnp.stack(
        [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
    )

    out = mega_rj(images3d, ux, uy, GA, GB, consts.refp, aff,
                  consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=HW,
                  huber_delta=float(cfg.huber_delta), interpret=interpret,
                  bf16=bool(getattr(cfg, "sample_bf16", False)))

    cost = jnp.sum(out[ROW_COST])
    dtype = out.dtype

    # H_cc pair gram over the kernel's p-major J rows (standard J2 order)
    X = out[:136].T                                     # (Og, 136)
    rows = X[plan.pg]                                   # (NCp, Bp, 136)
    rows2 = rows.reshape(rows.shape[0], -1, 17)[..., :16]
    G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)       # (NCp, 16, 16)
    blocks = jnp.stack(
        [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C], G2[:, C:, C:]],
        axis=1,
    ).reshape(-1, C * C)
    # COMPONENT-MAJOR reduced system (row c*K + k, as geo_mega v2): the
    # camera-major block transpose put C = 8 in the minor lanes (16x tile
    # padding); component-major's minor dims (C sublanes, K lanes) pad
    # not at all for C = 8
    H_cc = (
        jnp.zeros((K * K + 1, C * C), dtype)
        .at[plan.cc_rows4.reshape(-1)]
        .add(blocks)[: K * K]
        .reshape(K, K, C, C)
    )
    H_cc_mat = jnp.transpose(H_cc, (2, 0, 3, 1)).reshape(K * C, K * C)

    # payload rows gathered to slot order (A0/A1 already in W order)
    AB = out[145:179].T[plan.g_of_s]                    # (Os, 34)
    S_ = plan.lm_cam.shape[0]
    A0r = AB[:, :17].reshape(S_, L, 17)
    A1r = AB[:, 17:].reshape(S_, L, 17)
    red0 = A0r.sum(0)                                   # (L, 17)
    anchor_v = red0[:, :C]
    H_pp = red0[:, 16]
    g_p = A1r[:, :, 16].sum(0)

    lm_mask = problem.lm_valid.astype(dtype)
    inv0 = lm_mask / jnp.maximum(H_pp, cfg.min_inv_depth_hessian)
    s = jnp.sqrt(inv0)

    # extended-slot compare-reduce lifts (anchor = one extra virtual slot)
    iot = jnp.arange(K, dtype=jnp.int32)
    lm_cam_ext = jnp.concatenate(
        [jnp.asarray(plan.lm_cam),
         jnp.asarray(plan.anchor_cam_of_lm)[None]], axis=0,
    )                                                   # (S+1, L)
    msk = (lm_cam_ext[:, :, None] == iot).astype(dtype)  # (S+1, L, K)
    vt_ext = jnp.concatenate(
        [A0r[:, :, C:2 * C], anchor_v[None]], axis=0
    ) * s[None, :, None]                                # (S+1, L, C)
    Ms = jnp.sum(
        vt_ext[:, :, :, None] * msk[:, :, None, :], axis=0
    ).reshape(L, C * K)                                 # c-major columns
    a1_ext = jnp.concatenate(
        [A1r[:, :, C:2 * C], A1r[:, :, :C].sum(0)[None]], axis=0
    )                                                   # (S+1, L, C)
    g_c = jnp.sum(a1_ext[:, :, :, None] * msk[:, :, None, :], axis=(0, 1))

    if cfg.skip_schur_gram:
        S_corr0 = None
    else:
        prec = (jax.lax.Precision.HIGH
                if cfg.schur_matmul_precision == "high"
                else jax.lax.Precision.HIGHEST)
        S_corr0 = jax.lax.dot_general(
            Ms, Ms, (((0,), (0,)), ((), ())), precision=prec
        )                                               # (K*C, K*C)
    rhs_corr0 = (s * g_p) @ Ms
    return cost, (H_cc_mat, S_corr0, rhs_corr0, g_c, g_p, Ms, inv0, s)


def solve_lam2(neq, lam, free_cam_mask, cfg: ba.BAConfig):
    """Damped solve + back-substitution for the v2 neq contract
    (COMPONENT-MAJOR reduced system, row c*K + k; scaled (L, C*K)
    coupling: (M @ dc) * inv0 == s * (Ms @ dc))."""
    H_cc_mat, S_corr0, rhs_corr0, g_c, g_p, Ms, inv0, s = neq
    KC = H_cc_mat.shape[0]
    K = free_cam_mask.shape[0]
    C_ = KC // K
    dtype = g_c.dtype
    d_cc = jnp.clip(jnp.diagonal(H_cc_mat), 1e-12, 1e32)
    S = H_cc_mat + jnp.diag(lam * d_cc) - S_corr0 / (1.0 + lam)
    rhs = -(g_c.reshape(-1) - rhs_corr0 / (1.0 + lam))
    mask = jnp.tile(free_cam_mask.astype(dtype), C_)
    S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    cho = jax.scipy.linalg.cho_factor(S, lower=True)
    delta_c = jax.scipy.linalg.cho_solve(cho, rhs * mask) * mask
    delta_p = -(g_p * inv0 + s * (Ms @ delta_c)) / (1.0 + lam)
    return delta_c.reshape(C_, K).T, delta_p


def build_chunk_mega_plan(problem: ba.BAProblem, n_images: int, *,
                          pair_chunk: int = 32, lm_chunk: int = 8,
                          cam_chunk: int = 256, nc_bucket: int = 64,
                          pow2_buckets: bool = False):
    """Chunk-plan layout for a RAGGED (non-densified) photometric problem.

    Real maps are heavy-tailed in observations-per-landmark (EuRoC V1: one
    landmark with 96 obs -> an 18x slot blow-up under the dense S x L
    layout), so the slot-space lift tables of ``build_mega_plan`` are the
    wrong assembly there.  This variant lays the kernel out over VALID
    observations only (per-image GROUP padding, ~1.3-1.7x) and assembles
    the normal equations with the generic chunked segment-sum plans of
    ``optim/schur_plan.build_schur_plan`` — built directly in GROUP space,
    so no slot-order gather of the kernel output is needed at all.

    Returns ``(cplan, meta, idx_arrays)`` with the same meta/idx contract
    as ``build_mega_plan`` (feed to ``make_mega_consts``).
    """
    o = problem.obs
    K = jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
    L = problem.inv_depth.shape[0]
    valid = np.asarray(o.valid) != 0
    timg = np.asarray(o.aux.target_img)
    order, iog, cnt, g_of_s, zrow = mega_layout(timg, valid, n_images)
    Og = order.shape[0]
    take = np.where(order >= 0, order, 0)
    an_g = np.asarray(o.anchor_cam)[take].astype(np.int32)
    tn_g = np.asarray(o.target_cam)[take].astype(np.int32)
    lm_g = np.asarray(o.landmark)[take].astype(np.int32)
    timg_g = timg[take].astype(np.int32)
    timg_g[order < 0] = np.repeat(iog, GROUP)[order < 0]
    cplan = build_schur_plan(
        an_g, tn_g, lm_g, K, L, valid=(order >= 0),
        pair_chunk=pair_chunk, lm_chunk=lm_chunk, cam_chunk=cam_chunk,
        nc_bucket=nc_bucket, pow2_buckets=pow2_buckets,
    )
    meta = dict(order=order, take=take, Og=Og, zrow=zrow)
    return cplan, meta, (an_g, tn_g, lm_g, timg_g, iog, cnt)


def build_mega_chunk(model: str, images3d, problem: ba.BAProblem,
                     consts: MegaConsts, cplan: SchurPlan,
                     cfg: ba.BAConfig, HW, interpret: bool = False):
    """Megakernel + chunk-plan assembly (optim/fused.py build_chunk
    semantics); same ``(cost, neq)`` contract as ``build_mega``."""
    from photometric_bundle_adjustment_tpu.optim.fused import _chunk_sum

    C = 8
    K = jax.tree_util.tree_leaves(problem.cam_states)[0].shape[0]
    L = problem.inv_depth.shape[0]

    ux, uy, fin, GA, GB = warp_slabs(
        model, problem.cam_states, problem.inv_depth, consts
    )
    affp = jnp.pad(problem.cam_states.affine, ((0, 0), (0, 6)))
    aff_a = affp[consts.an]
    aff_t = affp[consts.tn]
    aff = jnp.stack(
        [aff_a[:, 0], aff_a[:, 1], aff_t[:, 0], aff_t[:, 1]], axis=0
    )

    out = mega_rj(images3d, ux, uy, GA, GB, consts.refp, aff,
                  consts.iog, consts.cnt, consts.ictl, consts.inxt, HW=HW,
                  huber_delta=float(cfg.huber_delta), interpret=interpret,
                  bf16=bool(getattr(cfg, "sample_bf16", False)))

    cost = jnp.sum(out[ROW_COST])
    # zero dummy row at index Og: the chunk plans' dummy gathers point there
    outT = jnp.pad(out.T, ((0, 1), (0, 0)))            # (Og+1, 184)
    dtype = outT.dtype

    J2 = outT[:, :136]                                 # (Og+1, 136)
    rows = J2[cplan.pg]                                # (NCp, Bp, 136)
    rows2 = rows.reshape(rows.shape[0], -1, 17)[..., :16]
    G2 = jnp.einsum("nbi,nbj->nij", rows2, rows2)
    blocks = jnp.stack(
        [G2[:, :C, :C], G2[:, :C, C:], G2[:, C:, :C], G2[:, C:, C:]],
        axis=1,
    ).reshape(-1, C * C)
    H_cc = (
        jnp.zeros((K * K + 1, C * C), dtype)
        .at[jnp.asarray(cplan.cc_rows4).reshape(-1)]
        .add(blocks)[: K * K]
        .reshape(K, K, C, C)
    )

    AB = outT[:, 145:179]                              # (Og+1, 34)
    A0 = AB[:, :17]
    A1 = AB[:, 17:]
    pay_l = jnp.concatenate(
        [A0[:, :C], A0[:, 16:17], A1[:, 16:17]], axis=1
    )                                                  # (Og+1, C+2)
    red_l = _chunk_sum(pay_l, cplan.lm, L)
    anchor_v, H_pp, g_p = red_l[:, :C], red_l[:, C], red_l[:, C + 1]

    g_c = (
        _chunk_sum(A1[:, :C], cplan.gc_a, K)
        + _chunk_sum(A1[:, C:2 * C], cplan.gc_t, K)
    )

    lm_mask = problem.lm_valid.astype(dtype)
    inv0 = lm_mask / jnp.maximum(H_pp, cfg.min_inv_depth_hessian)
    oh = jax.nn.one_hot(cplan.lm_cam, K, dtype=dtype)  # (NC_lm, B_lm, K)
    vt = A0[:, C:2 * C]                                # (Og+1, C)
    rows_t = vt[cplan.lm.gidx]                         # (NC_lm, B_lm, C)
    part = jnp.einsum("nbk,nbc->nkc", oh, rows_t)      # (NC_lm, K, C)
    M = (
        jnp.zeros((L + 1, K * C), dtype)
        .at[jnp.asarray(cplan.lm.rows)]
        .add(part.reshape(part.shape[0], K * C))[:L]
    )
    oh_a = jax.nn.one_hot(cplan.anchor_cam_of_lm, K, dtype=dtype)
    M = M + (oh_a[:, :, None] * anchor_v[:, None, :]).reshape(L, K * C)

    Mw = M * inv0[:, None]
    if cfg.skip_schur_gram:
        S_corr0 = None
    else:
        prec = (jax.lax.Precision.HIGH
                if cfg.schur_matmul_precision == "high"
                else jax.lax.Precision.HIGHEST)
        S_corr0 = jax.lax.dot(Mw.T, M, precision=prec)
    rhs_corr0 = Mw.T @ g_p

    H_cc_mat = jnp.transpose(H_cc, (0, 2, 1, 3)).reshape(K * C, K * C)
    return cost, (H_cc_mat, S_corr0, rhs_corr0, H_pp, g_c, g_p, M, inv0)


def solve_lam(neq, lam, free_cam_mask, cfg: ba.BAConfig):
    """Per-lambda dense solve + back-substitution (optim/fused.py)."""
    H_cc_mat, S_corr0, rhs_corr0, H_pp, g_c, g_p, M, inv0 = neq
    KC = H_cc_mat.shape[0]
    K = free_cam_mask.shape[0]
    C_ = KC // K
    dtype = g_c.dtype
    d_cc = jnp.clip(jnp.diagonal(H_cc_mat), 1e-12, 1e32)
    S = H_cc_mat + jnp.diag(lam * d_cc) - S_corr0 / (1.0 + lam)
    rhs = -(g_c.reshape(-1) - rhs_corr0 / (1.0 + lam))
    mask = jnp.repeat(free_cam_mask.astype(dtype), C_)
    S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    cho = jax.scipy.linalg.cho_factor(S, lower=True)
    delta_c = jax.scipy.linalg.cho_solve(cho, rhs * mask) * mask
    delta_p = -(g_p + M @ delta_c) * inv0 / (1.0 + lam)
    return delta_c.reshape(K, C_), delta_p


def _cam_retract(cam, delta):
    return cam._replace(
        pose=se3.right_plus(cam.pose, delta[:6]),
        affine=cam.affine + delta[6:8],
    )


def make_mega_solver(model: str, images_flat: jax.Array, H: int, W: int,
                     problem_slot: ba.BAProblem, n_images: int,
                     plan_slot: DenseLmSchurPlan | None = None, *,
                     interpret: bool = False, pow2_buckets: bool = False):
    """Megakernel photometric LM solver.

    With ``plan_slot`` (a DenseLmSchurPlan for a densify_problem-reordered
    problem): slot-major dense assembly — fastest for near-uniform
    observation counts (benchmarks, synthetic).  Without it: chunk-plan
    assembly over valid observations only — the right layout for real,
    heavy-tailed maps (``build_chunk_mega_plan``).

    Returns ``solve(problem, cfg) -> (problem, BAResult)`` with
    ``.build(problem, cfg)`` / ``.solve_lam(neq, lam, free, cfg)`` exposed
    for benchmarking; the padded image stack and the static slabs ride the
    jit boundary as ARGUMENTS (HLO-constant inlining of ~250 MB of pixels
    would blow up every compile — see models/photometric_ba.py).
    """
    from photometric_bundle_adjustment_tpu.ops import patch_sample as ps

    images3d = images_flat.reshape(-1, H, W)
    images_pad, HW = ps.pad_images(images3d)
    # split-packed bf16 stack (hi | lo halves): same bytes as f32, lets
    # the kernel sample in 1 (bf16 tier) or 3 (f32 tier) MXU passes
    images_pad = split_pack_images(images_pad)
    if plan_slot is not None:
        plan, meta, idx_arrays = build_mega_plan(
            problem_slot, plan_slot, n_images, pow2_buckets=pow2_buckets
        )
        # round-5 v2 assembly (exact compare-reduce lifts, scaled gram)
        build_impl = build_mega2
        solve_lam_impl = solve_lam2
    else:
        plan, meta, idx_arrays = build_chunk_mega_plan(
            problem_slot, n_images, pow2_buckets=pow2_buckets
        )
        build_impl = build_mega_chunk
        solve_lam_impl = solve_lam
    consts = make_mega_consts(model, problem_slot, meta, idx_arrays)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _build(img, problem, consts, plan, cfg):
        with jax.default_matmul_precision("float32"):
            return build_impl(model, img, problem, consts, plan, cfg,
                              HW=HW, interpret=interpret)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _solve_lam(neq, lam, free, cfg):
        with jax.default_matmul_precision("float32"):
            return solve_lam_impl(neq, lam, free, cfg)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _solve(img, problem, consts, plan, cfg):
        """Fused-cost LM loop (optim/fused.py solve_cost_from_build
        semantics: the build at the trial point is both the accept check
        and the next iteration's normal equations)."""
        with jax.default_matmul_precision("float32"):
            free = ~problem.fixed_cams
            init_cost, neq0 = build_impl(
                model, img, problem, consts, plan, cfg, HW=HW,
                interpret=interpret,
            )
            dtype = problem.inv_depth.dtype

            def apply_step(prob, dc, dp):
                return prob._replace(
                    cam_states=jax.vmap(_cam_retract)(prob.cam_states, dc),
                    inv_depth=prob.inv_depth + dp,
                )

            def body(state):
                prob, lam, cost, neq, rejects, iters, tries, done = state
                dc, dp = solve_lam_impl(neq, lam, free, cfg)
                p_try = apply_step(prob, dc, dp)
                cost_try, neq_try = build_impl(
                    model, img, p_try, consts, plan, cfg, HW=HW,
                    interpret=interpret,
                )
                ok = (cost_try < cost) & jnp.isfinite(cost_try)
                p_new = prob._replace(
                    cam_states=jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok, a, b),
                        p_try.cam_states, prob.cam_states,
                    ),
                    inv_depth=jnp.where(ok, p_try.inv_depth, prob.inv_depth),
                )
                neq_new = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), neq_try, neq
                )
                cost_new = jnp.where(ok, cost_try, cost)
                lam_new = jnp.where(
                    ok, jnp.maximum(lam / 3.0, cfg.min_lambda), lam * 10.0
                )
                rejects_new = jnp.where(ok, 0, rejects + 1)
                small = ok & (
                    jnp.abs(cost - cost_try)
                    <= cfg.function_tolerance * jnp.maximum(cost, 1e-300)
                )
                done_new = small | (rejects_new >= cfg.max_retries) | (
                    lam_new > cfg.max_lambda
                )
                return (p_new, lam_new, cost_new, neq_new, rejects_new,
                        iters + ok.astype(jnp.int32), tries + 1, done_new)

            def cond(state):
                _, _, _, _, _, iters, tries, done = state
                return (~done) & (iters < cfg.max_iterations) & (
                    tries < cfg.max_iterations * cfg.max_retries
                )

            state0 = (
                problem, jnp.asarray(cfg.init_lambda, dtype), init_cost,
                neq0, jnp.asarray(0), jnp.asarray(0), jnp.asarray(0),
                jnp.asarray(False),
            )
            prob, lam, cost, _, _, iters, _, _ = jax.lax.while_loop(
                cond, body, state0
            )
            return prob, ba.BAResult(
                cost=cost, initial_cost=init_cost, iterations=iters, lam=lam
            )

    def solve(problem, cfg: ba.BAConfig = ba.BAConfig()):
        return _solve(images_pad, problem, consts, plan, cfg)

    solve.build = lambda problem, cfg: _build(
        images_pad, problem, consts, plan, cfg
    )
    solve.solve_lam = lambda neq, lam, free, cfg: _solve_lam(
        neq, lam, free, cfg
    )
    solve.images_pad = images_pad
    solve.HW = HW
    solve.consts = consts
    solve.plan = plan
    solve.meta = meta
    return solve
