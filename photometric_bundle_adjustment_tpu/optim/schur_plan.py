"""Host-precomputed index plans for fused Schur normal-equation assembly.

The reference delegates sparse normal-equation assembly + Schur elimination
to Ceres' SPARSE_SCHUR backend (include/visnav/map_utils.h:377-383), which
builds block-sparse structures from per-residual parameter-block pointers at
solve time.  On TPU, data-dependent scatter-adds are the bottleneck of that
formulation (measured: ~12 ms of a 15 ms LM iteration at 200 cams / 49k obs
went to XLA scatters).  This module replaces them with *host-precomputed
gather plans*: because the observation graph is fixed for the duration of a
solve, every sparse reduction can be phrased as

    gather payload rows by a precomputed index matrix -> dense partial sums
    over chunks -> one tiny scatter over the number of CHUNKS (thousands)
    instead of observations (hundreds of thousands).

Plans are plain arrays (a pytree), passed to the jitted solver as arguments;
their shapes are bucketed (rounded up) so growing problems re-use compiled
code.

Three plan families:

  * camera-pair chunks: observations sorted by (anchor, target) camera pair;
    each chunk's Gram matrix gives all four camera-camera Hessian blocks as
    one small batched matmul (the MXU does the reduction, not a scatter),
  * landmark / camera chunks: generic chunked segment sums for the scalar
    landmark blocks, gradients, and anchor-merged couplings,
  * entry-pair chunks: the Schur correction  S -= sum_l c_l c_l^T / hpp_l
    is assembled directly in camera-pair space from per-landmark entry pairs
    (anchor entry + one entry per observation), so the dense (K*C, L) H_cp
    matrix is never materialised and the lambda dependence stays analytic:
    S_corr(lam) = S_corr(0) / (1 + lam).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ChunkPlan(NamedTuple):
    """Chunked segment-sum: payload rows gathered by ``gidx`` are summed per
    chunk and scatter-added at ``rows``.  Dummy gathers point at the payload's
    trailing zero row; dummy chunks scatter into a dropped trailing row."""

    gidx: np.ndarray  # (NC, B) int32 into payload rows [0, N]; N = zero row
    rows: np.ndarray  # (NC,) int32 into output rows [0, R]; R = dropped row


class SchurPlan(NamedTuple):
    """Full assembly plan for one BA problem's observation graph."""

    # camera-pair Gram chunks for H_cc
    pg: np.ndarray        # (NCp, Bp) int32 obs ids [0, O]; O = zero Js row
    cc_rows4: np.ndarray  # (NCp, 4) int32 rows into (K*K [+1 dropped], .)
    # landmark segment sums (anchor merge, H_pp, g_p, back-substitution)
    lm: ChunkPlan         # payload rows: obs ids [0, O] -> L rows
    # camera segment sums for g_c
    gc: ChunkPlan         # payload rows: [anchor obs; target obs] [0, 2O] -> K
    # Schur-correction entry pairs (strict upper triangle per landmark)
    pr_e1: np.ndarray     # (NCpr, Bpr) int32 entry ids [0, NE]; NE = zero row
    pr_e2: np.ndarray     # (NCpr, Bpr)
    pr_rows: np.ndarray   # (NCpr,) int32 rows into (K*K [+1 dropped], .)
    # diagonal entry pairs and rhs correction
    dg: ChunkPlan         # payload rows: entry ids [0, NE] -> K*K rows
    ec: ChunkPlan         # payload rows: entry ids [0, NE] -> K rows
    entry_cam: np.ndarray  # (NE,) int32
    entry_lm: np.ndarray   # (NE,) int32


def _round_up(n: int, minimum: int, pow2: bool = True) -> int:
    """Round a chunk count up to a bucketed static shape.

    pow2=True (default): next power of two >= minimum.  Chunk counts change
    with every map update; power-of-two bucketing keeps the jitted solver's
    shapes repeating (a handful of compiles per run instead of one per BA
    call — remote compiles on tunneled TPUs cost 20-40 s each).

    pow2=False: next multiple of ``minimum`` — tighter padding for problems
    whose observation graph is fixed (benchmarks, one-shot solves), where
    the ~1.3-1.7x pow2 padding would cost real throughput."""
    if not pow2:
        return ((n + minimum - 1) // minimum) * minimum if n > 0 else minimum
    b = max(1, minimum)
    while b < n:
        b *= 2
    return b


def _chunk_segments(ids: np.ndarray, B: int):
    """Split a sorted-id contribution list into chunks of <= B entries that
    each touch exactly one output row.  Returns (gather_order (NC, B) with -1
    padding, row_ids (NC,)) — vectorised, no per-element Python loops."""
    N = ids.shape[0]
    if N == 0:
        return np.zeros((0, B), np.int64) - 1, np.zeros((0,), np.int64)
    order = np.argsort(ids, kind="stable")
    sids = ids[order]
    new_seg = np.r_[True, sids[1:] != sids[:-1]]
    seg_id = np.cumsum(new_seg) - 1                     # (N,)
    seg_start = np.flatnonzero(new_seg)                 # (S,)
    pos_in_seg = np.arange(N) - seg_start[seg_id]
    chunk_in_seg = pos_in_seg // B
    slot = pos_in_seg - chunk_in_seg * B
    chunks_per_seg = chunk_in_seg[np.r_[seg_start[1:] - 1, N - 1]] + 1  # (S,)
    chunk_offset = np.r_[0, np.cumsum(chunks_per_seg)[:-1]]
    chunk_id = chunk_offset[seg_id] + chunk_in_seg
    NC = int(chunk_offset[-1] + chunks_per_seg[-1])
    gidx = np.full((NC, B), -1, np.int64)
    gidx[chunk_id, slot] = order
    rows = np.empty(NC, np.int64)
    rows[chunk_id] = sids
    return gidx, rows


def _build_chunk_plan(ids, B, dummy_payload, dummy_row, nc_bucket=256,
                      pow2=True):
    gidx, rows = _chunk_segments(np.asarray(ids), B)
    NC = gidx.shape[0]
    NCb = _round_up(NC, nc_bucket, pow2)
    g = np.full((NCb, B), dummy_payload, np.int64)
    g[:NC] = np.where(gidx >= 0, gidx, dummy_payload)
    r = np.full(NCb, dummy_row, np.int64)
    r[:NC] = rows
    return ChunkPlan(g.astype(np.int32), r.astype(np.int32))


def build_schur_plan(
    anchor_cam,
    target_cam,
    landmark,
    K: int,
    L: int,
    valid=None,
    *,
    pair_chunk: int = 32,
    lm_chunk: int = 8,
    cam_chunk: int = 256,
    entry_pair_chunk: int = 32,
    nc_bucket: int = 64,
    pow2_buckets: bool = True,
    max_entry_pairs: int | None = None,
) -> SchurPlan:
    """Build the assembly plan on the host from the observation graph.

    Invalid (padding) observations are excluded from every plan — their
    payload is zero anyway, and excluding them keeps the entry-pair
    expansion from exploding when padding aliases one landmark index.

    ``max_entry_pairs`` guards against pathological covisibility (a landmark
    observed by very many cameras makes the per-landmark pair expansion
    quadratic); raises ValueError when exceeded so callers can fall back to
    the scatter-based assembly.
    """
    an = np.asarray(anchor_cam, np.int64)
    tn = np.asarray(target_cam, np.int64)
    ln = np.asarray(landmark, np.int64)
    O = an.shape[0]
    if valid is None:
        vmask = np.ones(O, bool)
    else:
        vmask = np.asarray(valid).astype(bool)
    vidx = np.flatnonzero(vmask)

    # ---- camera-pair Gram chunks for H_cc --------------------------------
    pair_ids = an[vidx] * K + tn[vidx]
    gidx, prows = _chunk_segments(pair_ids, pair_chunk)
    # map chunk-local gather slots back to original obs ids
    gidx = np.where(gidx >= 0, vidx[np.clip(gidx, 0, None)], O)
    NCp = gidx.shape[0]
    NCpb = _round_up(NCp, nc_bucket, pow2_buckets)
    pg = np.full((NCpb, pair_chunk), O, np.int64)
    pg[:NCp] = gidx
    pa, pc = prows // K, prows % K
    rows4 = np.stack([pa * K + pa, pa * K + pc, pc * K + pa, pc * K + pc], 1)
    cc_rows4 = np.full((NCpb, 4), K * K, np.int64)
    cc_rows4[:NCp] = rows4

    # ---- landmark chunks (payload = obs rows, valid only) -----------------
    g2, r2 = _chunk_segments(ln[vidx], lm_chunk)
    g2 = np.where(g2 >= 0, vidx[np.clip(g2, 0, None)], O)
    NC2 = g2.shape[0]
    NC2b = _round_up(NC2, nc_bucket, pow2_buckets)
    lg = np.full((NC2b, lm_chunk), O, np.int64)
    lg[:NC2] = g2
    lr = np.full(NC2b, L, np.int64)
    lr[:NC2] = r2
    lm_plan = ChunkPlan(lg.astype(np.int32), lr.astype(np.int32))

    # ---- camera chunks for g_c (payload = [anchor rows; target rows]) ----
    gc_ids = np.concatenate([an[vidx], tn[vidx]])
    gc_src = np.concatenate([vidx, vidx + O])
    g3, r3 = _chunk_segments(gc_ids, cam_chunk)
    g3 = np.where(g3 >= 0, gc_src[np.clip(g3, 0, None)], 2 * O)
    NC3 = g3.shape[0]
    NC3b = _round_up(NC3, nc_bucket, pow2_buckets)
    gg = np.full((NC3b, cam_chunk), 2 * O, np.int64)
    gg[:NC3] = g3
    gr = np.full(NC3b, K, np.int64)
    gr[:NC3] = r3
    gc_plan = ChunkPlan(gg.astype(np.int32), gr.astype(np.int32))

    # ---- entries: L anchors + O targets ----------------------------------
    NE = L + O
    anchor_cam_of_lm = np.zeros(L, np.int64)
    # first valid obs of each landmark defines its anchor camera
    order = np.argsort(ln[vidx], kind="stable")
    lv = ln[vidx][order]
    firsts = np.flatnonzero(np.r_[True, lv[1:] != lv[:-1]])
    anchor_cam_of_lm[lv[firsts]] = an[vidx][order][firsts]
    entry_cam = np.concatenate([anchor_cam_of_lm, tn])
    entry_lm = np.concatenate([np.arange(L), ln])

    # per-landmark entry lists: anchor entry l, then target entries L + obs
    # sorted by landmark.  Sizes m_l = 1 + n_l (valid obs only).
    sorted_obs = vidx[order]                       # obs ids grouped by lm
    lms_present = lv[firsts]
    seg_len = np.r_[firsts[1:], lv.shape[0]] - firsts
    m = seg_len + 1                                # entries per landmark
    n_pairs = m * (m - 1) // 2
    NP = int(n_pairs.sum())
    if max_entry_pairs is not None and NP > max_entry_pairs:
        raise ValueError(
            f"entry-pair expansion too large ({NP} > {max_entry_pairs})"
        )

    # vectorised strict-upper pair expansion grouped by segment size
    pe1_parts, pe2_parts = [], []
    for sz in np.unique(m):
        sel = np.flatnonzero(m == sz)
        if sz < 2:
            continue
        iu, ju = np.triu_indices(int(sz), k=1)
        # entry table per segment: [anchor, targets...]
        ent = np.empty((sel.shape[0], int(sz)), np.int64)
        ent[:, 0] = lms_present[sel]
        starts = firsts[sel]
        offs = np.arange(int(sz) - 1)
        ent[:, 1:] = L + sorted_obs[starts[:, None] + offs[None, :]]
        pe1_parts.append(ent[:, iu].ravel())
        pe2_parts.append(ent[:, ju].ravel())
    if pe1_parts:
        pe1 = np.concatenate(pe1_parts)
        pe2 = np.concatenate(pe2_parts)
    else:
        pe1 = np.zeros(0, np.int64)
        pe2 = np.zeros(0, np.int64)

    pr_ids = entry_cam[pe1] * K + entry_cam[pe2]
    g4, r4 = _chunk_segments(pr_ids, entry_pair_chunk)
    NP_tot = pe1.shape[0]
    pe1_pad = np.r_[pe1, NE]
    pe2_pad = np.r_[pe2, NE]
    g4 = np.where(g4 >= 0, g4, NP_tot)
    NC4 = g4.shape[0]
    NC4b = _round_up(NC4, nc_bucket, pow2_buckets)
    pr_e1 = np.full((NC4b, entry_pair_chunk), NE, np.int64)
    pr_e2 = np.full((NC4b, entry_pair_chunk), NE, np.int64)
    pr_e1[:NC4] = pe1_pad[g4]
    pr_e2[:NC4] = pe2_pad[g4]
    pr_rows = np.full(NC4b, K * K, np.int64)
    pr_rows[:NC4] = r4

    # diagonal entry pairs + rhs correction: over valid entries only
    # (anchor entries of landmarks with no valid obs have zero value anyway)
    dg_plan = _build_chunk_plan(entry_cam * K + entry_cam, cam_chunk,
                                NE, K * K, nc_bucket, pow2_buckets)
    ec_plan = _build_chunk_plan(entry_cam, cam_chunk, NE, K, nc_bucket,
                                pow2_buckets)

    return SchurPlan(
        pg=pg.astype(np.int32),
        cc_rows4=cc_rows4.astype(np.int32),
        lm=lm_plan,
        gc=gc_plan,
        pr_e1=pr_e1.astype(np.int32),
        pr_e2=pr_e2.astype(np.int32),
        pr_rows=pr_rows.astype(np.int32),
        dg=dg_plan,
        ec=ec_plan,
        entry_cam=entry_cam.astype(np.int32),
        entry_lm=entry_lm.astype(np.int32),
    )
