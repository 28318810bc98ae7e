"""Pallas TPU packet-traversal intersection kernels.

The hot loop of the whole framework (reference: ``bvh.cpp:201-222`` +
``triangle.cpp:86-112``), shaped for the TPU vector unit instead of a
pointer-chasing scalar walk:

- rays are stored SoA as (8, TILE) — components in sublanes, rays in lanes —
  so every op is a full-width VPU op
- the scene is a two-level cluster tree (:mod:`lens_flare_tpu.accel.wide`):
  the kernel computes a (B1, TILE) slab-test matrix against the top-level
  boxes once, then for each *hit* top cluster a (B2, TILE) child matrix, and
  only walks triangle chunks whose column has any live lane — whole-tile
  ``@pl.when`` culling, zero per-lane gathers
- Möller-Trumbore runs vectorized over (K, TILE) pairs per active chunk,
  with the winner reduced by a one-hot max instead of a gather
- spheres (<= 64) are tested brute-force per tile after the cluster walk

Three modes (chosen per scene by :class:`PallasScene`):

- **Brute mode** (<= BRUTE_MAX_TRIS real triangles, ANY-HIT queries): no
  tree at all — one statically-unrolled (S, TILE) Möller-Trumbore pass over
  every real triangle.  Tiny-scene shadow queries are bound by the tree
  walk's per-chunk scalar/sequential overhead, not vector math; the brute
  pass is pure straight-line VPU code (measured 0.66 -> 0.18 ms on a 262k
  shadow wavefront of the 138-tri flagship scene, ~1470 Mrays/s).  Coherent
  closest-hit wavefronts keep the culled tree walk, which wins there
  (2.1 vs 3.5 ms primary).
- **VMEM mode** (<= ~256k triangles): the whole cluster tree lives in VMEM
  (~9.4 MB of triangle planes at the (64, 128, 32) shape).
- **HBM-streaming mode** (any size; reference parity with the arbitrary-size
  BVH of ``bvh.cpp:54-177``): triangle planes and child boxes stay in HBM as
  per-top-cluster pages of shape (9K, B2) / (B2, 8); the kernel walks the
  compacted *active* top clusters and double-buffers one page DMA ahead of
  the child walk, so VMEM use is constant (~2 x 0.6 MB) regardless of scene
  size and only pages a ray tile can actually hit ever cross the HBM bus.

The kernels also count triangle/sphere intersection *tests* per lane (the
reference's ``total_isects`` counter, ``bvh.h:136``) so Mrays/s and
isects/ray are measured, not modeled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38  # python float: jnp scalars captured in kernels must not be tracers
# Lanes per tile, measured on v5e with HONEST tunnel timing (tools/timing.py
# k-difference).  Single-level trees (B1 == 1: one box matrix + one
# compaction, then pure chunk math) amortize better at 1024 lanes
# (pyramid: primary 118->135, bounce 100->116, any-hit 295->441 Mrays/s);
# multi-level and HBM-streamed scenes lose at 1024 for closest-hit
# (terrain256 bounce 9.9->8.7, terrain512 primary 17.3->12.4) because the
# per-top-cluster work scales with the wider tile.  The ANY-HIT path is
# dominated by per-tile fixed overhead (~2 us/tile: ray load, output init,
# box matrix, compaction — the chunk loop early-exits), so it wants tiles
# ~2x wider when the tree fits VMEM: pyramid 390->620 Mrays/s at 2048
# (4096 regresses), terrain256 36->39 at 1024 (2048 loses: 30); streamed
# scenes keep 512 (terrain512: 17.1 at 512 vs 14.8 at 1024 — the page DMA
# drain scales with tile count's inverse but the per-top child matrices
# scale with width).  `_auto_tile` picks per scene and mode.
TILE = 512
TILE_SINGLE_LEVEL = 1024
TILE_ANY_HIT_SINGLE_LEVEL = 2048
TILE_ANY_HIT_MULTI_LEVEL = 1024


def _auto_tile(b1: int, stream: bool, any_hit: bool = False, brute: bool = False) -> int:
    if brute:
        # measured on pyramid (138 tris): any-hit peaks at 1024 lanes
        # (1473 Mrays/s; 2048 regresses to 456); closest-hit (tests only —
        # production keeps the tree walk) is width-insensitive
        return TILE_SINGLE_LEVEL
    if any_hit:
        if stream:
            return TILE
        return TILE_ANY_HIT_SINGLE_LEVEL if b1 == 1 else TILE_ANY_HIT_MULTI_LEVEL
    return TILE_SINGLE_LEVEL if (b1 == 1 and not stream) else TILE


# VMEM budget for resident triangle planes; larger scenes stream from HBM
STREAM_THRESHOLD_BYTES = 10 * 2**20
# HBM-streaming page-prefetch ring depth: pages for the next DEPTH-1 active
# tops are in flight while one top's chunks are walked.  MEASURED NEUTRAL
# on v5e (terrain512 bounce 74.1 ms at depth 2 -> 74.5 at depth 4; primary
# 15.2 -> 15.4): the streamed walk is bound by per-chunk vector-issue work,
# not HBM latency.  The ring is kept generic, but the default is the
# measured-best depth-2 double buffer — deeper rings only double the
# streaming VMEM scratch (DEPTH x 9K x B2 floats) for the slight loss above.
_MXU_FAST = False  # experiment knob: bf16 matmul (numerically unusable, speed ceiling only)
STREAM_DEPTH = 2
# Tiny scenes skip the cluster tree entirely: one static (S, TILE)
# Möller-Trumbore pass over every real triangle.  The tree walk's cost on
# such scenes is per-chunk scalar/sequential overhead (roofline in
# docs/PERFORMANCE.md), not vector math — brute force replaces the dynamic
# fori_loop + compaction with pure VPU work and nothing else.
BRUTE_MAX_TRIS = 512
# VMEM budget for triangle planes + shading planes together (in-kernel
# shade accumulation); scenes past it fall back to the finalize_hit gather
SHADE_THRESHOLD_BYTES = 12 * 2**20
# child chunks Möller-Trumbore-tested per traversal iteration (see
# _make_kernel docstring).  None = auto (tools/sweep_chunk_batch.py on v5e):
# single-level trees amortize the child loop well (+27% primary on pyramid
# at CB=2); multi-level scenes activate few children per top, so padding
# waste eats the saving (terrain-class loses 3-20% at CB>=2), and any-hit
# wavefronts measured best at CB=1 everywhere.
CHUNK_BATCH = None


def _auto_chunk_batch(b1: int, any_hit: bool) -> int:
    return 2 if (b1 == 1 and not any_hit) else 1


# tops walked per sequential iteration in the group walk (VMEM multi-level
# trees only; see _make_kernel).  MEASURED REFUTATION (v5e, terrain256,
# 262k-lane wavefronts): TB in {2,4,8} x CB in {1,2,4,8} is neutral-to-worse
# on every wavefront kind (bounce 40.0 -> 43.4-51.8 ms; primary 7.4 -> 7.3-
# 8.7; shadow 5.0 -> 5.3-8.6).  The per-top sequential loop overhead the
# batching amortizes is NOT the binding cost — per-chunk vector-issue work
# (extraction + MT + reductions, ~1-2 us/chunk) is, and that is invariant
# to iteration grouping.  The group-walk path is kept (correctness-tested,
# selectable via top_batch=) for future shapes, but the default stays 1.
TOP_BATCH = 1


def _auto_top_batch(b1: int, stream: bool, brute: bool) -> int:
    if brute or stream or b1 == 1:
        return 1
    return min(TOP_BATCH, b1)


def _safe_inv(d):
    eps = 1e-12
    return 1.0 / jnp.where(d >= 0, jnp.maximum(d, eps), jnp.minimum(d, -eps))


def _box_hits(boxes, o, inv_d, t_lo, t_hi):
    """Slab tests: boxes (B, 8) vs rays (components (1, TILE)). -> (B, TILE) bool."""
    bmin = [boxes[:, i : i + 1] for i in range(3)]  # (B, 1)
    bmax = [boxes[:, 3 + i : 4 + i] for i in range(3)]
    t_min = jnp.full_like(bmin[0] * o[0], -INF)
    t_max = jnp.full_like(t_min, INF)
    for ax in range(3):
        t1 = (bmin[ax] - o[ax]) * inv_d[ax]
        t2 = (bmax[ax] - o[ax]) * inv_d[ax]
        t_min = jnp.maximum(t_min, jnp.minimum(t1, t2))
        t_max = jnp.minimum(t_max, jnp.maximum(t1, t2))
    # (t_lo <= t_hi): a DEAD lane (empty interval, t_hi = 0 from the
    # integrator's RR/miss/NEE masking) whose ORIGIN is inside the box
    # satisfies t_min < 0 <= t_hi and t_max > t_lo — without this term such
    # lanes kept activating every cluster containing their shading point,
    # dragging dead chunks through the Möller-Trumbore walk (measured: the
    # dominant cost of RR-thinned bounce wavefronts)
    return (t_min <= t_max) & (t_max >= t_lo) & (t_min <= t_hi) & (t_lo <= t_hi)


def _compact_flags(flags):
    """(B, 1) 0/1 f32 -> (compacted ids (B, 1) f32, count (1, 1) f32).

    Scalar-free stream compaction: inclusive cumsum and the one-hot
    scatter are both small matmuls, so the only scalar work left in the
    traversal is one loop iteration per *active* cluster (the fori over
    all B clusters with @pl.when bodies was the kernel's bottleneck —
    ~200ns of scalar overhead per cluster per tile, active or not).
    """
    b = flags.shape[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    lower = (col_j <= row_i).astype(jnp.float32)  # (b, b) lower-triangular ones
    pos = jnp.dot(lower, flags, preferred_element_type=jnp.float32)  # (b,1) cumsum
    # transpose pos/flags to row vectors via eye-mult matmul (no vector
    # transpose op needed): row[j] = sum_i ones[0,i] * (c * I)[i,j] = c[j]
    eye = (row_i == col_j).astype(jnp.float32)
    ones_row = jnp.full((1, b), 1.0, jnp.float32)
    pos_row = jnp.dot(ones_row, pos * eye, preferred_element_type=jnp.float32)
    flag_row = jnp.dot(ones_row, flags * eye, preferred_element_type=jnp.float32)
    # onehot[p, i] = 1 iff node i is the p-th active node
    target = row_i.astype(jnp.float32)
    onehot = ((pos_row - 1.0 == target) & (flag_row > 0)).astype(jnp.float32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).astype(jnp.float32)
    compact = jnp.dot(onehot, ids, preferred_element_type=jnp.float32)  # (b, 1)
    count = jnp.sum(flags).reshape(1, 1)
    return compact, count


def _child_boxes_block(child_cm_ref, t_idx, b2):
    """Extract one top cluster's child boxes as (B2, 8) rows.

    Child boxes are stored component-major (8, B_nodes) because a (N, 8)
    VMEM array lane-pads 8 -> 128 (16x waste: 16 MB at 32k nodes).  The
    (B2, 8) row block the slab test wants is recovered with ONE selector
    matmul — sel (128, B2) one-hot picks the aligned block's columns and
    the contraction pattern transposes at the same time; no per-lane
    gather, no Mosaic vector-transpose dependency.
    """
    start = t_idx * b2
    base = pl.multiple_of((start // 128) * 128, 128)
    off = start - base
    blk = child_cm_ref[:, pl.ds(base, 128)]  # (8, 128) component-major
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, b2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, b2), 1)
    sel = (rows == off + cols).astype(jnp.float32)  # (128, B2)
    # out[c, i] = sum_j sel[j, c] * blk[i, j] = blk[i, off + c]
    return jax.lax.dot_general(
        sel, blk, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (B2, 8)


def _make_kernel(
    b1: int,
    b2: int,
    k: int,
    n_spheres: int,
    num_tris: int,
    any_hit: bool = False,
    tile: int = TILE,
    stream: bool = False,
    chunk_batch: int = 1,
    shade: bool = False,
    top_batch: int = 1,
    mxu: bool = False,
):
    """Kernel factory shared by VMEM-resident and HBM-streaming modes.

    VMEM mode refs: child (B1*B2, 8) VMEM, tri (9K, >=128·ceil(B1·B2/128))
    VMEM. Stream mode refs: child (B1, B2, 8) HBM, tri (B1, 9K, B2) HBM,
    DMA'd page-by-page into double-buffered scratch.

    ``chunk_batch`` (CB): child chunks Möller-Trumbore-tested per traversal
    iteration.  The roofline (docs/PERFORMANCE.md) shows the kernel is bound
    by per-chunk scalar/sequential overhead (~0.5-1.5 us/chunk vs ~120 ns of
    vector math), so CB chunks are fused into one (CB*K, TILE) test — the
    scalar loop runs ceil(n_active/CB) times instead of n_active times.

    ``shade``: also accumulate the winning slot's shading row (9 corner-
    normal components + bsdf id) from a second (10K, B_nodes) plane array
    into a (10, TILE) output.  For tables past MAX_ONEHOT_ROWS the XLA row
    gather in finalize_hit costs ~2.7 ms per 262k-lane wavefront (scalar-
    core loop); the kernel already knows the winner as a one-hot (K, TILE)
    mask, so the row select is ten cheap masked reductions on data that is
    in VMEM anyway.  Requires cb == 1 (the only auto choice for the
    >512-tri scenes this targets) and VMEM residency.
    """
    cb = max(1, min(chunk_batch, b2))
    if shade:
        assert cb == 1 and not any_hit
    if mxu:
        # MXU coefficient walk: closest-hit, VMEM, one chunk per iteration
        # (tri_ref carries the (16, B_nodes*128) coefficient planes instead
        # of the 9K geometry rows)
        assert cb == 1 and not any_hit and not stream and not shade and top_batch == 1
    # top batching (tb > 1): walk TB active top clusters per sequential
    # iteration — one fused (TB*B2, TILE) child box matrix, one compaction,
    # and a chunk loop over the UNION of the TB tops' active chunks.
    # VMEM multi-level mode only (the stream path's page DMA is pipelined
    # per top); _launch owns the clamping — see TOP_BATCH for the measured
    # refutation of tb > 1 as a default.
    tb = top_batch
    assert 1 <= tb <= b1 or b1 == 1
    assert tb == 1 or (b1 > 1 and not stream)

    def kernel(*refs):
        if stream and shade:
            (
                rays_ref, top_ref, child_ref, tri_ref, shade_ref, sph_ref,
                out_t_ref, out_prim_ref, out_bary_ref, out_tests_ref,
                out_shade_ref,
                top_ids_ref, top_n_ref, ch_ref, ch_ids_ref, ch_n_ref,
                planes_buf, dma_sems, shade_buf, shade_sems,
            ) = refs
        elif stream:
            (
                rays_ref, top_ref, child_ref, tri_ref, sph_ref,
                out_t_ref, out_prim_ref, out_bary_ref, out_tests_ref,
                top_ids_ref, top_n_ref, ch_ref, ch_ids_ref, ch_n_ref,
                planes_buf, dma_sems,
            ) = refs
        elif shade:
            (
                rays_ref, top_ref, child_ref, tri_ref, shade_ref, sph_ref,
                out_t_ref, out_prim_ref, out_bary_ref, out_tests_ref,
                out_shade_ref,
                top_ids_ref, top_n_ref, ch_ref, ch_ids_ref, ch_n_ref,
            ) = refs
        elif mxu:
            (
                rays_ref, top_ref, child_ref, tri_ref, centers_ref, sph_ref,
                out_t_ref, out_prim_ref, out_bary_ref, out_tests_ref,
                top_ids_ref, top_n_ref, ch_ref, ch_ids_ref, ch_n_ref,
            ) = refs
        else:
            (
                rays_ref, top_ref, child_ref, tri_ref, sph_ref,
                out_t_ref, out_prim_ref, out_bary_ref, out_tests_ref,
                top_ids_ref, top_n_ref, ch_ref, ch_ids_ref, ch_n_ref,
            ) = refs

        rays = rays_ref[:]  # (8, TILE)
        o = [rays[i : i + 1, :] for i in range(3)]  # (1, TILE) each
        d = [rays[3 + i : 4 + i, :] for i in range(3)]
        t_lo = rays[6:7, :]
        t_hi = rays[7:8, :]
        inv_d = [_safe_inv(d[i]) for i in range(3)]

        def mxu_fmat(t_idx):
            """Per-top feature matrix [1 | o-c | d | g=(d x (o-c)) | 0] (16, TILE).

            Built once per walked top with the top's center subtracted from
            the origin (precision: see the PallasScene coefficient builder).
            """
            lane_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, centers_ref.shape[1]), 1
            )
            oneh = (lane_iota == t_idx).astype(jnp.float32)
            c_col = jnp.sum(centers_ref[:] * oneh, axis=1, keepdims=True)  # (8, 1)
            oc = [o[i] - c_col[i : i + 1, :] for i in range(3)]
            g = [
                d[1] * oc[2] - d[2] * oc[1],
                d[2] * oc[0] - d[0] * oc[2],
                d[0] * oc[1] - d[1] * oc[0],
            ]
            return jnp.concatenate(
                [jnp.ones((1, tile), jnp.float32)]
                + oc + d + g
                + [jnp.zeros((6, tile), jnp.float32)],
                axis=0,
            )

        out_t_ref[:] = jnp.full((1, tile), INF, jnp.float32)
        out_prim_ref[:] = jnp.full((1, tile), -1, jnp.int32)
        out_bary_ref[:] = jnp.zeros((2, tile), jnp.float32)
        out_tests_ref[:] = jnp.zeros((1, tile), jnp.int32)
        if shade:
            out_shade_ref[:] = jnp.zeros((10, tile), jnp.float32)

        if b1 > 1:
            top_hits = _box_hits(top_ref[:], o, inv_d, t_lo, t_hi)  # (B1, TILE)
            top_flags = jnp.any(top_hits, axis=1, keepdims=True).astype(jnp.float32)
            top_ids, top_n = _compact_flags(top_flags)
            top_ids_ref[:] = top_ids
            top_n_ref[:] = top_n
            n_top = top_n_ref[0, 0].astype(jnp.int32)
        else:
            n_top = 1

        if stream:
            assert b1 > 1, "streaming requires a top level"

            def page_dma(slot, s_idx):
                t_idx = top_ids_ref[s_idx, 0].astype(jnp.int32)
                return pltpu.make_async_copy(
                    tri_ref.at[t_idx], planes_buf.at[slot], dma_sems.at[slot]
                )

            def shade_dma(slot, s_idx):
                t_idx = top_ids_ref[s_idx, 0].astype(jnp.int32)
                return pltpu.make_async_copy(
                    shade_ref.at[t_idx], shade_buf.at[slot], shade_sems.at[slot]
                )

            def start_page(slot, s_idx):
                page_dma(slot, s_idx).start()
                if shade:
                    shade_dma(slot, s_idx).start()

            # STREAM_DEPTH-deep prefetch ring: page s's DMA issues
            # STREAM_DEPTH-1 tops before its walk needs it
            for _p in range(STREAM_DEPTH - 1):
                @pl.when(_p < n_top)
                def _(p=_p):
                    start_page(p, p)

        def top_body(s_idx, _):
            # single-level trees (B1 == 1) skip the top walk entirely
            t_idx = top_ids_ref[s_idx, 0].astype(jnp.int32) if b1 > 1 else 0
            if stream:
                # prefetch STREAM_DEPTH-1 tops ahead while walking this one
                @pl.when(s_idx + STREAM_DEPTH - 1 < n_top)
                def _():
                    start_page(
                        jax.lax.rem(s_idx + STREAM_DEPTH - 1, STREAM_DEPTH),
                        s_idx + STREAM_DEPTH - 1,
                    )

            # interval clip by what the tile has already resolved — exact:
            # closest-hit shrinks t_hi to the running best t (a box whose
            # entry t exceeds best_t cannot contain a closer hit); any-hit
            # kills already-occluded lanes outright.  Hits found in earlier
            # tops prune later tops' children this way.
            if any_hit:
                t_clip = jnp.where(out_prim_ref[:] >= 0, jnp.float32(0.0), t_hi)
            else:
                t_clip = jnp.minimum(t_hi, out_t_ref[:])

            if b1 > 1 and not stream:
                # re-test this top's own box against the shrunken intervals:
                # a fully pruned top skips its child matrix + compaction +
                # chunk walk entirely (stream mode always walks — its page
                # DMA must be drained anyway)
                row_sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (b1, 1), 0) == t_idx
                ).astype(jnp.float32)
                top_row = jnp.sum(top_ref[:] * row_sel, axis=0, keepdims=True)
                alive = jnp.any(_box_hits(top_row, o, inv_d, t_lo, t_clip))
            else:
                alive = None

            def walk_children():
                self_walk(t_idx, t_clip, s_idx if stream else None)

            if alive is None:
                walk_children()
            else:
                pl.when(alive)(walk_children)
            return s_idx + 1

        def mt_update(ids, lane_mask, masks, comp_j, shade_col=None, mt_vals=None):
            """Fused (CB*K, TILE) Möller-Trumbore test + output updates.

            Shared by the per-top chunk walk and the top-batched group walk:
            ids (CB*K, 1) slot ids, lane_mask (CB*K, TILE) live lanes,
            masks (CB, TILE) per-chunk live rows (tests counter), comp_j(j)
            -> (CB*K, 1) triangle component j, shade_col optional (10K, 1).
            ``mt_vals``: optional precomputed (det, t·det, b1·det, b2·det)
            (K, TILE) quadruple (the MXU coefficient path) — skips the VPU
            cross-product chain.
            """
            if mt_vals is not None:
                det, tt_n, bb1_n, bb2_n = mt_vals
            else:
                p0 = [comp_j(j) for j in range(3)]
                e1 = [comp_j(j) for j in range(3, 6)]
                e2 = [comp_j(j) for j in range(6, 9)]

                # s = o - p0   (K, TILE)
                s = [o[i] - p0[i] for i in range(3)]
                # s1 = d x e2  (K, TILE)
                s1 = [
                    d[1] * e2[2] - d[2] * e2[1],
                    d[2] * e2[0] - d[0] * e2[2],
                    d[0] * e2[1] - d[1] * e2[0],
                ]
                # s2 = s x e1
                s2 = [
                    s[1] * e1[2] - s[2] * e1[1],
                    s[2] * e1[0] - s[0] * e1[2],
                    s[0] * e1[1] - s[1] * e1[0],
                ]
                det = s1[0] * e1[0] + s1[1] * e1[1] + s1[2] * e1[2]
                tt_n = s2[0] * e2[0] + s2[1] * e2[1] + s2[2] * e2[2]
                bb1_n = s1[0] * s[0] + s1[1] * s[1] + s1[2] * s[2]
                bb2_n = s2[0] * d[0] + s2[1] * d[1] + s2[2] * d[2]

            if any_hit:
                # Occlusion-only test: multiply the closest-hit
                # conditions through by sign(det) so the division (the
                # most expensive VPU op in the chunk) and the best-hit
                # min/one-hot reductions disappear — a shadow query only
                # needs "does ANY slot pass".
                sgn = jnp.where(det >= 0, jnp.float32(1.0), jnp.float32(-1.0))
                adet = det * sgn
                tts = tt_n * sgn
                b1s = bb1_n * sgn
                b2s = bb2_n * sgn
                valid = (
                    (adet > 0)
                    & (tts >= t_lo * adet)
                    & (tts <= t_hi * adet)
                    & (b1s >= 0)
                    & (b1s <= adet)
                    & (b2s >= 0)
                    & (b2s <= adet)
                    & (b1s + b2s <= adet)
                    & lane_mask
                )  # (K, TILE)
                occluded = jnp.any(valid, axis=0, keepdims=True)
                out_prim_ref[:] = jnp.where(
                    occluded, jnp.int32(0), out_prim_ref[:]
                )
            else:
                inv_det = 1.0 / jnp.where(det == 0, jnp.float32(1e-30), det)
                tt = tt_n * inv_det
                bb1 = bb1_n * inv_det
                bb2 = bb2_n * inv_det

                best_t = out_t_ref[:]  # (1, TILE)
                limit = jnp.minimum(t_hi, best_t)
                valid = (
                    (det != 0)
                    & (tt >= t_lo)
                    & (tt <= limit)
                    & (bb1 >= 0)
                    & (bb1 <= 1)
                    & (bb2 >= 0)
                    & (bb2 <= 1)
                    & (bb1 + bb2 <= 1)
                    & lane_mask
                )  # (K, TILE)

                t_masked = jnp.where(valid, tt, INF)
                t_best_k = jnp.min(t_masked, axis=0, keepdims=True)  # (1, TILE)
                improved = t_best_k < best_t

                is_best = valid & (t_masked == t_best_k)
                prim_k = jnp.where(is_best, ids, jnp.int32(-1))
                prim_best = jnp.max(prim_k, axis=0, keepdims=True)
                b1_best = jnp.max(
                    jnp.where(is_best, bb1, -INF), axis=0, keepdims=True
                )
                b2_best = jnp.max(
                    jnp.where(is_best, bb2, -INF), axis=0, keepdims=True
                )

                out_t_ref[:] = jnp.where(improved, t_best_k, best_t)
                out_prim_ref[:] = jnp.where(improved, prim_best, out_prim_ref[:])
                cur_bary = out_bary_ref[:]
                new_bary = jnp.concatenate([b1_best, b2_best], axis=0)
                out_bary_ref[:] = jnp.where(improved, new_bary, cur_bary)
                if shade:
                    # one-hot row select of the winner's shading row:
                    # `unique` has exactly one true per improved lane
                    # (is_best can tie on t within a chunk; the prim max
                    # broke the tie, so re-filter by it)
                    unique = (is_best & (ids == prim_best)).astype(jnp.float32)
                    comps = [
                        jnp.sum(
                            shade_col[j * k : (j + 1) * k] * unique,
                            axis=0,
                            keepdims=True,
                        )
                        for j in range(10)
                    ]
                    out_shade_ref[:] = jnp.where(
                        improved,
                        jnp.concatenate(comps, axis=0),
                        out_shade_ref[:],
                    )
            # K triangle tests for every lane in each chunk's live mask
            out_tests_ref[:] = out_tests_ref[:] + jnp.int32(k) * jnp.sum(
                (masks > 0).astype(jnp.int32), axis=0, keepdims=True
            )

        def self_walk(t_idx, t_clip, s_stream_idx):
            child_block = _child_boxes_block(child_ref, t_idx, b2)  # (B2, 8)
            child_hits = _box_hits(child_block, o, inv_d, t_lo, t_clip)  # (B2, TILE)
            ch_ref[:] = child_hits.astype(jnp.float32)
            ch_ids, ch_n = _compact_flags(
                jnp.any(child_hits, axis=1, keepdims=True).astype(jnp.float32)
            )
            ch_ids_ref[:] = ch_ids
            ch_n_ref[:] = ch_n
            n_child = ch_n_ref[0, 0].astype(jnp.int32)

            if mxu:
                fmat = mxu_fmat(t_idx)  # per-top recentered features
            elif stream:
                slot = jax.lax.rem(s_stream_idx, STREAM_DEPTH)
                # waiting here (not before the child slab tests) overlaps the
                # page DMA with the box matrix + compaction work above
                page_dma(slot, s_stream_idx).wait()
                # the page's B2 columns are exactly this top's children
                tri_block = planes_buf[slot]  # (9K, B2)
                n_lanes_blk = b2
                lane_off = 0
                if shade:
                    shade_dma(slot, s_stream_idx).wait()
                    shade_block = shade_buf[slot]  # (10K, B2)
            else:
                # all B2 children of one top cluster live inside ONE
                # 128-aligned lane block (choose_shape keeps b2 | 128), so
                # the plane block loads once per top cluster, not per chunk
                node0 = t_idx * b2
                base = pl.multiple_of((node0 // 128) * 128, 128)
                lane_off = node0 - base
                tri_block = tri_ref[:, pl.ds(base, 128)]  # (9K, 128)
                n_lanes_blk = 128
                if shade:
                    shade_block = shade_ref[:, pl.ds(base, 128)]  # (10K, 128)

            # constant chunk->row-block expander: E[c*K+s, c] = 1.  One
            # (CB*K, CB) x (CB, TILE) matmul turns per-chunk lane masks
            # into the fused (CB*K, TILE) mask (Mosaic rejects sublane
            # concats of rows with differing layout offsets, so masks are
            # expanded by matmul instead of sliced+stacked).
            if cb > 1:
                expand = (
                    jax.lax.broadcasted_iota(jnp.int32, (cb * k, cb), 0) // k
                    == jax.lax.broadcasted_iota(jnp.int32, (cb * k, cb), 1)
                ).astype(jnp.float32)

            def child_body(it, _):
                if mxu:
                    # one 128-aligned lane slice + ONE MXU matmul per chunk:
                    # (16, 128)^T-contracted with (16, TILE) -> (128, TILE)
                    # rows [det | t·det | b1·det | b2·det] x K slots
                    c_idx = ch_ids_ref[jnp.minimum(it, b2 - 1), 0].astype(jnp.int32)
                    node_c = t_idx * b2 + c_idx
                    rows_sel = (
                        jax.lax.broadcasted_iota(jnp.int32, (b2, 1), 0) == c_idx
                    ).astype(jnp.float32)
                    masks = jax.lax.dot_general(
                        rows_sel, ch_ref[:], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, TILE) live-lane row of this chunk
                    ids = node_c * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
                    c_block = tri_ref[
                        :, pl.ds(pl.multiple_of(node_c * 128, 128), 128)
                    ]  # (16, 128)
                    # HIGHEST: default MXU precision is bf16 passes — 4e-3
                    # relative error on t/b flips hit validity at triangle
                    # edges (measured); f32 needs the 3-pass mode
                    outs = jax.lax.dot_general(
                        c_block, fmat, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST if not _MXU_FAST else jax.lax.Precision.DEFAULT,
                    )  # (128, TILE)
                    mt_update(
                        ids, masks > 0, masks, None,
                        mt_vals=(
                            outs[0:k], outs[k : 2 * k],
                            outs[2 * k : 3 * k], outs[3 * k : 4 * k],
                        ),
                    )
                    return 0
                # fuse CB active chunks into one (CB*K, TILE) Möller-Trumbore
                # test; per-chunk scalar work is one compacted-id read + one
                # one-hot column select (each extracted column has sublane
                # offset 0, so the per-component concat is layout-uniform)
                rows_c = jax.lax.broadcasted_iota(jnp.int32, (b2, cb), 0)
                cols_c = jax.lax.broadcasted_iota(jnp.int32, (b2, cb), 1)
                sel_ch = jnp.zeros((b2, cb), jnp.float32)
                ids_parts = []
                col_parts = []
                # NOTE: the plane-column extraction stays a VPU multiply +
                # lane reduction; routing it through the MXU as a skinny
                # (9K, 128) @ (128, 1) dot_general was MEASURED SLOWER
                # (terrain256 bounce 40 -> 46 ms, primary 7.4 -> 8.7 ms) —
                # sub-128-row matmuls pay fixed MXU latency per issue.
                lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_lanes_blk), 1)
                for c in range(cb):
                    cs = it * cb + c
                    in_rng = cs < n_child
                    c_idx = ch_ids_ref[jnp.minimum(cs, b2 - 1), 0].astype(jnp.int32)
                    node_c = t_idx * b2 + c_idx
                    onehot = ((lane_iota == lane_off + c_idx) & in_rng).astype(
                        jnp.float32
                    )
                    col_parts.append(
                        jnp.sum(tri_block * onehot, axis=1, keepdims=True)  # (9K, 1)
                    )
                    if shade:
                        shade_col = jnp.sum(
                            shade_block * onehot, axis=1, keepdims=True
                        )  # (10K, 1)
                    sel_ch += ((rows_c == c_idx) & (cols_c == c) & in_rng).astype(
                        jnp.float32
                    )
                    # slot ids node*K + s; mapped to primitive ids by a
                    # small gather OUTSIDE the kernel (keeps the id table
                    # out of VMEM — it was the budget breaker at 256k tris)
                    ids_parts.append(
                        node_c * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
                    )
                ids = (
                    jnp.concatenate(ids_parts, axis=0) if cb > 1 else ids_parts[0]
                )  # (CB*K, 1)
                # masks[c, :] = live-lane row of chunk c
                masks = jax.lax.dot_general(
                    sel_ch, ch_ref[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (CB, TILE)
                if cb > 1:
                    lane_mask = (
                        jnp.dot(expand, masks, preferred_element_type=jnp.float32) > 0
                    )  # (CB*K, TILE)
                else:
                    lane_mask = masks > 0

                def comp_j(j):
                    if cb == 1:
                        return col_parts[0][j * k : (j + 1) * k]
                    return jnp.concatenate(
                        [col_parts[c][j * k : (j + 1) * k] for c in range(cb)], axis=0
                    )  # (CB*K, 1), every part sublane-offset j*k

                mt_update(
                    ids, lane_mask, masks, comp_j,
                    shade_col=shade_col if shade else None,
                )
                return 0

            jax.lax.fori_loop(0, (n_child + cb - 1) // cb, child_body, 0)

        def group_body(g_idx, _):
            """Top-batched walk: TB active tops per sequential iteration."""
            if any_hit:
                t_clip = jnp.where(out_prim_ref[:] >= 0, jnp.float32(0.0), t_hi)
            else:
                t_clip = jnp.minimum(t_hi, out_t_ref[:])

            # fused child slab tests for the TB tops of this group; rows of
            # out-of-range slots (g*TB+u >= n_top) are masked off
            flags_parts = []
            for u in range(tb):
                s_idx = g_idx * tb + u
                in_rng = s_idx < n_top
                ti = top_ids_ref[jnp.minimum(s_idx, b1 - 1), 0].astype(jnp.int32)
                blk = _child_boxes_block(child_ref, ti, b2)  # (B2, 8)
                hits_u = _box_hits(blk, o, inv_d, t_lo, t_clip) & in_rng
                ch_ref[u * b2 : (u + 1) * b2, :] = hits_u.astype(jnp.float32)
                flags_parts.append(
                    jnp.any(hits_u, axis=1, keepdims=True).astype(jnp.float32)
                )
            flags = (
                jnp.concatenate(flags_parts, axis=0) if tb > 1 else flags_parts[0]
            )  # (TB*B2, 1)
            ch_ids, ch_n = _compact_flags(flags)
            ch_ids_ref[:] = ch_ids
            ch_n_ref[:] = ch_n
            n_child = ch_n_ref[0, 0].astype(jnp.int32)

            if cb > 1:
                expand = (
                    jax.lax.broadcasted_iota(jnp.int32, (cb * k, cb), 0) // k
                    == jax.lax.broadcasted_iota(jnp.int32, (cb * k, cb), 1)
                ).astype(jnp.float32)

            def gchild_body(it, _):
                # CB chunks per iteration, drawn from the group's UNION of
                # active chunks — chunks from different tops batch together,
                # so CB > 1 has no per-top padding waste.  Each chunk's
                # triangle planes come from its own 128-aligned lane block
                # (dynamic ds base; a chunk's node id never straddles one).
                rows_c = jax.lax.broadcasted_iota(jnp.int32, (tb * b2, cb), 0)
                cols_c = jax.lax.broadcasted_iota(jnp.int32, (tb * b2, cb), 1)
                sel_ch = jnp.zeros((tb * b2, cb), jnp.float32)
                ids_parts = []
                col_parts = []
                shade_parts = []
                lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                for c in range(cb):
                    cs = it * cb + c
                    in_rng = cs < n_child
                    c_idx = ch_ids_ref[
                        jnp.minimum(cs, tb * b2 - 1), 0
                    ].astype(jnp.int32)
                    s_c = g_idx * tb + c_idx // b2
                    ti_c = top_ids_ref[jnp.minimum(s_c, b1 - 1), 0].astype(jnp.int32)
                    node_c = ti_c * b2 + jax.lax.rem(c_idx, b2)
                    base_c = pl.multiple_of((node_c // 128) * 128, 128)
                    off_c = node_c - base_c
                    blk = tri_ref[:, pl.ds(base_c, 128)]  # (9K, 128)
                    onehot = ((lane_iota == off_c) & in_rng).astype(jnp.float32)
                    col_parts.append(jnp.sum(blk * onehot, axis=1, keepdims=True))
                    if shade:
                        sblk = shade_ref[:, pl.ds(base_c, 128)]
                        shade_parts.append(
                            jnp.sum(sblk * onehot, axis=1, keepdims=True)
                        )
                    sel_ch += ((rows_c == c_idx) & (cols_c == c) & in_rng).astype(
                        jnp.float32
                    )
                    ids_parts.append(
                        node_c * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
                    )
                ids = (
                    jnp.concatenate(ids_parts, axis=0) if cb > 1 else ids_parts[0]
                )
                masks = jax.lax.dot_general(
                    sel_ch, ch_ref[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (CB, TILE)
                if cb > 1:
                    lane_mask = (
                        jnp.dot(expand, masks, preferred_element_type=jnp.float32) > 0
                    )
                else:
                    lane_mask = masks > 0

                def comp_j(j):
                    if cb == 1:
                        return col_parts[0][j * k : (j + 1) * k]
                    return jnp.concatenate(
                        [col_parts[c][j * k : (j + 1) * k] for c in range(cb)], axis=0
                    )

                mt_update(
                    ids, lane_mask, masks, comp_j,
                    shade_col=shade_parts[0] if shade else None,
                )
                return 0

            jax.lax.fori_loop(0, (n_child + cb - 1) // cb, gchild_body, 0)
            return g_idx + 1

        n_groups = (n_top + tb - 1) // tb if tb > 1 else n_top

        if any_hit:
            # shadow rays: stop once every lane that can still be occluded
            # found an occluder (dead lanes — t_hi <= t_lo, e.g. masked NEE
            # slots and tile padding — count as done, so fully-dead tiles
            # exit before touching a single cluster)
            dead = t_hi <= t_lo  # (1, TILE)

            def top_cond(s_idx):
                return (s_idx < n_groups) & jnp.logical_not(
                    jnp.all((out_prim_ref[:] >= 0) | dead)
                )

            body = group_body if tb > 1 else top_body
            s_exit = jax.lax.while_loop(top_cond, lambda s: body(s, None), 0)
            if stream:
                # early exit leaves up to STREAM_DEPTH-1 page DMAs in
                # flight: drain them so the kernel never ends with a
                # signaled semaphore
                for _j in range(STREAM_DEPTH - 1):
                    @pl.when(s_exit + _j < n_top)
                    def _(j=_j):
                        page_dma(
                            jax.lax.rem(s_exit + j, STREAM_DEPTH), s_exit + j
                        ).wait()
        elif tb > 1:
            jax.lax.fori_loop(0, n_groups, group_body, 0)
        else:
            jax.lax.fori_loop(0, n_top, top_body, 0)

        _sphere_pass(
            sph_ref, o, d, t_lo, t_hi, out_t_ref, out_prim_ref, out_tests_ref,
            n_spheres, b1 * b2 * k,
        )

    return kernel


def _sphere_pass(sph_ref, o, d, t_lo, t_hi, out_t_ref, out_prim_ref, out_tests_ref, n_spheres, base_slot):
    """Brute-force sphere tests after the triangle walk (sphere.cpp:11-111).

    INVARIANT (shade mode): when a sphere improves out_t/out_prim, the
    kernel's out_shade rows still hold the previously-best TRIANGLE's data —
    this pass deliberately does not touch them.  Every consumer of shade_cm
    must therefore mask by ``prim < num_tris`` before reading shade rows
    (finalize_hit does, via its is_tri gate); a consumer that reads shade
    rows for a sphere winner would see stale triangle data.
    """
    sph = sph_ref[:]
    for s_idx in range(n_spheres):
        c = [sph[s_idx, i] for i in range(3)]
        r = sph[s_idx, 3]
        oc = [o[i] - c[i] for i in range(3)]
        a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        bq = 2.0 * (oc[0] * d[0] + oc[1] * d[1] + oc[2] * d[2])
        cq = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2] - r * r
        disc = bq * bq - 4.0 * a * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-bq - sq) / (2.0 * a)
        t2 = (-bq + sq) / (2.0 * a)
        best_t = out_t_ref[:]
        limit = jnp.minimum(t_hi, best_t)
        t1_ok = (t1 >= t_lo) & (t1 <= limit)
        t2_ok = (t2 >= t_lo) & (t2 <= limit)
        ts = jnp.where(t1_ok, t1, t2)
        valid = (disc >= 0) & (t1_ok | t2_ok)
        improved = valid & (ts < best_t)
        out_t_ref[:] = jnp.where(improved, ts, best_t)
        out_prim_ref[:] = jnp.where(
            improved, jnp.int32(base_slot + s_idx), out_prim_ref[:]
        )
    if n_spheres:
        out_tests_ref[:] = out_tests_ref[:] + jnp.int32(n_spheres)


def _make_brute_kernel(s_pad: int, s_real: int, n_spheres: int, any_hit: bool, tile: int):
    """Tiny-scene kernel: ONE static (S, TILE) Möller-Trumbore pass, no tree.

    For scenes of <= BRUTE_MAX_TRIS triangles the cluster walk's dynamic
    fori_loop, box matrices and compaction are pure overhead (the roofline
    shows those scenes bound by per-chunk scalar/sequential work, ~10 us per
    1024-lane tile on a 138-tri scene vs ~2 us of vector math).  Testing
    EVERY real triangle against the tile is more arithmetic but zero
    sequential work: the whole kernel is straight-line VPU code.  Padding
    rows are zero => det == 0 => never hit.
    """

    def kernel(rays_ref, tri_ref, sph_ref, out_t_ref, out_prim_ref, out_bary_ref, out_tests_ref):
        rays = rays_ref[:]  # (8, TILE)
        o = [rays[i : i + 1, :] for i in range(3)]
        d = [rays[3 + i : 4 + i, :] for i in range(3)]
        t_lo = rays[6:7, :]
        t_hi = rays[7:8, :]

        out_t_ref[:] = jnp.full((1, tile), INF, jnp.float32)
        out_prim_ref[:] = jnp.full((1, tile), -1, jnp.int32)
        out_bary_ref[:] = jnp.zeros((2, tile), jnp.float32)
        out_tests_ref[:] = jnp.zeros((1, tile), jnp.int32)

        live = t_hi > t_lo  # (1, TILE); dead lanes = masked NEE slots, padding

        # Static sublane blocks bound the live-temporary footprint: a single
        # (S_pad, TILE) pass keeps ~20 MT intermediates live at once and
        # blows the 16 MB scoped-VMEM stack at S=144, TILE=1024 (measured).
        # The block loop is unrolled at trace time — still straight-line VPU
        # code, zero scalar/sequential work.
        sb = min(s_pad, 64)

        @pl.when(jnp.any(live))
        def _():
            for c0 in range(0, s_pad, sb):
                # explicit partial-block size: the final block of a non-
                # multiple s_pad (e.g. 144 with sb=64) is sb_c < sb rows, and
                # every shape below (tri slice, iota ids) must agree on it
                sb_c = min(sb, s_pad - c0)
                tri = tri_ref[c0 : c0 + sb_c, :]  # (SB_c, 9): [p0 | e1 | e2]
                p0 = [tri[:, i : i + 1] for i in range(3)]  # (SB, 1)
                e1 = [tri[:, 3 + i : 4 + i] for i in range(3)]
                e2 = [tri[:, 6 + i : 7 + i] for i in range(3)]

                s = [o[i] - p0[i] for i in range(3)]  # (SB, TILE)
                s1 = [
                    d[1] * e2[2] - d[2] * e2[1],
                    d[2] * e2[0] - d[0] * e2[2],
                    d[0] * e2[1] - d[1] * e2[0],
                ]
                s2 = [
                    s[1] * e1[2] - s[2] * e1[1],
                    s[2] * e1[0] - s[0] * e1[2],
                    s[0] * e1[1] - s[1] * e1[0],
                ]
                det = s1[0] * e1[0] + s1[1] * e1[1] + s1[2] * e1[2]
                tt_n = s2[0] * e2[0] + s2[1] * e2[1] + s2[2] * e2[2]
                bb1_n = s1[0] * s[0] + s1[1] * s[1] + s1[2] * s[2]
                bb2_n = s2[0] * d[0] + s2[1] * d[1] + s2[2] * d[2]

                if any_hit:
                    sgn = jnp.where(det >= 0, jnp.float32(1.0), jnp.float32(-1.0))
                    adet = det * sgn
                    tts = tt_n * sgn
                    b1s = bb1_n * sgn
                    b2s = bb2_n * sgn
                    valid = (
                        (adet > 0)
                        & (tts >= t_lo * adet)
                        & (tts <= t_hi * adet)
                        & (b1s >= 0)
                        & (b1s <= adet)
                        & (b2s >= 0)
                        & (b2s <= adet)
                        & (b1s + b2s <= adet)
                    )  # (SB, TILE)
                    occluded = jnp.any(valid, axis=0, keepdims=True)
                    out_prim_ref[:] = jnp.where(
                        occluded, jnp.int32(0), out_prim_ref[:]
                    )
                else:
                    inv_det = 1.0 / jnp.where(det == 0, jnp.float32(1e-30), det)
                    tt = tt_n * inv_det
                    bb1 = bb1_n * inv_det
                    bb2 = bb2_n * inv_det
                    best_t = out_t_ref[:]  # (1, TILE)
                    limit = jnp.minimum(t_hi, best_t)
                    valid = (
                        (det != 0)
                        & (tt >= t_lo)
                        & (tt <= limit)
                        & (bb1 >= 0)
                        & (bb1 <= 1)
                        & (bb2 >= 0)
                        & (bb2 <= 1)
                        & (bb1 + bb2 <= 1)
                    )
                    t_masked = jnp.where(valid, tt, INF)
                    t_best_k = jnp.min(t_masked, axis=0, keepdims=True)  # (1, TILE)
                    improved = t_best_k < best_t
                    ids = c0 + jax.lax.broadcasted_iota(jnp.int32, (sb_c, 1), 0)
                    is_best = valid & (t_masked == t_best_k)
                    prim_best = jnp.max(
                        jnp.where(is_best, ids, jnp.int32(-1)), axis=0, keepdims=True
                    )
                    b1_best = jnp.max(
                        jnp.where(is_best, bb1, -INF), axis=0, keepdims=True
                    )
                    b2_best = jnp.max(
                        jnp.where(is_best, bb2, -INF), axis=0, keepdims=True
                    )
                    out_t_ref[:] = jnp.where(improved, t_best_k, best_t)
                    out_prim_ref[:] = jnp.where(improved, prim_best, out_prim_ref[:])
                    out_bary_ref[:] = jnp.where(
                        improved,
                        jnp.concatenate([b1_best, b2_best], axis=0),
                        out_bary_ref[:],
                    )
            # every live lane tests all real triangles (bvh.h:136 parity).
            # COUNTING BASIS differs from the tree kernels: any-hit here
            # charges the full s_real per live lane (there is no early exit
            # to save work), while the tree any-hit kernel early-exits and
            # charges per visited chunk — isects/ray is therefore not
            # comparable across kernel families (see docs/PERFORMANCE.md).
            out_tests_ref[:] = jnp.int32(s_real) * live.astype(jnp.int32)
            _sphere_pass(
                sph_ref, o, d, t_lo, t_hi, out_t_ref, out_prim_ref, out_tests_ref,
                n_spheres, s_pad,
            )

    return kernel


class PallasScene:
    """Device-side packed scene for the Pallas kernel.

    Triangle data is stored component-major as (9*K, B_nodes) "planes":
    row j*K+s, column `node` holds component j of slot s in that node's
    chunk.  This wastes no VMEM to lane padding (lanes = nodes, thousands)
    and a node's component column slices out directly as the (K, 1) vector
    the (K, TILE) intersection math broadcasts — the naive (N, 12) layout
    pads every row to 128 lanes and blows VMEM 10x.

    When the planes exceed the VMEM budget (``STREAM_THRESHOLD_BYTES``) the
    arrays are reshaped to per-top-cluster pages — tri (B1, 9K, B2) and
    child boxes (B1, B2, 8) — that live in HBM and are DMA'd page-by-page
    by the streaming kernel.  ``force_stream`` exists for tests.
    """

    # registered as a pytree (bottom of module) so a PallasScene can ride
    # inside jit-traced bundles; the cluster shape is static aux data

    def __init__(self, wide_bvh, sph_center, sph_radius, num_tris, force_stream=None, force_brute=None, shade_rows=None, interpret=False, mxu=False, stream_shade=False):
        # interpret=True runs the kernels through the Pallas interpreter
        # (CPU tests of code paths that normally only exist on TPU, e.g.
        # the differentiable-render FD checks in tests/test_diff_render.py)
        self.interpret = bool(interpret)
        self.top = jnp.asarray(wide_bvh.top_boxes)
        b1, b2, k = wide_bvh.b1, wide_bvh.b2, wide_bvh.k
        n_nodes = b1 * b2
        planes_bytes = 9 * k * n_nodes * 4
        stream = planes_bytes > STREAM_THRESHOLD_BYTES and b1 > 1
        if force_stream is not None:
            stream = force_stream and b1 > 1
        self.stream = bool(stream)
        brute = (not self.stream) and 0 < num_tris <= BRUTE_MAX_TRIS
        if force_brute is not None:
            brute = bool(force_brute) and not self.stream and num_tris > 0
        self.brute = brute

        n_sph = len(sph_center)
        if self.brute:
            # tiny scene: ALSO pack the real triangle rows (S_pad, 9) =
            # [p0 | e1 | e2], padded to a sublane multiple with zero rows
            # (det == 0 => never hit).  Used by the brute kernel for any-hit
            # queries (where it beats the tree walk ~3x, see _make_brute_
            # kernel); closest-hit keeps the culled tree walk, which wins on
            # coherent wavefronts.
            real = wide_bvh.tri_id >= 0
            rows = np.ascontiguousarray(wide_bvh.tri_soa[real][:, :9], np.float32)
            ids = wide_bvh.tri_id[real].astype(np.int32)
            s_real = rows.shape[0]
            s_pad = (max(s_real, 1) + 7) // 8 * 8
            rows = np.pad(rows, ((0, s_pad - s_real), (0, 0)))
            self.tri_brute = jnp.asarray(rows)
            self.brute_map = jnp.asarray(np.concatenate([
                np.pad(ids, (0, s_pad - s_real)),
                (num_tris + np.arange(max(n_sph, 1))).astype(np.int32),
            ]))
            self.s_pad = int(s_pad)
            self.s_real = int(s_real)
        else:
            self.tri_brute = jnp.zeros((8, 9), jnp.float32)
            self.brute_map = jnp.zeros(9, jnp.int32)
            self.s_pad = 0
            self.s_real = 0

        soa = wide_bvh.tri_soa.reshape(n_nodes, k, 12)
        planes = np.ascontiguousarray(
            soa.transpose(2, 1, 0)[:9].reshape(9 * k, n_nodes)
        )
        if self.stream:
            # per-top HBM pages (B1, 9K, B2); child boxes stay VMEM-resident
            # (B1*B2*32 bytes <= 2 MB) so only one DMA sits on the walk
            pages = np.ascontiguousarray(
                planes.reshape(9 * k, b1, b2).transpose(1, 0, 2)
            )
            self.tri = jnp.asarray(pages)
        else:
            if n_nodes < 128:
                # the kernel reads 128-column aligned blocks; pad node columns
                planes = np.pad(planes, ((0, 0), (0, 128 - n_nodes)))
            self.tri = jnp.asarray(planes)  # (9*K, max(B_nodes, 128))
        # child boxes component-major (8, >=128·ceil(B_nodes/128)): a (N, 8)
        # VMEM array would lane-pad 8 -> 128 and waste 16x the memory
        child_cm = np.ascontiguousarray(wide_bvh.child_boxes[:, :8].T)
        if child_cm.shape[1] % 128:
            child_cm = np.pad(child_cm, ((0, 0), (0, -child_cm.shape[1] % 128)))
        self.child = jnp.asarray(child_cm)
        # slot -> primitive id map, applied outside the kernel; sphere slots
        # appended after the b1*b2*k triangle slots
        n_sph = len(sph_center)
        slot_map = np.concatenate([
            wide_bvh.tri_id.astype(np.int32),
            (num_tris + np.arange(max(n_sph, 1))).astype(np.int32),
        ])
        self.slot_map = jnp.asarray(slot_map)

        # In-kernel shade accumulation: for tables past MAX_ONEHOT_ROWS the
        # finalize_hit row gather is a ~2.7 ms scalar-core loop per 262k
        # lanes; pack the shading rows as (10K, B_nodes) planes (same layout
        # as the triangle planes) and let the kernel select the winner's row
        # with its one-hot best mask.  VMEM-resident, CB == 1 scenes only
        # (exactly the multi-level >512-tri regime the gather hurts).
        shade_bytes = 10 * k * n_nodes * 4
        # stream_shade: HBM-paged shade rows on a second DMA ring.  OPT-IN:
        # it wins on dense incoherent wavefronts (bounce 37.0 -> 32.0 ms
        # per 262k lanes at 524k tris) but LOSES on the real RR-thinned
        # frame mix (terrain-1080p 1.228 -> 1.280 s measured end to end) —
        # sparse wavefronts still pay the doubled page DMA per walked top
        # while the gather they replace scales with live lanes.
        self.shade = bool(
            shade_rows is not None
            and not (b1 == 1)  # single-level scenes use CB=2 + one-hot lookup
            and num_tris > 512
            and (
                (self.stream and stream_shade)
                or (
                    not self.stream
                    and 9 * k * n_nodes * 4 + shade_bytes <= SHADE_THRESHOLD_BYTES
                )
            )
        )
        if self.shade:
            srows = np.zeros((n_nodes * k, 10), np.float32)
            valid = wide_bvh.tri_id >= 0
            srows[valid] = np.asarray(shade_rows, np.float32)[wide_bvh.tri_id[valid]]
            sp = np.ascontiguousarray(
                srows.reshape(n_nodes, k, 10).transpose(2, 1, 0).reshape(10 * k, n_nodes)
            )
            if self.stream:
                # per-top HBM pages (B1, 10K, B2), same layout family as the
                # triangle pages; streamed alongside them so 524k-tri scenes
                # skip the ~2.7 ms/262k-lane finalize_hit row gather too
                self.shade_planes = jnp.asarray(
                    np.ascontiguousarray(
                        sp.reshape(10 * k, b1, b2).transpose(1, 0, 2)
                    )
                )
            else:
                if n_nodes < 128:
                    sp = np.pad(sp, ((0, 0), (0, 128 - n_nodes)))
                self.shade_planes = jnp.asarray(sp)
        else:
            self.shade_planes = jnp.zeros((8, 128), jnp.float32)
        # MXU Möller-Trumbore coefficient planes (VERDICT r4 item 2): with
        # features f(ray) = [1 | o | d | g=d x o] every MT quantity is LINEAR
        # per slot —
        #   det  = d.(e2 x e1)
        #   t·det  = o.n - p0.n              (n = e1 x e2)
        #   b1·det = -g.e2 - d.(e2 x p0)
        #   b2·det =  g.e1 - d.(p0 x e1)
        # so one (16, 128)^T x (16, TILE) MXU product per chunk replaces the
        # VPU cross-product chain.  Layout: (16 feats, B_nodes*128 lanes);
        # node c's lanes [c*128, (c+1)*128) hold columns out_id*K + slot
        # (out order det/t/b1/b2) — a 128-ALIGNED dynamic lane slice, no
        # one-hot extraction.  7x the plane bytes of the 9K geometry rows;
        # VMEM-resident closest-hit only (the A/B experiment's scope).
        self.mxu = bool(mxu) and not self.stream and not self.brute
        if self.mxu:
            soa_r = wide_bvh.tri_soa.reshape(n_nodes, k, 12)
            # Per-TOP recentering: the affine form t·det = o.n - p0.n
            # cancels catastrophically with world-space origins (measured
            # max rel err 0.66 on terrain64 without it); subtracting the
            # top cluster's center from both o (in-kernel, once per top)
            # and p0 (here) restores classic-MT error scale, because a ray
            # that hits a top's triangle has |o - c_top| ~ |o - p0|.
            if b1 > 1:
                tb_ = np.asarray(wide_bvh.top_boxes, np.float64)
                centers = (tb_[:, 0:3] + tb_[:, 3:6]) / 2.0  # (B1, 3)
            else:
                cbx = np.asarray(wide_bvh.child_boxes, np.float64)
                ok = cbx[:, 0] <= cbx[:, 3]
                centers = (
                    (cbx[ok, 0:3].min(axis=0) + cbx[ok, 3:6].max(axis=0)) / 2.0
                    if ok.any()
                    else np.zeros(3)
                )[None]
            cpad = np.zeros((8, max(b1, 128)), np.float32)
            cpad[0:3, :b1] = centers.T
            self.mxu_centers = jnp.asarray(cpad)
            p0 = soa_r[:, :, 0:3].astype(np.float64) - np.repeat(
                centers, b2, axis=0
            )[:, None, :]
            e1 = soa_r[:, :, 3:6].astype(np.float64)
            e2 = soa_r[:, :, 6:9].astype(np.float64)
            n_vec = np.cross(e1, e2)
            C = np.zeros((n_nodes, 4, k, 16), np.float64)
            C[:, 0, :, 4:7] = np.cross(e2, e1)  # det <- d
            C[:, 1, :, 0] = -np.einsum("nkc,nkc->nk", p0, n_vec)  # t const
            C[:, 1, :, 1:4] = n_vec  # t <- o
            C[:, 2, :, 4:7] = -np.cross(e2, p0)  # b1 <- d
            C[:, 2, :, 7:10] = -e2  # b1 <- g
            C[:, 3, :, 4:7] = -np.cross(p0, e1)  # b2 <- d
            C[:, 3, :, 7:10] = e1  # b2 <- g
            # (n_nodes, 4, k, 16) -> (16, n_nodes * 128): lane = node*128 +
            # out*k + slot, sublane = feature
            self.mxu_planes = jnp.asarray(
                np.ascontiguousarray(
                    C.transpose(3, 0, 1, 2).reshape(16, n_nodes * 4 * k)
                ),
                jnp.float32,
            )
            assert 4 * k == 128, "mxu mode assumes K = 32 (4 outputs x K = 128 lanes)"
        else:
            self.mxu_planes = jnp.zeros((8, 128), jnp.float32)
            self.mxu_centers = jnp.zeros((8, 128), jnp.float32)
        self._finish_init(wide_bvh, sph_center, sph_radius, num_tris)

    def _finish_init(self, wide_bvh, sph_center, sph_radius, num_tris):
        self.b1 = wide_bvh.b1
        self.b2 = wide_bvh.b2
        self.k = wide_bvh.k
        self.num_tris = int(num_tris)
        n_sph = len(sph_center)
        sph = np.zeros((max(n_sph, 1), 8), np.float32)
        if n_sph:
            sph[:n_sph, 0:3] = sph_center
            sph[:n_sph, 3] = sph_radius
        self.sph = jnp.asarray(sph)
        self.n_spheres = n_sph


def _pscene_flatten(ps):
    children = (
        ps.top, ps.child, ps.tri, ps.sph, ps.slot_map, ps.tri_brute,
        ps.brute_map, ps.shade_planes, ps.mxu_planes, ps.mxu_centers,
    )
    aux = (
        ps.b1, ps.b2, ps.k, ps.num_tris, ps.n_spheres, ps.stream,
        ps.brute, ps.s_pad, ps.s_real, ps.shade, ps.interpret, ps.mxu,
    )
    return children, aux


def _pscene_unflatten(aux, children):
    ps = object.__new__(PallasScene)
    (
        ps.top, ps.child, ps.tri, ps.sph, ps.slot_map, ps.tri_brute,
        ps.brute_map, ps.shade_planes, ps.mxu_planes, ps.mxu_centers,
    ) = children
    (
        ps.b1, ps.b2, ps.k, ps.num_tris, ps.n_spheres, ps.stream,
        ps.brute, ps.s_pad, ps.s_real, ps.shade, ps.interpret, ps.mxu,
    ) = aux
    return ps


jax.tree_util.register_pytree_node(PallasScene, _pscene_flatten, _pscene_unflatten)


@partial(
    jax.jit,
    static_argnames=(
        "b1", "b2", "k", "n_spheres", "num_tris", "interpret", "any_hit", "tile",
        "stream", "chunk_batch", "brute", "s_pad", "s_real", "shade", "top_batch",
        "mxu",
    ),
)
def _launch(
    rays, top, child, tri, sph,
    b1, b2, k, n_spheres, num_tris,
    interpret=False, any_hit=False, tile=TILE, stream=False, chunk_batch=None,
    brute=False, s_pad=0, s_real=0, shade=False, shade_arr=None, top_batch=None,
    mxu=False, mxu_centers=None,
):
    n_tiles = rays.shape[1] // tile
    n = rays.shape[1]
    if brute:
        kernel = _make_brute_kernel(s_pad, s_real, n_spheres, any_hit, tile)
        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((sph.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=[
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
                jax.ShapeDtypeStruct((2, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
            ],
        )(rays, tri, sph)
    if chunk_batch is None:
        chunk_batch = CHUNK_BATCH
    if chunk_batch is None:
        chunk_batch = _auto_chunk_batch(b1, any_hit)
    if shade:
        chunk_batch = 1  # the shade row select assumes one chunk per iter
    if mxu:
        chunk_batch = 1
        top_batch = 1
    if not stream:
        assert 128 % b2 == 0, "VMEM mode assumes b2 | 128 (one block per top cluster)"
    if top_batch is None:
        top_batch = _auto_top_batch(b1, stream, brute)
    tb = max(1, min(top_batch, b1)) if (b1 > 1 and not stream) else 1
    kernel = _make_kernel(
        b1, b2, k, n_spheres, num_tris, any_hit=any_hit, tile=tile, stream=stream,
        chunk_batch=chunk_batch, shade=shade, top_batch=tb, mxu=mxu,
    )
    child_spec = pl.BlockSpec(child.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    if stream:
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)  # (B1, 9K, B2) HBM
        extra_scratch = [
            # tri-plane page prefetch ring (STREAM_DEPTH-deep)
            pltpu.VMEM((STREAM_DEPTH, 9 * k, b2), jnp.float32),
            pltpu.SemaphoreType.DMA((STREAM_DEPTH,)),
        ]
        if shade:
            # shade-row pages (B1, 10K, B2) ride their own DMA ring
            extra_scratch += [
                pltpu.VMEM((STREAM_DEPTH, 10 * k, b2), jnp.float32),
                pltpu.SemaphoreType.DMA((STREAM_DEPTH,)),
            ]
    else:
        tri_spec = pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        extra_scratch = []
    in_specs = [
        pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((top.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        child_spec,
        tri_spec,
        pl.BlockSpec((sph.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    n = rays.shape[1]
    out_shape = [
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
        jax.ShapeDtypeStruct((2, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
    ]
    inputs = [rays, top, child, tri, sph]
    if mxu:
        # per-top recentering table rides after the coefficient planes
        in_specs.insert(4, pl.BlockSpec(
            mxu_centers.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        ))
        inputs.insert(4, mxu_centers)
    if shade:
        # shade planes ride after tri; winner rows come back as (10, N)
        in_specs.insert(4, (
            pl.BlockSpec(memory_space=pl.ANY)  # HBM pages, DMA'd per top
            if stream
            else pl.BlockSpec(
                shade_arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ))
        inputs.insert(4, shade_arr)
        out_specs.append(
            pl.BlockSpec((10, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((10, n), jnp.float32))
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((b1, 1), jnp.float32),  # top_ids
            pltpu.VMEM((1, 1), jnp.float32),  # top_n
            pltpu.VMEM((tb * b2, tile), jnp.float32),  # ch lane masks (TB tops)
            pltpu.VMEM((tb * b2, 1), jnp.float32),  # ch_ids
            pltpu.VMEM((1, 1), jnp.float32),  # ch_n
        ]
        + extra_scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=out_shape,
    )(*inputs)
    if shade:
        out_t, out_prim, out_bary, out_tests, out_shade = outs
        return out_t, out_prim, out_bary, out_tests, out_shade
    out_t, out_prim, out_bary, out_tests = outs
    return out_t, out_prim, out_bary, out_tests


def intersect_pallas(pscene: PallasScene, o, d, t_lo, t_hi, interpret=False, any_hit=False, tile=None, chunk_batch=None, brute=None, return_shade=False, top_batch=None, mxu=False):
    """Closest-hit for (N, 3) rays. Returns (t, prim, b1, b2, hit, tests).

    N is padded internally to a tile multiple (``tile=None`` picks the
    measured-best width per scene shape, see ``_auto_tile``).  ``tests`` is
    the per-ray count of primitive intersection tests (bvh.h:136 parity).

    ``brute=None`` auto-selects the no-tree brute kernel for ANY-HIT
    queries on tiny scenes (measured ~3x the tree walk; coherent
    closest-hit stays on the culled tree, which wins there).  Pass
    True/False to force either kernel (tests).

    ``return_shade`` (requires ``pscene.shade``, closest-hit only): append
    the winner's shading row, component-major (10, N) [9 corner-normal
    comps | bsdf id], accumulated in-kernel — replaces the finalize_hit
    row gather for large tables.
    """
    if brute is None:
        brute = pscene.brute and any_hit
    else:
        brute = bool(brute) and pscene.brute
    shade = bool(return_shade) and pscene.shade and not any_hit and not brute
    if return_shade and not shade:
        raise ValueError("return_shade requires pscene.shade and closest-hit")
    if mxu:
        if not (pscene.mxu and not any_hit and not brute and not shade):
            raise ValueError("mxu requires PallasScene(mxu=True) and plain closest-hit")
    if tile is None:
        tile = _auto_tile(pscene.b1, pscene.stream, any_hit, brute)
    n = o.shape[0]
    pad = (-n) % tile
    rays = jnp.concatenate(
        [o.T, d.T, t_lo[None, :], t_hi[None, :]], axis=0
    )  # (8, N)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
    outs = _launch(
        rays,
        pscene.top,
        pscene.child,
        pscene.mxu_planes if mxu else (pscene.tri_brute if brute else pscene.tri),
        pscene.sph,
        b1=pscene.b1,
        b2=pscene.b2,
        k=pscene.k,
        n_spheres=pscene.n_spheres,
        num_tris=pscene.num_tris,
        interpret=interpret,
        any_hit=any_hit,
        tile=tile,
        stream=pscene.stream,
        chunk_batch=chunk_batch,
        brute=brute,
        s_pad=pscene.s_pad,
        s_real=pscene.s_real,
        shade=shade,
        shade_arr=pscene.shade_planes if shade else None,
        top_batch=top_batch,
        mxu=mxu,
        mxu_centers=pscene.mxu_centers if mxu else None,
    )
    if shade:
        out_t, out_prim, out_bary, out_tests, out_shade = outs
    else:
        out_t, out_prim, out_bary, out_tests = outs
    t = out_t[0, :n]
    slot = out_prim[0, :n]
    hit = slot >= 0
    if any_hit:
        # occlusion-only: the kernel writes slot 0 as a "hit" marker, which
        # slot_map would map to a real (arbitrary) primitive id — return the
        # -1 sentinel instead so only `hit` is meaningful (t stays INF,
        # bary stays 0)
        prim = jnp.full_like(slot, -1)
    else:
        smap = pscene.brute_map if brute else pscene.slot_map
        prim = jnp.where(hit, smap[jnp.maximum(slot, 0)], -1)
    b1v = out_bary[0, :n]
    b2v = out_bary[1, :n]
    if shade:
        return t, prim, b1v, b2v, hit, out_tests[0, :n], out_shade[:, :n]
    return t, prim, b1v, b2v, hit, out_tests[0, :n]
