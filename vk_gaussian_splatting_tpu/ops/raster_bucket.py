"""Pallas TPU bucket-neighborhood tile rasterizer (forward).

Companion to ops/bucket_grid.py: instead of blending a pre-sorted pair list
(ops/rasterize_pallas.py), each grid step renders TPT 16x16 tiles
end-to-end. The grid is (mid-cell, step-within-cell): a 64-px mid cell =
4x4 tiles that share their mid/coarse/global window spans exactly (the
shifted pair grids are 16-aligned), so the kernel DMAs those SHARED spans
once per cell (double-buffered across cells) and only the per-tile fine
span per step — the r4 per-tile form spent most of the frame on DMA
issue/wait machinery (~22 starts/step). Per step:

1. DMA the tiles' fine spans (the shared spans already sit in the cell
   staging buffer) from the (bucket, depth)-sorted splat array —
   contiguous slices, 128-aligned by rounding the start down and masking
   the head lanes;
2. build the sort key row: the model's view depth for live lanes, -inf for
   alignment-head lanes (so each span stays one ascending run), +inf for
   tail/pad lanes;
3. EXACT in-VMEM ordering by the key row — a Batcher odd-even MERGE tree
   over the presorted bucket runs (_merge_plan). Any x128 cap qualifies:
   each span decomposes into pow2 chunks (_decompose; 768 = 512+256),
   themselves sorted runs with their own DMAs, so caps can track measured
   occupancy tightly instead of rounding to the next power of two. The
   full bitonic sort remains only as an A/B fallback (VKGS_FORCE_BITONIC).
   Compare-exchange moves full f32 rows (pltpu.roll + select), so
   payloads are bit-exact;
4. front-to-back chunked blend — the same math as the pair kernel (alpha
   closure per response model, log-shift exclusive transmittance scan, MXU
   color contraction, iso-threshold depth/id picks), with early termination
   on transmittance and on exhausted candidates; chunks wholly inside the
   merged -inf head block are skipped.

This trades the P~8-16M-row pair sort (~125 ms at 1080p/1M on v5e) for one
N-row splat sort + an in-kernel merge whose cost scales with the per-tile
candidate count. Replaces the dist+radix-sort+raster chain of the reference
(gaussian_splatting.cpp:1298-1464) one tile at a time.

Cost structure (measured v5e, 1080p/1M): each compare-exchange stage is
VLIW-latency-bound (~125 ns at 16 rows; masks-from-iota beat preloaded
mask constants; an (8, C/128) transposed layout only pays off at 8 rows /
TPT=4 — scripts/bench_sort_stage.py), so the merge tree's stage-count cut
is the sort lever, and blend/DMA dominate the rest. The packed gs2dp
layout (8 rows incl. its exact f32 sort-depth row) runs in an 8-sublane
buffer (half the roll and DMA cost of the 16-row f32 layouts). Output
writes are fire-and-forget (2-slot rotation), and depth/id picks are
skipped once every pixel has resolved.

The backward (bucket_render's custom VJP) re-orders per tile (recording
the merge tree's per-stage exchange masks), runs the pair kernel's
forward-order gradient sweep, restores span layout by replaying the
recorded exchanges in reverse (or, on the bitonic fallback, by
bitonic-un-sorting on a carried lane index), and RMW-accumulates spans
into the global d_attrs; an XLA id-sort + slot reduction then restores
splat order.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vk_gaussian_splatting_tpu.ops.bucket_grid import (
    CLASS_CELL_PX,
    NUM_SPANS,
    BucketBins,
    BucketGridSpec,
)
from vk_gaussian_splatting_tpu.ops.rasterize_pallas import (
    OUT_COLS,
    PIX,
    TILE,
    RasterStatics,
    _alpha_closure,
    _cumprod_exclusive,
    _cumsum_inclusive,
    _tile_pixel_coords,
)
from vk_gaussian_splatting_tpu.ops.response import (
    ATTR_B,
    ATTR_R,
    COLOR_FNS,
    DEPTH_FNS,
    DEPTH_ROW,
    GSP_SORTD,
    GUT_DEPTH,
    ID_HI_ROW,
    ID_ROW,
    NUM_ROWS,
    USES_PIX_CTX,
)

DEAD_KEY = 1e30  # sentinel depth for masked lanes (sorts last, never picked)
TPT = 4          # tiles per grid step (compiled): their merge stages
                 # interleave so the VLIW scheduler fills each chain's
                 # latency bubbles. r5 sweep at blend chunk 384 on the
                 # driver scene: TPT=2 -> 171.1 ms, TPT=4 -> 168.1 ms
                 # (the old TPT=4 register-spill penalty went away with
                 # the per-(tile, chunk) blend regions)
CELL_T = 4       # tiles per mid-cell side: a 64-px mid cell = 4x4 tiles,
                 # which all share the SAME mid/coarse/global window spans
                 # (bucket_grid's shifted pair grids are 16-aligned), so the
                 # kernel grid iterates (cell, step-within-cell) and DMAs
                 # the shared spans ONCE per cell instead of per tile —
                 # the r4 driver frame was dominated by per-step DMA
                 # issue/wait machinery (~39 us/step at 22 starts/step)


def _tpt(st) -> int:
    # interpret mode (CPU tests) gets TPT=1: the interleaved program is 2x
    # the ops for zero benefit off-chip, and the CPU XLA compiler has
    # aborted under the cumulative load of the big interpreted kernels.
    # VKGS_TPT overrides both modes — lets CPU interpret exercise the
    # chip's TPT=2 program (the two paths are otherwise never co-tested).
    import os
    ov = os.environ.get("VKGS_TPT")
    if ov:
        return int(ov)
    return 1 if st.interpret else TPT

# the key row must be exchanged together with the payload, so it lives inside
# the candidate buffer: the exact f32 depth row where the layout has one
# (overwriting dead lanes' depth is harmless — they can never be picked),
# else the zero-pad row 15
KEY_ROW = {"gs2d": 15, "gs2d_clip": 15, "gs2dp": GSP_SORTD, "gut3dp": 15,
           "tri2d": 15, "gut3d": GUT_DEPTH}


def buf_rows(model: str) -> int:
    """Candidate-buffer sublane count: one (8, 128) tile for narrow layouts
    (halves every roll/select/DMA), two tiles otherwise."""
    need = max(NUM_ROWS[model], KEY_ROW[model] + 1)
    return 8 if need <= 8 else 16


def _chunk_bounds(c_sort: int, chunk: int):
    """Static blend-chunk layout [(start, width)]: `chunk`-wide slices with
    a partial (x128) tail, so c_sort need not divide evenly. Fewer, larger
    chunks win on chip — the per-chunk fixed cost (region entry, the tc
    serialization, pick machinery, block-read setup) dominated the blend at
    chunk=256: 219 -> 137 ms kernel time at chunk=768 on the 1080p/1M
    bench scene. Both kernels derive the chunk count from this function so
    the stochastic per-chunk rng streams agree."""
    return [(s, min(chunk, c_sort - s)) for s in range(0, c_sort, chunk)]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _span_sizes(caps: tuple):
    """Per-span capacities: [fine, mid x2, coarse x2, global]."""
    return [caps[0]] + [caps[1]] * 2 + [caps[2]] * 2 + [caps[3]]


def _decompose(size: int):
    """Binary decomposition of a x128 size into descending pow2 chunks
    [(offset_in_span, chunk_size)]. A span of e.g. 768 becomes runs
    512+256: the chunks of one depth-sorted bucket run are themselves
    sorted runs, so the merge tree treats them as independent initial runs
    — non-pow2 caps keep the odd-even merge path instead of falling back
    to the full bitonic (and instead of rounding 543 -> 1024, the round-4
    bench regression: pow2-fitted caps nearly doubled the lane count)."""
    out, off = [], 0
    u = size // 128
    for b in reversed(range(u.bit_length())):
        c = (1 << b) * 128
        if u & (1 << b):
            out.append((off, c))
            off += c
    return out


def _span_runs(caps: tuple):
    """[(span_idx, src_off, size)] pow2 run decomposition of all 6 spans."""
    rr = []
    for i, s in enumerate(_span_sizes(caps)):
        for off, c in _decompose(s):
            rr.append((i, off, c))
    return rr


def _span_offsets(caps: tuple):
    """Static candidate-buffer layout as (runs, buf_offs, c_total).

    runs[j] = (span_idx, src_off_in_span, size) — each a pow2 chunk of one
    span's depth-sorted bucket segment, DMA'd separately from
    HBM[a + src_off : a + src_off + size] (a = the span's 128-aligned
    start). buf_offs[j] is the run's lane offset: the merge plan lays runs
    out largest-first so the binary-counter merge keeps every merge's
    halves adjacent. Caps must be multiples of 128 (HBM slice tiling)."""
    assert all(c % 128 == 0 for c in caps), "bucket caps must be x128"
    runs = _span_runs(caps)
    if _merge_caps_ok(caps):
        order, _stages, c_total = _merge_plan(caps)
        offs = [0] * len(runs)
        o = 0
        for i in order:
            offs[i] = o
            o += runs[i][2]
        return runs, offs, o
    offs, o = [], 0
    for _s, _so, c in runs:
        offs.append(o)
        o += c
    return runs, offs, o


def _tile_spans(spec: BucketGridSpec, bstarts_ref, tt):
    """The 6 (start, len) scalar span descriptors of tile tt's windows:
    [own fine bucket, mid row 0, mid row 1, coarse row 0, coarse row 1,
    global]. Every span is ONE bucket — a single depth-sorted run (mid and
    coarse use the overlapping x-pair buckets of ops/bucket_grid)."""
    tx = jax.lax.rem(tt, spec.tiles_x)
    ty = tt // spec.tiles_x
    s0 = bstarts_ref[tt]
    e0 = bstarts_ref[tt + 1]
    spans = [(s0, jnp.maximum(e0 - s0, 0))]
    for c in (1, 2):
        gp, gy = spec.dims[c]
        cell = CLASS_CELL_PX[c]
        jx = jnp.minimum((tx * TILE) // cell, gp - 1)
        jy = (ty * TILE) // cell
        for dy in (0, 1):
            row = jy + dy
            ok = row < gy
            base = spec.offsets[c] + jnp.minimum(row, gy - 1) * gp
            s = bstarts_ref[base + jx]
            e = jnp.where(ok, bstarts_ref[base + jx + 1], s)
            spans.append((s, jnp.maximum(e - s, 0)))
    s = bstarts_ref[spec.offsets[3]]
    e = bstarts_ref[spec.offsets[3] + 1]
    spans.append((s, jnp.maximum(e - s, 0)))
    return spans


def _merge_caps_ok(caps: tuple) -> bool:
    """True when the OEM merge tree applies — any positive x128 caps: each
    span decomposes into pow2 runs (_span_runs), themselves sorted, so the
    Batcher odd-even MERGE tree always orders the candidate buffer. The
    full-bitonic fallback remains only as an A/B escape hatch
    (VKGS_FORCE_BITONIC=1)."""
    import os
    if os.environ.get("VKGS_FORCE_BITONIC"):
        return False
    return all(c > 0 and c % 128 == 0 for c in caps)


def _merge_plan(caps: tuple):
    """(run_order, stages, c_total) for the general OEM merge tree over the
    pow2 run decomposition (_span_runs).

    Runs are laid out largest-first (binary-counter merging of equal pow2
    regions keeps every merge's halves adjacent); trailing unequal regions
    merge right-to-left, their second halves extending past c_total into
    virtual +inf lanes. stages = [(k, blocks)]; independent merges at the
    same tree level share stages of equal k."""
    runs = _span_runs(caps)
    order = sorted(range(len(runs)), key=lambda i: (-runs[i][2], i))
    offs = {}
    o = 0
    for i in order:
        offs[i] = o
        o += runs[i][2]
    c_total = o

    merges = []              # (base, n, level)
    stack = []               # (base, pow2_len, level) — strictly decreasing
    for i in order:
        stack.append((offs[i], runs[i][2], 0))
        while len(stack) >= 2 and stack[-2][1] == stack[-1][1]:
            _b2, _l2, lev2 = stack.pop()
            b1, l1, lev1 = stack.pop()
            lev = max(lev1, lev2) + 1
            merges.append((b1, l1, lev))
            stack.append((b1, 2 * l1, lev))
    # final unequal-region merges right-to-left (second halves end at the
    # buffer, so their virtual +inf extension is safe)
    while len(stack) >= 2:
        _b2, _l2, lev2 = stack.pop()
        b1, l1, lev1 = stack.pop()
        lev = max(lev1, lev2) + 1
        merges.append((b1, l1, lev))
        stack.append((b1, 2 * l1, lev))

    from collections import defaultdict
    bylevel = defaultdict(list)
    for b, n, lev in merges:
        bylevel[lev].append((b, n))
    stages = []
    for lev in sorted(bylevel):
        blocks = bylevel[lev]
        k = max(n for _b, n in blocks)
        while k >= 1:
            blk = tuple((b, 2 * n) for b, n in blocks if n >= k)
            stages.append((k, blk))
            k //= 2
    return tuple(order), tuple(stages), c_total


def _oem_schedule(caps: tuple):
    return _merge_plan(caps)[1]


def _oem_stage(cand, key_row: int, c_total: int, k: int, blocks: tuple,
               take_out=None):
    """One shared odd-even-merge stage: ascending CE(a, a+k) for lanes
    selected by the classic Batcher participation pattern within each
    (base, two_n) block (halves [b, b+n) and [b+n, b+2n) each sorted).

    Every comparator is ascending, so lanes pairing with virtual partners
    (a + k >= c_total, conceptually +inf) simply keep their value — no
    physical pow2 padding is needed (vrdx pads with 0xffffffff instead,
    upsweep.slang:37). take_out, if given, records the exchange mask row
    (f32 0/1) for the backward's reverse replay."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_total), 1)
    x = cand[:, :]
    up = pltpu.roll(x, c_total - k, axis=1)  # value from lane + k (circular)
    dn = pltpu.roll(x, k, axis=1)            # value from lane - k
    lo = jnp.zeros((1, c_total), jnp.bool_)
    hi = jnp.zeros((1, c_total), jnp.bool_)
    for (b, two_n) in blocks:
        n = two_n // 2
        rel = lane - b
        relh = rel - k
        if k == n:
            lo_b = (rel >= 0) & (rel < n)
            hi_b = (rel >= n) & (rel < two_n)
        else:
            lo_b = ((rel & k) != 0) & (rel >= 0) & (rel + k < two_n)
            hi_b = ((relh & k) != 0) & (relh >= 0) & (relh + k < two_n)
        lo = lo | lo_b
        hi = hi | hi_b
    lo = lo & (lane + k < c_total)  # virtual +inf partner: keep own value
    key_self = x[key_row:key_row + 1, :]
    key_up = up[key_row:key_row + 1, :]
    key_dn = dn[key_row:key_row + 1, :]
    take = (lo & (key_up < key_self)) | (hi & (key_dn > key_self))
    partner = jnp.where(lo, up, dn)
    cand[:, :] = jnp.where(take, partner, x)
    if take_out is not None:
        take_out[:, :] = jnp.where(take, 1.0, 0.0)


def _oem_replay_stage(buf, take_ref, c_total: int, k: int, blocks: tuple):
    """Apply one recorded OEM exchange to buf (the backward's un-sort):
    permutation networks invert by replaying stages in reverse order with
    the same swap set."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_total), 1)
    x = buf[:, :]
    up = pltpu.roll(x, c_total - k, axis=1)
    dn = pltpu.roll(x, k, axis=1)
    lo = jnp.zeros((1, c_total), jnp.bool_)
    for (b, two_n) in blocks:
        n = two_n // 2
        rel = lane - b
        if k == n:
            lo_b = (rel >= 0) & (rel < n)
        else:
            lo_b = ((rel & k) != 0) & (rel >= 0) & (rel + k < two_n)
        lo = lo | lo_b
    take = take_ref[:, :] > 0.5
    partner = jnp.where(lo, up, dn)
    buf[:, :] = jnp.where(take, partner, x)


def _bitonic_stage(cand, key_row: int, c_sort: int, k: int, j: int):
    """One compare-exchange stage: partner = lane ^ j, direction from bit k."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_sort), 1)
    x = cand[:, :]
    up = pltpu.roll(x, c_sort - j, axis=1)  # up[i] = x[i + j] (circular)
    dn = pltpu.roll(x, j, axis=1)           # dn[i] = x[i - j]
    is_lo = (lane & j) == 0
    partner = jnp.where(is_lo, up, dn)
    key_self = x[key_row:key_row + 1, :]
    key_part = partner[key_row:key_row + 1, :]
    asc = (lane & k) == 0
    want_min = is_lo == asc
    # logical ops only: Mosaic cannot lower a bool-select-of-bools
    take = ((want_min & (key_part < key_self))
            | (~want_min & (key_part > key_self)))
    cand[:, :] = jnp.where(take, partner, x)


def _sort_width(caps: tuple) -> int:
    """Candidate-buffer lane count: the exact span total when the OEM merge
    tree applies (virtual +inf lanes replace physical pow2 padding), else
    the bitonic's next power of two."""
    _runs, _offs, c_total = _span_offsets(caps)
    return c_total if _merge_caps_ok(caps) else _next_pow2(c_total)


def _ablate() -> frozenset:
    """Dev-only stage-ablation set for on-chip cost attribution
    (scripts/profile_bucket_split.py): VKGS_ABLATE=dma,assembly,keys,output
    disables the named forward-kernel stages (output becomes garbage).
    Read at kernel-build time — changing it requires a fresh process (the
    pallas_call builders are lru_cached)."""
    import os
    return frozenset(filter(None,
                            os.environ.get("VKGS_ABLATE", "").split(",")))


def _span_lane_tables(caps: tuple, c_sort: int):
    """Per-lane tables (1, c_sort) i32, built from iota in-kernel (Pallas
    forbids captured array constants): the SPAN index owning each lane
    (7 = never-DMA'd pad) and the lane's absolute position within its span
    (run src offset + offset inside the run). Built ONCE per grid step and
    shared by the TPT tiles; the per-tile key masks then need one select
    chain over the 6 spans instead of interval masks over all ~11 runs."""
    runs, offs, _c_total = _span_offsets(caps)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_sort), 1)
    span_lane = jnp.full((1, c_sort), 7, jnp.int32)
    abs_lane = jnp.zeros((1, c_sort), jnp.int32)
    for j, (sp, so, sz) in enumerate(runs):
        in_run = (lane >= offs[j]) & (lane < offs[j] + sz)
        span_lane = jnp.where(in_run, sp, span_lane)
        abs_lane = jnp.where(in_run, lane - (offs[j] - so), abs_lane)
    return span_lane, abs_lane


def _key_masks(tables, heads, neffs):
    """(live, neg) (1, c_sort) bool masks from per-span scalar (head,
    n_eff): live = head <= abs < head + n_eff within the owning span, neg =
    the DMA-alignment head lanes of non-empty spans. Exactly equivalent to
    the per-run interval form (lo/hi clipping is implied by the abs-lane
    coordinates)."""
    span_lane, abs_lane = tables
    head_lane = jnp.zeros(span_lane.shape, jnp.int32)
    neff_lane = jnp.zeros(span_lane.shape, jnp.int32)
    for sp in range(NUM_SPANS):
        head_lane = jnp.where(span_lane == sp, heads[sp], head_lane)
        neff_lane = jnp.where(span_lane == sp, neffs[sp], neff_lane)
    live = (abs_lane >= head_lane) & (abs_lane < head_lane + neff_lane)
    neg = (abs_lane < head_lane) & (neff_lane > 0)
    return live, neg


def _run_split(caps: tuple):
    """Partition the merge-layout runs into (fine, shared) with their
    staging-buffer block offsets: fine runs re-DMA per tile; shared runs
    (mid/coarse/global — identical for all 16 tiles of a mid cell) DMA once
    per cell. Returns (fine_runs, fine_offs, f_total, shared_runs,
    shared_offs, s_total); runs keep their merge-layout index j so assembly
    can place blocks at offs[j]."""
    runs, _offs, _c = _span_offsets(caps)
    fine, shared = [], []
    f_offs, s_offs = {}, {}
    fo = so = 0
    for j, (sp, src, sz) in enumerate(runs):
        if sp == 0:
            fine.append((j, sp, src, sz))
            f_offs[j] = fo
            fo += sz
        else:
            shared.append((j, sp, src, sz))
            s_offs[j] = so
            so += sz
    return fine, f_offs, fo, shared, s_offs, so


def _make_kernel(st: RasterStatics, caps: tuple, spec: BucketGridSpec):
    TPT = _tpt(st)  # noqa: N806 — shadows the module constant deliberately
    abl = _ablate()
    uses_pix = USES_PIX_CTX[st.model]
    key_row = KEY_ROW[st.model]
    drow = DEPTH_ROW[st.model]
    idrow = ID_ROW[st.model]
    idrow_hi = ID_HI_ROW.get(st.model)  # wide-id layouts only
    r_buf = buf_rows(st.model)
    color_fn = COLOR_FNS.get(st.model,
                             lambda blk: blk[ATTR_R:ATTR_B + 1, :])
    depth_fn = DEPTH_FNS.get(st.model, lambda blk: blk[drow:drow + 1, :])
    runs, offs, c_total = _span_offsets(caps)
    ssizes = _span_sizes(caps)
    merge_ok = _merge_caps_ok(caps)
    c_sort = c_total if merge_ok else _next_pow2(c_total)
    bounds = _chunk_bounds(c_sort, st.chunk)
    n_chunks = len(bounds)
    fine_runs, f_offs, f_total, shared_runs, s_offs, s_total = \
        _run_split(caps)
    f_blk, s_blk = f_total // 128, s_total // 128
    spc = (CELL_T * CELL_T) // TPT      # steps per cell
    ccx = -(-spec.tiles_x // CELL_T)
    ccy = -(-spec.tiles_y // CELL_T)
    n_steps = ccx * ccy * spc           # static total step count

    def tile_of(cell, k):
        """Tile id of in-cell tile k; partial cells clamp (duplicate tiles
        recompute identical content — benign, as the old final-step clamp)."""
        cx = jax.lax.rem(cell, ccx)
        cy = cell // ccx
        tx = jnp.minimum(cx * CELL_T + jax.lax.rem(k, CELL_T),
                         spec.tiles_x - 1)
        ty = jnp.minimum(cy * CELL_T + k // CELL_T, spec.tiles_y - 1)
        return ty * spec.tiles_x + tx

    def kernel(seed_ref, bstarts_ref, attrs_ref, *rest):
        if uses_pix:
            (pixctx_ref, out_ref, finebuf, sharedbuf, work, acc, t_col,
             pick_d, pick_id, outbuf2, pixraw, pixscr, fsem, ssem, osem,
             psem) = rest
        else:
            (out_ref, finebuf, sharedbuf, work, acc, t_col, pick_d, pick_id,
             outbuf2, fsem, ssem, osem) = rest
            pixscr = None
        cell = pl.program_id(0)
        sub = pl.program_id(1)
        j = cell * spc + sub            # global step (output rotation etc.)
        slot = jax.lax.rem(j, 2)
        cslot = jax.lax.rem(cell, 2)
        tids = [tile_of(cell, sub * TPT + t) for t in range(TPT)]
        spans_t = [_tile_spans(spec, bstarts_ref, tid) for tid in tids]

        # staging buffers stay FLAT 3D (leading-dim dynamic slices are the
        # canonical Mosaic DMA pattern; 5D slot/tile-indexed forms faulted
        # the TPU worker). attrs is block-tiled (NB, R, 128) so every run
        # is ONE contiguous HBM region.
        def issue_fine(cell_, k, dslot, t, sems):
            tid = tile_of(cell_, k)
            s = bstarts_ref[tid]        # fine bucket id == tile id
            for i, (jr, _sp, src, sz) in enumerate(fine_runs):
                pltpu.make_async_copy(
                    attrs_ref.at[pl.ds(s // 128 + src // 128, sz // 128)],
                    finebuf.at[pl.ds((dslot * TPT + t) * f_blk
                                     + f_offs[jr] // 128, sz // 128)],
                    sems.at[i],
                ).start()

        def issue_shared(cell_, dslot, sems):
            spans = _tile_spans(spec, bstarts_ref, tile_of(cell_, 0))
            for i, (jr, sp, src, sz) in enumerate(shared_runs):
                s = spans[sp][0]
                pltpu.make_async_copy(
                    attrs_ref.at[pl.ds(s // 128 + src // 128, sz // 128)],
                    sharedbuf.at[pl.ds(dslot * s_blk + s_offs[jr] // 128,
                                       sz // 128)],
                    sems.at[i],
                ).start()

        if "dma" not in abl:
            @pl.when(j == 0)
            def _warmup():
                issue_shared(cell, 0, ssem.at[0])
                for t in range(TPT):
                    issue_fine(cell, sub * TPT + t, slot, t,
                               fsem.at[slot, t])

            # fine prefetch: next step's tiles into the other slot pair
            nsub = sub + 1
            ncell = jnp.minimum(cell + jnp.where(nsub == spc, 1, 0),
                                ccx * ccy - 1)
            nsub = jax.lax.rem(nsub, spc)

            @pl.when(j + 1 < n_steps)
            def _prefetch_fine():
                for t in range(TPT):
                    issue_fine(ncell, nsub * TPT + t, 1 - slot, t,
                               fsem.at[1 - slot, t])

            # shared prefetch: next cell's spans during this cell's last
            # step (slot 1-cslot is idle — its last reader was cell-1)
            @pl.when((sub == spc - 1) & (cell + 1 < ccx * ccy))
            def _prefetch_shared():
                issue_shared(cell + 1, 1 - cslot, ssem.at[1 - cslot])

            for t in range(TPT):
                # NB: loop var must NOT be named j — that shadows the
                # program id and silently corrupts every later j-use
                # (reclaim/drain conditions, output indices); on chip the
                # resulting unmatched semaphore waits crashed the TPU
                # worker (interpret-mode semaphores are simulated, so CPU
                # tests could not catch it)
                for i, (_jr, _sp, _src, sz) in enumerate(fine_runs):
                    pltpu.make_async_copy(
                        attrs_ref.at[pl.ds(0, sz // 128)],  # shape-only
                        finebuf.at[pl.ds(0, sz // 128)],
                        fsem.at[slot, t, i],
                    ).wait()

            @pl.when(sub == 0)
            def _wait_shared():
                for i, (_jr, _sp, _src, sz) in enumerate(shared_runs):
                    pltpu.make_async_copy(
                        attrs_ref.at[pl.ds(0, sz // 128)],  # shape-only
                        sharedbuf.at[pl.ds(0, sz // 128)],
                        ssem.at[cslot, i],
                    ).wait()

        if uses_pix:
            pcopies = []
            for t in range(TPT):
                pc = pltpu.make_async_copy(pixctx_ref.at[tids[t]],
                                           pixraw.at[t], psem.at[t])
                pc.start()
                pcopies.append(pc)

        # assemble the flat (r_buf, c_sort) work buffer from the staged
        # blocks (statically-addressed writes; reads use dynamic leading
        # indices into the flat staging arrays)
        for t in range(TPT) if "assembly" not in abl else ():
            fbase = (slot * TPT + t) * f_blk
            for (jr, _sp, _src, sz) in fine_runs:
                for b in range(sz // 128):
                    o = offs[jr] + b * 128
                    work[t, :, o:o + 128] = finebuf[
                        fbase + f_offs[jr] // 128 + b]
            sbase = cslot * s_blk
            for (jr, _sp, _src, sz) in shared_runs:
                for b in range(sz // 128):
                    o = offs[jr] + b * 128
                    work[t, :, o:o + 128] = sharedbuf[
                        sbase + s_offs[jr] // 128 + b]
            if c_total < c_sort:
                # lanes [c_total, c_sort) are never DMA'd: zero them so
                # stale VMEM garbage (NaN/Inf bit patterns) cannot poison
                # the blend through 0*NaN even with alpha masked to 0
                work[t, :, c_total:] = jnp.zeros(
                    (r_buf, c_sort - c_total), jnp.float32)

        # ---- key rows --------------------------------------------------
        # live lanes carry the model depth. Dead lanes: +DEAD_KEY (sorts to
        # the back), EXCEPT the DMA-alignment head lanes of non-empty spans
        # on the merge path, which get -DEAD_KEY so each span stays one
        # ascending run ([-inf..., live asc, +inf...]); they merge to the
        # buffer front and the chunk loop skips over them.
        key_tables = _span_lane_tables(caps, c_sort)
        n_lives = []
        n_heads = []
        for t in range(TPT):
            n_live = jnp.int32(0)
            n_head = jnp.int32(0)
            heads, neffs = [], []
            for i, (s, ln) in enumerate(spans_t[t]):
                head = s - (s // 128) * 128
                n_eff = jnp.minimum(ln, ssizes[i] - head)
                heads.append(head)
                neffs.append(n_eff)
                n_live = n_live + n_eff
                if merge_ok:
                    n_head = n_head + jnp.where(n_eff > 0, head, 0)
            if "keys" not in abl:
                # per-lane span tables turn the old ~9-ops-per-run interval
                # masks into one 6-span select chain (_key_masks)
                live, neg = _key_masks(key_tables, heads, neffs)
                # key_is_row: the key row already rides the attrs (host
                # rank) — only dead lanes get overwritten
                depth_vals = (work[t, key_row:key_row + 1, :]
                              if st.key_is_row
                              else depth_fn(work[t]).reshape(1, c_sort))
                dead = (jnp.where(neg, -DEAD_KEY, DEAD_KEY) if merge_ok
                        else DEAD_KEY)
                work[t, key_row:key_row + 1, :] = jnp.where(live, depth_vals,
                                                            dead)
            n_lives.append(n_live)
            n_heads.append(n_head if merge_ok else jnp.int32(0))

        # ---- exact in-VMEM ordering by depth (full-row compare-exchange) --
        # The TPT tiles' stages interleave: each stage is one serial
        # dependency chain (roll -> compare -> select), so a lone sort is
        # VLIW-latency-bound (~125 ns/stage floor measured); adjacent
        # independent chains let the static scheduler fill the bubbles.
        if "merge" in abl:
            pass
        elif merge_ok:
            # spans are depth-sorted runs (the binning's (bucket, depth)
            # sort), so a ~38-stage odd-even merge tree replaces the full
            # 55+-stage bitonic sort
            for (k, blocks) in _oem_schedule(caps):
                for t in range(TPT):
                    _oem_stage(work.at[t], key_row, c_sort, k, blocks)
        else:
            k = 2
            while k <= c_sort:
                jj = k // 2
                while jj >= 1:
                    for t in range(TPT):
                        _bitonic_stage(work.at[t], key_row, c_sort, k, jj)
                    jj //= 2
                k *= 2

        # ---- front-to-back chunked blend (pair-kernel math), interleaved --
        n_thr = len(st.iso_thresholds) if st.multi_iso else 1
        # unused pick columns start at 0, live ones at 1e30: the per-lane
        # "unpicked" test `pick_d > 1e29` must stay false for columns that
        # can never be picked (only the first n_thr hold live thresholds)
        pick_init = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (PIX, 4), 1) < n_thr,
            1e30, 0.0)
        # pick_id cols: (id_lo, id_hi); unpicked = (-1, 0) reconstructs -1
        pick_id_init = jnp.concatenate(
            [jnp.full((PIX, 1), -1.0, jnp.float32),
             jnp.zeros((PIX, 1), jnp.float32)], axis=1)
        for t in range(TPT) if "blend" not in abl else ():
            acc[t] = jnp.zeros((PIX, 3), jnp.float32)
            t_col[t] = jnp.ones((PIX, 1), jnp.float32)
            pick_d[t] = pick_init
            pick_id[t] = pick_id_init
        pxy = [_tile_pixel_coords(tids[t], st.tiles_x) for t in range(TPT)]
        if uses_pix:
            for t in range(TPT):
                pcopies[t].wait()
                pixscr[t] = jnp.transpose(pixraw[t])

        def blend_chunk(t, ci):
            """One tile-chunk blend with PER-PIXEL transmittance
            termination; runs inside a per-(tile, chunk) pl.when region, so
            commits are unconditional.

            Termination must NOT be a pl.when gate: the max-over-pixels
            reduce in the gate condition crosses from the VPU to the
            scalar core, and that sync costs ~7.5 us per evaluation on
            v5e — measured 150 ms of a 213 ms kernel frame across
            5 chunks x 4080 steps (scripts/profile_bucket_overhead.py:
            the kernel with blend regions compile-time removed runs in
            34 ms, with regions present but runtime-skipped 189 ms).
            Instead each resolved pixel's alpha row is zeroed — one
            (PIX, cw) vector where. A frozen pixel then has q = 1,
            excl = 1: its color, transmittance, and picks are all exact
            no-ops with NO extra masking. This is also the reference's
            semantics — the fragment loop terminates per pixel
            (threedgs_raster.frag.slang under-blend break), whereas the
            old region gate froze the whole tile only once EVERY pixel
            resolved (the region gate and a (1,1)-reduce mask variant
            both crashed or stalled the TPU worker; per-pixel is both
            faster and truer to the reference)."""
            cs, cw = bounds[ci]
            pix = pixscr[t] if uses_pix else None
            px, py = pxy[t]
            block = work[t, :, cs:cs + cw]
            key = block[key_row:key_row + 1, :]
            lane_live = jnp.abs(key) < (DEAD_KEY * 0.5)
            # seed from the CLAMPED tile id (tids[t]): on a final partial
            # step the duplicate tiles then compute identical bytes (their
            # racing same-destination copies stay benign) and the stream
            # matches the backward's seed_ref[0] + tile*n_chunks + ci
            rng_key = (seed_ref[0] + tids[t] * n_chunks + ci
                       if st.stochastic else None)
            alpha_fn = _alpha_closure(st, pix, px, py, 0, cw, rng_key)
            tc = t_col[t]
            alpha = jnp.where(lane_live, alpha_fn(block), 0.0)
            alpha = jnp.where(tc > st.min_transmittance, alpha, 0.0)
            q = 1.0 - alpha
            excl = _cumprod_exclusive(q)
            w = alpha * excl * tc
            cols = color_fn(block)
            acc[t] = acc[t] + jax.lax.dot_general(
                w, cols, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            # depth/id picks: always computed, masked by `unpicked` (the
            # old resolved-skip pl.when paid the same scalar-sync cost as
            # the aliveness gate; ~10 masked vector ops are cheaper)
            t_after = tc * excl * q
            # monotone-crossing selection: t_after is non-increasing
            # along lanes, so "first lane with t_after < thr (and
            # alpha > 0)" == "the unique lane where T crosses thr"
            # (a crossing lane always has alpha > 0: alpha == 0 keeps
            # t_after == prev). Replaces the iota/min/eq argmin — same
            # selected lane bit-for-bit, ~40% fewer (PIX, C) ops.
            prev = jnp.concatenate([tc, t_after[:, :cw - 1]], axis=1)
            thresholds = (st.iso_thresholds if st.multi_iso
                          else (st.depth_iso,))
            depth_row = depth_fn(block).reshape(1, cw)
            for i, thr in enumerate(thresholds):
                sel = (t_after < thr) & (prev >= thr)
                hit = jnp.any(sel, axis=1, keepdims=True)
                d_sel = jnp.sum(jnp.where(sel, depth_row, 0.0),
                                axis=1, keepdims=True)
                unpicked = pick_d[t, :, i:i + 1] > 1e29
                upd = hit & unpicked
                if i == 0 and not st.multi_iso:
                    id_sel = jnp.sum(
                        jnp.where(sel, block[idrow:idrow + 1, :], 0.0),
                        axis=1, keepdims=True)
                    pick_id[t, :, 0:1] = jnp.where(upd, id_sel,
                                                   pick_id[t, :, 0:1])
                    if idrow_hi is not None:
                        hi_sel = jnp.sum(jnp.where(
                            sel, block[idrow_hi:idrow_hi + 1, :], 0.0),
                            axis=1, keepdims=True)
                        pick_id[t, :, 1:2] = jnp.where(upd, hi_sel,
                                                       pick_id[t, :, 1:2])
                pick_d[t, :, i:i + 1] = jnp.where(upd, d_sel,
                                                  pick_d[t, :, i:i + 1])
            t_col[t] = tc * excl[:, cw - 1:cw] * q[:, cw - 1:cw]

        for ci in range(n_chunks) if "blend" not in abl else ():
            # one region PER (tile, chunk), gated by that tile's own
            # scalar window test (n_heads/n_lives from SMEM span
            # descriptors): the old single region per chunk ran BOTH
            # tiles' bodies whenever either needed the chunk, paying the
            # union of the windows (the blend is wide (PIX, cw) math that
            # saturates the VPU on its own, so per-tile regions lose no
            # VLIW interleaving — unlike the 16-row merge stages).
            # Transmittance early-out stays a vector mask inside
            # blend_chunk — see its docstring for the measured reason.
            cs, cw = bounds[ci]
            for t in range(TPT):
                win_t = ((cs < n_heads[t] + n_lives[t])
                         & (cs + cw > n_heads[t]))

                @pl.when(win_t)
                def _(ci=ci, t=t):
                    blend_chunk(t, ci)

        if "output" in abl:
            return

        # fire-and-forget output: rotate two buffer sets, wait before reuse
        @pl.when(j >= 2)
        def _reclaim():
            for t in range(TPT):
                pltpu.make_async_copy(
                    outbuf2.at[slot, t],
                    out_ref.at[jnp.maximum((j - 2) * TPT + t, 0)],
                    osem.at[slot, t]).wait()

        for t in range(TPT):
            pd = jnp.where(pick_d[t] > 1e29, 0.0, pick_d[t])
            if st.multi_iso:
                aux = jnp.transpose(pd)
            else:
                # rows 4-7: depth, id(_lo), id_hi, zero
                aux = jnp.concatenate(
                    [jnp.transpose(pd[:, 0:1]), jnp.transpose(pick_id[t]),
                     jnp.zeros((OUT_COLS - 7, PIX), jnp.float32)], axis=0)
            outbuf2[slot, t] = jnp.concatenate(
                [jnp.transpose(acc[t]), jnp.transpose(t_col[t]), aux],
                axis=0)

            # on the final step with T not a multiple of TPT, the clamped
            # duplicate tiles compute identical content, so concurrent
            # same-destination copies write the same bytes — benign
            pltpu.make_async_copy(outbuf2.at[slot, t],
                                  out_ref.at[tids[t]],
                                  osem.at[slot, t]).start()

        @pl.when(j == n_steps - 1)
        def _drain():
            for t in range(TPT):
                pltpu.make_async_copy(outbuf2.at[slot, t],
                                      out_ref.at[tids[t]],
                                      osem.at[slot, t]).wait()

            @pl.when(n_steps >= 2)
            def _():
                for t in range(TPT):
                    pltpu.make_async_copy(
                        outbuf2.at[1 - slot, t],
                        out_ref.at[jnp.maximum((j - 1) * TPT + t, 0)],
                        osem.at[1 - slot, t]).wait()

    return kernel


@functools.lru_cache(maxsize=64)
def _bucket_call(st: RasterStatics, caps: tuple, n_pad: int):
    spec = BucketGridSpec.build(st.tiles_x, st.tiles_y)
    TPT = _tpt(st)  # noqa: N806
    num_tiles = st.tiles_x * st.tiles_y
    uses_pix = USES_PIX_CTX[st.model]
    r_buf = buf_rows(st.model)
    c_sort = _sort_width(caps)
    _f_runs, _fo, f_total, _s_runs, _so, s_total = _run_split(caps)
    spc = (CELL_T * CELL_T) // TPT
    n_cells = (-(-st.tiles_x // CELL_T)) * (-(-st.tiles_y // CELL_T))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),   # bucket starts
        pl.BlockSpec(memory_space=pltpu.HBM),    # attrs (blocked)
    ]
    scratch = [
        pltpu.VMEM((2 * TPT * (f_total // 128), r_buf, 128),
                   jnp.float32),                           # fine staging
        pltpu.VMEM((2 * (s_total // 128), r_buf, 128),
                   jnp.float32),                           # shared staging
        pltpu.VMEM((TPT, r_buf, c_sort), jnp.float32),     # work
        pltpu.VMEM((TPT, PIX, 3), jnp.float32),            # acc
        pltpu.VMEM((TPT, PIX, 1), jnp.float32),            # t_col
        pltpu.VMEM((TPT, PIX, 4), jnp.float32),            # pick_d
        pltpu.VMEM((TPT, PIX, 2), jnp.float32),            # pick_id (lo,hi)
        pltpu.VMEM((2, TPT, OUT_COLS, PIX), jnp.float32),  # outbuf
    ]
    if uses_pix:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch += [
            pltpu.VMEM((TPT, OUT_COLS, PIX), jnp.float32),  # pixraw
            pltpu.VMEM((TPT, PIX, OUT_COLS), jnp.float32),  # pixscr
            pltpu.SemaphoreType.DMA((2, TPT, len(_f_runs))),
            pltpu.SemaphoreType.DMA((2, len(_s_runs))),
            pltpu.SemaphoreType.DMA((2, TPT)),
            pltpu.SemaphoreType.DMA((TPT,)),
        ]
    else:
        scratch += [
            pltpu.SemaphoreType.DMA((2, TPT, len(_f_runs))),
            pltpu.SemaphoreType.DMA((2, len(_s_runs))),
            pltpu.SemaphoreType.DMA((2, TPT)),
        ]
    return pl.pallas_call(
        _make_kernel(st, caps, spec),
        grid=(n_cells, spc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_COLS, PIX),
                                       jnp.float32),
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # large blend chunks (bucket_chunk=768) push Mosaic's
            # per-kernel stack past the default 16 MB scoped-vmem
            # limit (bwd overflowed it by 40 KB at 1080p); v5e has
            # 128 MB VMEM and our scratch is ~2 MB, so 64 MB is safe
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def _make_bwd_kernel(st: RasterStatics, caps: tuple, spec: BucketGridSpec):
    """Backward: per tile, re-DMA + re-order the candidates, run the pair
    kernel's forward-order gradient sweep into a d buffer, restore d to span
    layout, and RMW-accumulate each span back into the global d_attrs array.

    Grid = (cell, in-cell tile): the 16 tiles of a mid cell share their
    mid/coarse/global spans, so the cell reads them ONCE into a shared
    staging buffer and ACCUMULATES their gradients in VMEM across the
    cell's tiles, RMW-ing d_attrs once per cell (the per-tile form spent
    ~44 DMAs/tile on shared-span RMW round-trips). Fine spans stay
    per-tile. Partial cells gate duplicate tiles off (a duplicate would
    double-count gradients — unlike the forward's benign identical writes).

    The restore step depends on the forward's ordering network: the OEM
    merge path RECORDS each stage's exchange mask and replays the stages in
    reverse on d (a permutation network inverts by reverse replay with the
    same swap set); the bitonic fallback carries the pre-sort lane index in
    the id row and bitonic-sorts d back by it. Neighboring cells' windows
    overlap in source columns (the dy-overlapping pair rows); the
    sequential grid + additive RMW make that safe (dead lanes carry
    zero d)."""
    uses_pix = USES_PIX_CTX[st.model]
    key_row = KEY_ROW[st.model]
    drow = DEPTH_ROW[st.model]
    idrow = ID_ROW[st.model]
    idrow_hi = ID_HI_ROW.get(st.model)
    r_buf = buf_rows(st.model)
    color_rows = (ATTR_R, ATTR_B)
    depth_fn = DEPTH_FNS.get(st.model, lambda blk: blk[drow:drow + 1, :])
    runs, offs, c_total = _span_offsets(caps)
    ssizes = _span_sizes(caps)
    merge_ok = _merge_caps_ok(caps)
    c_sort = c_total if merge_ok else _next_pow2(c_total)
    bounds = _chunk_bounds(c_sort, st.chunk)
    n_chunks = len(bounds)
    fine_runs, f_offs, f_total, shared_runs, s_offs, s_total = \
        _run_split(caps)
    s_blk = s_total // 128
    ccx = -(-spec.tiles_x // CELL_T)
    tiles_per_cell = CELL_T * CELL_T

    def kernel(seed_ref, bstarts_ref, attrs_ref, ctx_hbm_ref, zeros_ref,
               *rest):
        del zeros_ref  # aliased with the d_attrs output
        if merge_ok:
            rest, takes = rest[:-1], rest[-1]  # last scratch: exchange log
        if uses_pix:
            (pixctx_ref, dattrs_ref, work, stage, sstage, dshared, dwork,
             rmw, t_col, s_run, ctx, pixraw, pixscr, sems, ssems, dsem,
             csem, psem) = rest
        else:
            (dattrs_ref, work, stage, sstage, dshared, dwork, rmw, t_col,
             s_run, ctx, sems, ssems, dsem, csem) = rest
            pixscr = None
        cell = pl.program_id(0)
        sub = pl.program_id(1)
        cx = jax.lax.rem(cell, ccx)
        cy = cell // ccx
        tx = cx * CELL_T + jax.lax.rem(sub, CELL_T)
        ty = cy * CELL_T + sub // CELL_T
        real = (tx < spec.tiles_x) & (ty < spec.tiles_y)
        j = (jnp.minimum(ty, spec.tiles_y - 1) * spec.tiles_x
             + jnp.minimum(tx, spec.tiles_x - 1))  # tile id (clamped)
        spans = _tile_spans(spec, bstarts_ref, j)

        @pl.when(sub == 0)
        def _cell_setup():
            # shared spans: one read per cell + zeroed gradient accumulator
            for i, (jr, sp, src, sz) in enumerate(shared_runs):
                s = spans[sp][0]
                pltpu.make_async_copy(
                    attrs_ref.at[pl.ds(s // 128 + src // 128, sz // 128)],
                    sstage.at[pl.ds(s_offs[jr] // 128, sz // 128)],
                    ssems.at[i],
                ).start()
            for b in range(s_blk):
                dshared[b] = jnp.zeros((r_buf, 128), jnp.float32)
            for i, (_jr, _sp, _src, sz) in enumerate(shared_runs):
                pltpu.make_async_copy(
                    attrs_ref.at[pl.ds(0, sz // 128)],  # shape-only
                    sstage.at[pl.ds(0, sz // 128)],
                    ssems.at[i],
                ).wait()

        @pl.when(real)
        def _tile_body():
            for i, (jr, _sp, src, sz) in enumerate(fine_runs):
                s = spans[0][0]
                pltpu.make_async_copy(
                    attrs_ref.at[pl.ds(s // 128 + src // 128, sz // 128)],
                    stage.at[pl.ds(f_offs[jr] // 128, sz // 128)],
                    sems.at[i],
                ).start()
            ccopy = pltpu.make_async_copy(ctx_hbm_ref.at[j], ctx, csem)
            ccopy.start()
            if uses_pix:
                pcopy = pltpu.make_async_copy(pixctx_ref.at[j], pixraw, psem)
                pcopy.start()
            for i, (_jr, _sp, _src, sz) in enumerate(fine_runs):
                pltpu.make_async_copy(
                    attrs_ref.at[pl.ds(0, sz // 128)],
                    stage.at[pl.ds(0, sz // 128)],
                    sems.at[i],
                ).wait()

            for (jr, _sp, _src, sz) in fine_runs:
                for b in range(sz // 128):
                    o = offs[jr] + b * 128
                    work[:, o:o + 128] = stage[f_offs[jr] // 128 + b]
            for (jr, _sp, _src, sz) in shared_runs:
                for b in range(sz // 128):
                    o = offs[jr] + b * 128
                    work[:, o:o + 128] = sstage[s_offs[jr] // 128 + b]
            if c_total < c_sort:
                # never-DMA'd lanes: zero stale VMEM garbage (fwd kernel)
                work[:, c_total:] = jnp.zeros((r_buf, c_sort - c_total),
                                              jnp.float32)
            n_live = jnp.int32(0)
            n_head = jnp.int32(0)
            heads, neffs = [], []
            for i, (s, ln) in enumerate(spans):
                head = s - (s // 128) * 128
                n_eff = jnp.minimum(ln, ssizes[i] - head)
                heads.append(head)
                neffs.append(n_eff)
                n_live = n_live + n_eff
                if merge_ok:
                    n_head = n_head + jnp.where(n_eff > 0, head, 0)
            live, neg = _key_masks(_span_lane_tables(caps, c_sort),
                                   heads, neffs)
            if not merge_ok:
                n_head = jnp.int32(0)
            depth_vals = (work[key_row:key_row + 1, :] if st.key_is_row
                          else depth_fn(work[:, :]).reshape(1, c_sort))
            dead = (jnp.where(neg, -DEAD_KEY, DEAD_KEY) if merge_ok
                    else DEAD_KEY)
            work[key_row:key_row + 1, :] = jnp.where(live, depth_vals, dead)

            if merge_ok:
                # record each stage's exchange mask for the reverse replay
                for si, (k, blocks) in enumerate(_oem_schedule(caps)):
                    _oem_stage(work, key_row, c_sort, k, blocks,
                               take_out=takes.at[si])
            else:
                # the id row's value is not used by the sweep; carry the
                # pre-sort lane index there so d can be un-sorted back
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_sort), 1)
                work[idrow:idrow + 1, :] = lane.astype(jnp.float32)
                k = 2
                while k <= c_sort:
                    jj = k // 2
                    while jj >= 1:
                        _bitonic_stage(work, key_row, c_sort, k, jj)
                        jj //= 2
                    k *= 2

            dwork[:, :] = jnp.zeros((r_buf, c_sort), jnp.float32)
            t_col[:, :] = jnp.ones((PIX, 1), jnp.float32)
            s_run[:, :] = jnp.zeros((PIX, 1), jnp.float32)
            px, py = _tile_pixel_coords(j, st.tiles_x)
            ccopy.wait()
            if uses_pix:
                pcopy.wait()
                pixscr[:, :] = jnp.transpose(pixraw[:, :])
            pix = pixscr[:, :] if uses_pix else None

            for ci in range(n_chunks):
                cs, cw = bounds[ci]

                # gate on the SCALAR window test only; transmittance early-out
                # is the forward's per-pixel alpha freeze, inside alpha_f so
                # the VJP zeroes frozen pixels' gradients too — a max-reduce
                # inside a pl.when condition syncs VPU -> scalar core at
                # ~7.5 us per evaluation (see blend_chunk's docstring)
                @pl.when((cs < n_head + n_live) & (cs + cw > n_head))
                def _(ci=ci, cs=cs, cw=cw):
                    block = work[:, cs:cs + cw]
                    key = block[key_row:key_row + 1, :]
                    lane_live = jnp.abs(key) < (DEAD_KEY * 0.5)
                    rng_key = (seed_ref[0] + j * n_chunks + ci
                               if st.stochastic else None)
                    raw_alpha = _alpha_closure(st, pix, px, py, 0, cw, rng_key)
                    tc = t_col[:, :]
                    px_live = tc > st.min_transmittance

                    def alpha_f(blk):
                        a = jnp.where(lane_live, raw_alpha(blk), 0.0)
                        return jnp.where(px_live, a, 0.0)

                    alpha, alpha_vjp = jax.vjp(alpha_f, block)
                    q = 1.0 - alpha
                    excl = _cumprod_exclusive(q)
                    t_k = excl * tc
                    w = alpha * t_k
                    g_rgb_t = ctx[0:3, :]                          # (3, 256)
                    s_total = jnp.transpose(ctx[3:4, :])
                    gt_tn = jnp.transpose(ctx[4:5, :])
                    r0, r1 = color_rows
                    cols = block[r0:r1 + 1, :]
                    # exact VPU broadcast FMAs (MXU f32 is bf16-grade in-kernel)
                    cg = (jnp.transpose(g_rgb_t[0:1, :]) * cols[0:1, :]
                          + jnp.transpose(g_rgb_t[1:2, :]) * cols[1:2, :]
                          + jnp.transpose(g_rgb_t[2:3, :]) * cols[2:3, :])
                    wcg = w * cg
                    s_incl = s_run[:, :] + _cumsum_inclusive(wcg)
                    suffix = s_total - s_incl
                    qsafe = jnp.maximum(q, 1.0 - st.alpha_clamp)
                    dalpha = t_k * cg - (suffix + gt_tn) / qsafe

                    (d_block,) = alpha_vjp(dalpha)
                    dcol = jnp.concatenate(
                        [jnp.sum(jnp.transpose(g_rgb_t[ch:ch + 1, :]) * w,
                                 axis=0, keepdims=True) for ch in range(3)],
                        axis=0)                                     # (3, C)
                    d_full = jnp.concatenate(
                        [d_block[:r0, :], d_block[r0:r1 + 1, :] + dcol,
                         d_block[r1 + 1:, :]], axis=0)
                    # frozen pixels contribute nothing: their alpha (and hence
                    # w, wcg, d_block rows) is zero via alpha_f, and q = 1,
                    # excl = 1 make the t_col/s_run updates exact no-ops
                    dwork[:, cs:cs + cw] = dwork[:, cs:cs + cw] + d_full

                    t_col[:, :] = tc * excl[:, cw - 1:cw] * q[:, cw - 1:cw]
                    s_run[:, :] = s_run[:, :] + jnp.sum(wcg, axis=1,
                                                        keepdims=True)

            # restore d to span layout (see docstring: reverse replay vs
            # carried-index bitonic)
            if merge_ok:
                sched = _oem_schedule(caps)
                for si in range(len(sched) - 1, -1, -1):
                    k, blocks = sched[si]
                    _oem_replay_stage(dwork, takes.at[si], c_sort, k, blocks)
            else:
                dwork[idrow:idrow + 1, :] = work[idrow:idrow + 1, :]
                k = 2
                while k <= c_sort:
                    jj = k // 2
                    while jj >= 1:
                        _bitonic_stage(dwork, idrow, c_sort, k, jj)
                        jj //= 2
                    k *= 2
            # the sort-key/id rows carry bookkeeping values, not gradients
            dwork[idrow:idrow + 1, :] = jnp.zeros((1, c_sort), jnp.float32)
            if idrow_hi is not None:
                dwork[idrow_hi:idrow_hi + 1, :] = jnp.zeros((1, c_sort),
                                                            jnp.float32)
            dwork[key_row:key_row + 1, :] = jnp.zeros((1, c_sort), jnp.float32)
            if drow < r_buf and drow != key_row:
                # depth cotangents are dropped (aux picks are not differentiated)
                dwork[drow:drow + 1, :] = jnp.zeros((1, c_sort), jnp.float32)

            # fine runs: per-tile additive RMW into the global d_attrs
            # (sequential grid => overlapping 128-aligned windows
            # accumulate correctly; blocked layout => contiguous)
            for (jr, _sp, src, sz) in fine_runs:
                s = spans[0][0]
                blk = s // 128 + src // 128
                nb = sz // 128
                rslice = rmw.at[pl.ds(0, nb)]
                rd = pltpu.make_async_copy(
                    dattrs_ref.at[pl.ds(blk, nb)], rslice, dsem)
                rd.start()
                rd.wait()
                for b in range(nb):
                    rmw[b] = (rmw[b]
                              + dwork[:, offs[jr] + b * 128:
                                      offs[jr] + (b + 1) * 128])
                wr = pltpu.make_async_copy(
                    rslice, dattrs_ref.at[pl.ds(blk, nb)], dsem)
                wr.start()
                wr.wait()
            # shared runs: accumulate in VMEM across the cell's tiles
            # (dead lanes carry zero d, so the cell-level sum is exact)
            for (jr, _sp, _src, sz) in shared_runs:
                for b in range(sz // 128):
                    sb = s_offs[jr] // 128 + b
                    dshared[sb] = (dshared[sb]
                                   + dwork[:, offs[jr] + b * 128:
                                           offs[jr] + (b + 1) * 128])

        # cell-final: ONE RMW of the accumulated shared-span gradients
        # (replaces 16 per-tile read-modify-write round-trips per span)
        @pl.when(sub == tiles_per_cell - 1)
        def _cell_flush():
            for (jr, sp, src, sz) in shared_runs:
                s = spans[sp][0]
                blk = s // 128 + src // 128
                nb = sz // 128
                rslice = rmw.at[pl.ds(0, nb)]
                rd = pltpu.make_async_copy(
                    dattrs_ref.at[pl.ds(blk, nb)], rslice, dsem)
                rd.start()
                rd.wait()
                for b in range(nb):
                    rmw[b] = rmw[b] + dshared[s_offs[jr] // 128 + b]
                wr = pltpu.make_async_copy(
                    rslice, dattrs_ref.at[pl.ds(blk, nb)], dsem)
                wr.start()
                wr.wait()

    return kernel


@functools.lru_cache(maxsize=64)
def _bucket_bwd_call(st: RasterStatics, caps: tuple, n_pad: int):
    spec = BucketGridSpec.build(st.tiles_x, st.tiles_y)
    uses_pix = USES_PIX_CTX[st.model]
    r_buf = buf_rows(st.model)
    runs, _offs, _c_total = _span_offsets(caps)
    run_max = max(sz for _sp, _so, sz in runs)
    merge_ok = _merge_caps_ok(caps)
    c_sort = _sort_width(caps)
    f_runs, _fo, f_total, s_runs, _so2, s_total = _run_split(caps)
    n_cells = (-(-st.tiles_x // CELL_T)) * (-(-st.tiles_y // CELL_T))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),   # bucket starts
        pl.BlockSpec(memory_space=pltpu.HBM),    # attrs
        pl.BlockSpec(memory_space=pltpu.HBM),    # bwd ctx (T, 8, 256)
        pl.BlockSpec(memory_space=pltpu.HBM),    # zeros, aliased to d_attrs
    ]
    scratch = [
        pltpu.VMEM((r_buf, c_sort), jnp.float32),         # work
        pltpu.VMEM((f_total // 128, r_buf, 128), jnp.float32),  # fine stage
        pltpu.VMEM((s_total // 128, r_buf, 128), jnp.float32),  # shared stg
        pltpu.VMEM((s_total // 128, r_buf, 128), jnp.float32),  # d_shared
        pltpu.VMEM((r_buf, c_sort), jnp.float32),         # dwork
        pltpu.VMEM((run_max // 128, r_buf, 128), jnp.float32),  # rmw buffer
        pltpu.VMEM((PIX, 1), jnp.float32),                # t_col
        pltpu.VMEM((PIX, 1), jnp.float32),                # s_run
        pltpu.VMEM((OUT_COLS, PIX), jnp.float32),         # ctx tile
    ]
    if uses_pix:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch += [
            pltpu.VMEM((OUT_COLS, PIX), jnp.float32),     # pixraw
            pltpu.VMEM((PIX, OUT_COLS), jnp.float32),     # pixscr
            pltpu.SemaphoreType.DMA((len(f_runs),)),
            pltpu.SemaphoreType.DMA((len(s_runs),)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        scratch += [
            pltpu.SemaphoreType.DMA((len(f_runs),)),
            pltpu.SemaphoreType.DMA((len(s_runs),)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    if merge_ok:
        # per-stage exchange log for the reverse-replay un-sort; the stage
        # axis leads as an UNTILED dim (Mosaic cannot slice a 2D scratch to
        # one sublane: "slice shape along dimension 0 must be aligned to 8")
        scratch.append(pltpu.VMEM((len(_oem_schedule(caps)), 1, c_sort),
                                  jnp.float32))
    return pl.pallas_call(
        _make_bwd_kernel(st, caps, spec),
        grid=(n_cells, CELL_T * CELL_T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, r_buf, 128),
                                       jnp.float32),
        input_output_aliases={4: 0},
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # large blend chunks (bucket_chunk=768) push Mosaic's
            # per-kernel stack past the default 16 MB scoped-vmem
            # limit (bwd overflowed it by 40 KB at 1080p); v5e has
            # 128 MB VMEM and our scratch is ~2 MB, so 64 MB is safe
            vmem_limit_bytes=64 * 1024 * 1024),
    )


@partial(jax.jit, static_argnames=("st", "caps"))
def rasterize_buckets(bins: BucketBins, pix_ctx, seed,
                      st: RasterStatics, caps: tuple) -> jax.Array:
    """Blend bucketed splats into per-tile (8, 256) outputs.

    bins: BucketBins from ops/bucket_grid.bucket_splats (same tiles_x/y and
    a row count matching buf_rows(st.model)).
    pix_ctx: (T, 8, 256) per-tile pixel context (gut3d/clip) or None.
    seed: (1,) i32 stochastic seed or None.
    Returns (T, 8, 256): rows 0-2 rgb, 3 transmittance, 4-7 aux. Every tile
    is written (empty tiles produce the empty result), so no seg_counts
    masking is needed downstream.
    """
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    assert bins.attrs.shape[1] == buf_rows(st.model), (
        bins.attrs.shape, st.model)
    args = [seed, bins.bucket_starts, bins.attrs]
    if USES_PIX_CTX[st.model]:
        args.append(pix_ctx)
    return _bucket_call(st, caps, bins.attrs.shape[0] * 128)(*args)


def _zero_cotangent(tree):
    import numpy as np

    def z(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jax.tree.map(z, tree)


def _bins_for(proj, attr_rows, depth_override, st, caps):
    from vk_gaussian_splatting_tpu.ops.bucket_grid import _bucket_impl
    spec = BucketGridSpec.build(st.tiles_x, st.tiles_y)
    return _bucket_impl(proj, attr_rows, spec=spec, caps=caps,
                        depth_override=depth_override,
                        pad_rows_to=buf_rows(st.model))


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def bucket_render(proj, attr_rows, depth_override, pix_ctx, seed, statics):
    """Bucket binning + tile kernel with a kernel-level backward.

    statics = (RasterStatics, caps). Returns (tiles_out, num_valid,
    overflow). Gradients flow to attr_rows only (bucket/tile assignment and
    depth ordering are discrete, exactly like the pair path's slot binning —
    ops/binning.py _bin_slots)."""
    st, caps = statics
    bins = _bins_for(proj, attr_rows, depth_override, st, caps)
    out = rasterize_buckets(bins, pix_ctx, seed, st, caps)
    return out, bins.num_valid, bins.overflow


def _br_fwd(proj, attr_rows, depth_override, pix_ctx, seed, statics):
    st, caps = statics
    bins = _bins_for(proj, attr_rows, depth_override, st, caps)
    out = rasterize_buckets(bins, pix_ctx, seed, st, caps)
    return ((out, bins.num_valid, bins.overflow),
            (proj, attr_rows, depth_override, pix_ctx, seed, bins, out))


def _br_bwd(statics, res, g):
    import numpy as np

    st, caps = statics
    proj, attr_rows, depth_override, pix_ctx, seed, bins, out = res
    g_out = g[0]
    idrow = ID_ROW[st.model]
    r, n = attr_rows.shape

    # per-tile backward context from the saved forward output:
    #   S_total = rgb_out . g_rgb ; gt_tn = g_T * T_final
    g_rgb = g_out[:, 0:3, :]
    s_total = jnp.sum(out[:, 0:3, :] * g_rgb, axis=1, keepdims=True)
    gt_tn = g_out[:, 3:4, :] * out[:, 3:4, :]
    pad = jnp.zeros((g_out.shape[0], OUT_COLS - 5, PIX), jnp.float32)
    ctx = jnp.concatenate([g_rgb, s_total, gt_tn, pad], axis=1)

    seed_a = jnp.zeros((1,), jnp.int32) if seed is None else seed
    zeros = jnp.zeros_like(bins.attrs)
    args = [seed_a, bins.bucket_starts, bins.attrs, ctx, zeros]
    if USES_PIX_CTX[st.model]:
        args.append(pix_ctx)
    n_pad = bins.attrs.shape[0] * 128
    d_blocked = _bucket_bwd_call(st, caps, n_pad)(*args)   # (NB, R, 128)
    d_bucket = d_blocked.transpose(1, 0, 2).reshape(-1, n_pad)

    # un-sort to splat order by the id row(s) carried in the sorted attrs.
    # Every splat appears exactly NUM_SLOTS times among the first 4N columns
    # (the fine duplication streams carry the id even in sentinel slots), so
    # sorting by id groups each splat's slot gradients into NUM_SLOTS
    # adjacent columns — a reshape-sum reduces them. Wide-id layouts sort
    # lexicographically by (hi, lo), exact past 2^24; trailing DMA-pad
    # columns get keys behind every real id.
    from vk_gaussian_splatting_tpu.ops.binning import _key_sort
    from vk_gaussian_splatting_tpu.ops.bucket_grid import NUM_SLOTS
    from vk_gaussian_splatting_tpu.ops.response import ID_HI_ROW
    idrow_hi = ID_HI_ROW.get(st.model)
    n4 = NUM_SLOTS * n
    col = jnp.arange(n_pad, dtype=jnp.int32)
    id_flat = bins.attrs[:, idrow, :].reshape(n_pad)
    idkey = jnp.where(col < n4, id_flat.astype(jnp.float32),
                      jnp.float32(1 << 25))
    keys = (idkey,)
    if idrow_hi is not None:
        hi_flat = bins.attrs[:, idrow_hi, :].reshape(n_pad)
        hikey = jnp.where(col < n4, hi_flat.astype(jnp.float32),
                          jnp.float32(1 << 25))
        keys = (hikey, idkey)
    _, unsorted = _key_sort(keys, tuple(d_bucket[i] for i in range(r)))
    d_rows = jnp.stack(unsorted, axis=0)[:, :n4].reshape(
        r, n, NUM_SLOTS).sum(axis=2)

    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    d_depth = (None if depth_override is None
               else jnp.zeros_like(depth_override))
    d_pix = None if pix_ctx is None else jnp.zeros_like(pix_ctx)
    d_seed = None if seed is None else f0(seed_a)
    return (_zero_cotangent(proj), d_rows, d_depth, d_pix, d_seed)


bucket_render.defvjp(_br_fwd, _br_bwd)
