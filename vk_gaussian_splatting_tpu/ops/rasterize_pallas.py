"""Pallas TPU tile blender — forward + custom-VJP backward, generic over
response models (2D conic splats for 3DGS, exact 3D ray response for 3DGUT).

TPU-native replacement for the reference's raster pipelines (mesh shaders S3/S7
+ fragment blends S5, threedgs_raster.* / threedgut_raster.*). Where the GPU
rasterizes oriented quads with per-fragment interlocked blending, the TPU
kernel blends each 16x16 tile's depth-sorted splat list front-to-back in
chunks of C splats.

Design notes (all shaped by Mosaic/TPU semantics):

- **The grid iterates over chunks, not tiles.** Dynamic-trip-count loops
  (lax.while_loop / dynamic fori) deadlock the axon TPU runtime, and a static
  per-tile bound would be O(T * P). Instead the host precomputes a flat chunk
  schedule — chunk j belongs to tile ``chunk_tile[j]`` with in-tile rank
  ``chunk_rank[j]`` — and the kernel is pure straight-line code under
  ``pl.when`` guards. Per-tile accumulators live in VMEM scratch, which
  persists across sequential grid steps; the result is flushed to HBM on each
  tile's last chunk.
- **Attributes stream through the BlockSpec pipeline.** Pair attributes are
  packed (16, P) f32 in sorted pair order with every tile segment start
  chunk-aligned (ops/binning.py), so chunk j's data is exactly block j — the
  Mosaic pipeline double-buffers the HBM->VMEM DMA automatically.
- A chunk is blended over all 256 pixels at once: alphas form a (256, C)
  block (pixels in sublanes, splats in lanes), the front-to-back transmittance
  scan is a log2(C)-step shift-multiply prefix product on the VPU, and color
  accumulation is a (256,C)x(C,3) contraction on the MXU.
- Early termination when every pixel's transmittance drops below threshold
  (the FTB early-out of threedgs_raster.frag.slang:299-346) skips the chunk
  compute via ``pl.when``; the sorted loop is deterministic, no fragment
  interlock needed.
- **Backward is a single forward-order sweep.** The usual back-to-front walk
  needs suffix sums S_k = sum_{j>k} w_j (c_j.g); but the total
  S_total = sum_j w_j (c_j.g) equals rgb_out.g_rgb, computable in XLA from the
  *saved forward output*, so S_k = S_total - S_incl_k falls out of a forward
  prefix sum. No reverse iteration, no divide-by-(1-alpha) transmittance
  reconstruction.
- **Response gradients come from in-kernel jax.vjp** of the model's alpha
  function (ops/response.py) — any new response model (GUT's 3D ray kernel,
  stochastic variants) gets a correct backward for free; only the blend
  recurrence is hand-transposed.

Per-tile pixel context (gut3d): camera rays ride an HBM array (T, 8, 256)
(rows RAY_* of response.py), DMA'd + transposed to (256, 8) once per tile.
Output per tile: (8, 256) block (channels in sublanes, pixels in lanes —
HBM minor dims below 128 get padded and misalign DMA): rows 0..2 rgb, row 3
transmittance, rows 4..7 reserved (picked depth / splat id / normal aux).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vk_gaussian_splatting_tpu.ops.response import (
    ALPHA_FNS,
    DEPTH_ROW,
    ID_ROW,
    USES_PIX_CTX,
)

# legacy aliases for the gs2d attr layout (see ops/response.py for all rows)
ATTR_X = 0
ATTR_Y = 1
ATTR_CA = 2
ATTR_CB = 3
ATTR_CC = 4
ATTR_OPACITY = 5
ATTR_R = 6
ATTR_G = 7
ATTR_B = 8
ATTR_DEPTH = 9
NUM_ATTRS = 16

TILE = 16
PIX = TILE * TILE  # 256 pixels per tile
OUT_COLS = 8       # rgb, T, 4 reserved

# backward context rows (per tile, built in XLA from fwd out + cotangents)
CTX_GR, CTX_GG, CTX_GB, CTX_STOTAL, CTX_GTTN = 0, 1, 2, 3, 4


@dataclasses.dataclass(frozen=True)
class RasterStatics:
    """Hashable static parameters baked into the kernel (the jit-cache key)."""

    tiles_x: int
    tiles_y: int
    chunk: int = 128
    alpha_min: float = 1.0 / 255.0
    alpha_clamp: float = 0.999
    qmax: float = 8.0
    min_transmittance: float = 1e-4
    model: str = "gs2d"            # response model (ops/response.py)
    kernel_degree: int = 2         # gut3d generalized-gaussian degree
    kernel_min_response: float = 0.0113
    depth_iso: float = 0.7         # depth-pick transmittance threshold
                                   # (prmRaster.depthIsoThreshold)
    stochastic: bool = False       # STOCHASTIC_SPLAT (frag.slang:265-290)
    multi_iso: bool = False        # 4 depth picks -> deep shadow map rows 4-7
    iso_thresholds: tuple = (0.75, 0.5, 0.25, 0.05)
    interpret: bool = False


def _shift_right(x: jax.Array, s: int, fill: float) -> jax.Array:
    """result[..., j] = x[..., j-s] along the lane axis; lanes < s get `fill`."""
    rolled = pltpu.roll(x, s, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx >= s, rolled, fill)


def _cumprod_exclusive(q: jax.Array) -> jax.Array:
    """Exclusive prefix product along lanes via log-shift scan (VPU only)."""
    c = q.shape[1]
    x = _shift_right(q, 1, 1.0)
    s = 1
    while s < c:
        x = x * _shift_right(x, s, 1.0)
        s *= 2
    return x


def _cumsum_inclusive(v: jax.Array) -> jax.Array:
    """Inclusive prefix sum along lanes via log-shift scan."""
    c = v.shape[1]
    x = v
    s = 1
    while s < c:
        x = x + _shift_right(x, s, 0.0)
        s *= 2
    return x


def _tile_pixel_coords(t: jax.Array, tiles_x: int):
    """Pixel-center coordinates of tile t as (256, 1) columns (x, y)."""
    ty = t // tiles_x
    tx = t % tiles_x
    pix = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + pix % TILE).astype(jnp.float32) + 0.5
    py = (ty * TILE + pix // TILE).astype(jnp.float32) + 0.5
    return px, py


def _hash_uniform(key, shape) -> jax.Array:
    """Deterministic uniforms in [0,1) from (key, sublane, lane) via an
    xxhash32-flavoured integer mix (pure VPU ALU; no pltpu PRNG so the same
    stream exists under CPU interpret)."""
    pixv = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    lanev = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = (pixv * jnp.uint32(0x9E3779B1)
         ^ lanev * jnp.uint32(0x85EBCA77)
         ^ (jnp.uint32(key) * jnp.uint32(0xC2B2AE3D)))
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    # Mosaic lacks uint32->f32 casts; the top-24-bit value fits int32 exactly
    h24 = jax.lax.bitcast_convert_type((h >> 8), jnp.int32)
    return h24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _alpha_closure(st: RasterStatics, pix, px, py, n_remaining, rng_key=None):
    alpha_fn = ALPHA_FNS[st.model]

    def f(block):
        live = (jax.lax.broadcasted_iota(jnp.int32, (1, block.shape[1]), 1)
                < n_remaining)
        alpha = alpha_fn(block, pix, px, py, live, st)
        if st.stochastic:
            # STOCHASTIC_SPLAT: binary accept with p = alpha; accepted splats
            # become opaque (threedgs_raster.frag.slang:265-290). Counter-based
            # xxhash-style stream keyed on (sample seed, chunk, pixel, lane) —
            # the shader's xxhash32(fragCoord, splatId, sampleId) analog,
            # identical under interpret and Mosaic.
            u = _hash_uniform(rng_key, alpha.shape)
            alpha = jnp.where((u < alpha) & (alpha > 0.0), 1.0, 0.0)
        return alpha

    return f


def _make_fwd_kernel(st: RasterStatics):
    c = st.chunk
    uses_pix = USES_PIX_CTX[st.model]

    drow = DEPTH_ROW[st.model]
    idrow = ID_ROW[st.model]

    def kernel(seed_ref, tile_ref, rank_ref, last_ref, counts_ref, attrs_ref,
               *rest):
        if uses_pix:
            (pixctx_ref, out_ref, acc, t_col, pick_d, pick_id, outbuf,
             pixraw, pixscr, sem, psem) = rest
        else:
            (out_ref, acc, t_col, pick_d, pick_id, outbuf, sem) = rest
            pixscr = None
        j = pl.program_id(0)
        t = tile_ref[j]
        k = rank_ref[j]
        px, py = _tile_pixel_coords(t, st.tiles_x)
        rng_key = seed_ref[0] + j if st.stochastic else None

        n_iso = len(st.iso_thresholds) if st.multi_iso else 1

        @pl.when(t >= 0)
        def _process():
            @pl.when(k == 0)
            def _reset():
                acc[:, :] = jnp.zeros((PIX, 3), jnp.float32)
                t_col[:, :] = jnp.ones((PIX, 1), jnp.float32)
                pick_d[:, :] = jnp.full((PIX, 4), 1e30, jnp.float32)
                pick_id[:, :] = jnp.full((PIX, 1), -1.0, jnp.float32)
                if uses_pix:
                    copy = pltpu.make_async_copy(pixctx_ref.at[t], pixraw, psem)
                    copy.start()
                    copy.wait()
                    pixscr[:, :] = jnp.transpose(pixraw[:, :])

            n_remaining = counts_ref[t] - k * c

            @pl.when(jnp.max(t_col[:, :]) > st.min_transmittance)
            def _blend():
                block = attrs_ref[:, :]
                pix = pixscr[:, :] if uses_pix else None
                alpha = _alpha_closure(st, pix, px, py, n_remaining, rng_key)(block)
                q = 1.0 - alpha
                excl = _cumprod_exclusive(q)
                tc = t_col[:, :]
                w = alpha * excl * tc                          # (256, C)
                cols = block[ATTR_R:ATTR_B + 1, :]             # (3, C)
                acc[:, :] = acc[:, :] + jax.lax.dot_general(
                    w, cols, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                              # (256, 3)

                # depth picking: first splat (FTB order) after which the
                # running transmittance drops below each iso threshold
                # (threedgs_raster.frag.slang:325-346). Normal mode: one
                # threshold + the picked splat id for material lookup;
                # multi_iso mode: 4 thresholds forming a deep-shadow-map
                # transmittance staircase.
                t_after = tc * excl * q                        # (256, C)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, c), 1) * jnp.ones((PIX, 1), jnp.int32)
                thresholds = (st.iso_thresholds if st.multi_iso
                              else (st.depth_iso,))
                for i, thr in enumerate(thresholds):
                    cond = (t_after < thr) & (alpha > 0.0)
                    first = jnp.min(jnp.where(cond, lane, 1 << 20), axis=1,
                                    keepdims=True)
                    sel = (lane == first) & cond
                    d_sel = jnp.sum(
                        jnp.where(sel, block[drow:drow + 1, :], 0.0), axis=1,
                        keepdims=True)
                    hit = first < (1 << 20)
                    unpicked = pick_d[:, i:i + 1] > 1e29
                    upd = hit & unpicked
                    if i == 0 and not st.multi_iso:
                        id_sel = jnp.sum(
                            jnp.where(sel, block[idrow:idrow + 1, :], 0.0),
                            axis=1, keepdims=True)
                        pick_id[:, :] = jnp.where(upd, id_sel, pick_id[:, :])
                    pick_d[:, i:i + 1] = jnp.where(upd, d_sel,
                                                   pick_d[:, i:i + 1])

                t_col[:, :] = tc * excl[:, c - 1:c] * q[:, c - 1:c]

            @pl.when(last_ref[j] > 0)
            def _flush():
                # per-tile output rides as (OUT_COLS, 256): HBM minor dims
                # < 128 are padded and their DMA slices misalign, so channels
                # go in sublanes, pixels in lanes.
                pd = jnp.where(pick_d[:, :] > 1e29, 0.0, pick_d[:, :])
                if st.multi_iso:
                    aux = jnp.transpose(pd)                      # rows 4-7
                else:
                    aux = jnp.concatenate(
                        [jnp.transpose(pd[:, 0:1]),
                         jnp.transpose(pick_id[:, :]),
                         jnp.zeros((OUT_COLS - 6, PIX), jnp.float32)], axis=0)
                outbuf[:, :] = jnp.concatenate(
                    [jnp.transpose(acc[:, :]), jnp.transpose(t_col[:, :]),
                     aux], axis=0
                )
                copy = pltpu.make_async_copy(outbuf, out_ref.at[t], sem)
                copy.start()
                copy.wait()

    return kernel


def _make_bwd_kernel(st: RasterStatics):
    c = st.chunk
    uses_pix = USES_PIX_CTX[st.model]

    def kernel(seed_ref, tile_ref, rank_ref, counts_ref, attrs_ref,
               ctx_hbm_ref, *rest):
        if uses_pix:
            (pixctx_ref, dattrs_ref, t_col, s_run, ctx,
             pixraw, pixscr, sem, psem) = rest
        else:
            dattrs_ref, t_col, s_run, ctx, sem = rest
            pixscr = None
        j = pl.program_id(0)
        t = tile_ref[j]
        k = rank_ref[j]
        px, py = _tile_pixel_coords(t, st.tiles_x)
        # the same counter-based stream as the forward so recomputed alphas
        # match the rendered ones exactly
        rng_key = seed_ref[0] + j if st.stochastic else None

        @pl.when((t >= 0) & (k == 0))
        def _reset():
            t_col[:, :] = jnp.ones((PIX, 1), jnp.float32)
            s_run[:, :] = jnp.zeros((PIX, 1), jnp.float32)
            copy = pltpu.make_async_copy(ctx_hbm_ref.at[t], ctx, sem)
            copy.start()
            copy.wait()
            if uses_pix:
                copy2 = pltpu.make_async_copy(pixctx_ref.at[t], pixraw, psem)
                copy2.start()
                copy2.wait()
                pixscr[:, :] = jnp.transpose(pixraw[:, :])

        n_remaining = jnp.where(t >= 0, counts_ref[jnp.maximum(t, 0)], 0) - k * c
        computing = (t >= 0) & (jnp.max(t_col[:, :]) > st.min_transmittance)

        # Always write the full gradient block (skipped chunks => zero grads).
        block = attrs_ref[:, :]
        pix = pixscr[:, :] if uses_pix else None
        alpha_f = _alpha_closure(st, pix, px, py, n_remaining, rng_key)
        alpha, alpha_vjp = jax.vjp(alpha_f, block)
        q = 1.0 - alpha
        excl = _cumprod_exclusive(q)
        tc = t_col[:, :]
        t_k = excl * tc
        w = alpha * t_k
        g_rgb_t = ctx[0:3, :]                                 # (3, 256)
        s_total = jnp.transpose(ctx[CTX_STOTAL:CTX_STOTAL + 1, :])  # (256, 1)
        gt_tn = jnp.transpose(ctx[CTX_GTTN:CTX_GTTN + 1, :])        # (256, 1)
        cols = block[ATTR_R:ATTR_B + 1, :]
        cg = jax.lax.dot_general(
            g_rgb_t, cols, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (256, C)
        wcg = w * cg
        s_incl = s_run[:, :] + _cumsum_inclusive(wcg)         # sum_{j<=k}
        suffix = s_total - s_incl                             # sum_{j>k}
        qsafe = jnp.maximum(q, 1.0 - st.alpha_clamp)
        dalpha = t_k * cg - (suffix + gt_tn) / qsafe
        dalpha = jnp.where(computing, dalpha, 0.0)

        (d_block,) = alpha_vjp(dalpha)
        wmask = jnp.where(computing, w, 0.0)
        dcol = jax.lax.dot_general(
            g_rgb_t, wmask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                          # (3,C)
        # Mosaic has no scatter-add; splice the color-gradient rows in with
        # static slices.
        dattrs_ref[:, :] = jnp.concatenate(
            [d_block[:ATTR_R, :], d_block[ATTR_R:ATTR_B + 1, :] + dcol,
             d_block[ATTR_B + 1:, :]], axis=0)

        @pl.when(computing)
        def _advance():
            t_col[:, :] = tc * excl[:, c - 1:c] * q[:, c - 1:c]
            s_run[:, :] = s_run[:, :] + jnp.sum(wcg, axis=1, keepdims=True)

    return kernel


def _pix_specs_and_scratch(st: RasterStatics):
    specs = [pl.BlockSpec(memory_space=pltpu.HBM)]  # pix ctx (T, 8, 256)
    scratch = [
        pltpu.VMEM((OUT_COLS, PIX), jnp.float32),   # pixraw (as stored)
        pltpu.VMEM((PIX, OUT_COLS), jnp.float32),   # pixscr (transposed)
    ]
    return specs, scratch


@functools.lru_cache(maxsize=64)
def _fwd_call(st: RasterStatics, num_chunks: int):
    num_tiles = st.tiles_x * st.tiles_y
    uses_pix = USES_PIX_CTX[st.model]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_tile (S,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_rank (S,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_last (S,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_counts (T,)
        pl.BlockSpec((NUM_ATTRS, st.chunk), lambda j: (0, j),
                     memory_space=pltpu.VMEM),  # attrs chunk (pipelined)
    ]
    scratch = [
        pltpu.VMEM((PIX, 3), jnp.float32),        # acc
        pltpu.VMEM((PIX, 1), jnp.float32),        # t_col
        pltpu.VMEM((PIX, 4), jnp.float32),        # pick_d (up to 4 isos)
        pltpu.VMEM((PIX, 1), jnp.float32),        # pick_id
        pltpu.VMEM((OUT_COLS, PIX), jnp.float32),  # outbuf
    ]
    if uses_pix:
        ps, sc = _pix_specs_and_scratch(st)
        in_specs += ps
        scratch += sc
        scratch += [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())]
    else:
        scratch += [pltpu.SemaphoreType.DMA(())]
    return pl.pallas_call(
        _make_fwd_kernel(st),
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_COLS, PIX), jnp.float32),
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@functools.lru_cache(maxsize=64)
def _bwd_call(st: RasterStatics, num_chunks: int):
    uses_pix = USES_PIX_CTX[st.model]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_tile (S,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_rank (S,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_counts (T,)
        pl.BlockSpec((NUM_ATTRS, st.chunk), lambda j: (0, j),
                     memory_space=pltpu.VMEM),  # attrs chunk (pipelined)
        pl.BlockSpec(memory_space=pltpu.HBM),   # bwd ctx (T, 8, 256)
    ]
    scratch = [
        pltpu.VMEM((PIX, 1), jnp.float32),        # t_col
        pltpu.VMEM((PIX, 1), jnp.float32),        # s_run
        pltpu.VMEM((OUT_COLS, PIX), jnp.float32),  # ctx tile block
    ]
    if uses_pix:
        ps, sc = _pix_specs_and_scratch(st)
        in_specs += ps
        scratch += sc
        scratch += [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())]
    else:
        scratch += [pltpu.SemaphoreType.DMA(())]
    return pl.pallas_call(
        _make_bwd_kernel(st),
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((NUM_ATTRS, st.chunk), lambda j: (0, j),
                               memory_space=pltpu.VMEM),  # d_attrs chunk
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct(
            (NUM_ATTRS, num_chunks * st.chunk), jnp.float32),
        interpret=st.interpret,
    )


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def rasterize_tiles(attrs: jax.Array, chunk_tile: jax.Array,
                    chunk_rank: jax.Array, chunk_last: jax.Array,
                    seg_counts: jax.Array, pix_ctx, seed,
                    st: RasterStatics):
    """Blend sorted pair attrs into per-tile (8, 256) outputs.

    attrs: (16, P) f32 pair-ordered (rows per st.model — ops/response.py);
      P = num_chunks * st.chunk with chunk-aligned tile segments (binning).
    chunk_tile/rank/last: (S,) i32 chunk schedule (tile id or -1, in-tile rank,
      last-chunk-of-tile flag).
    seg_counts: (T,) i32 true per-tile pair counts.
    pix_ctx: (T, 8, 256) per-tile pixel rays for gut3d models; None for gs2d.
    Returns (T, 8, 256): rows 0-2 rgb, row 3 transmittance. Tiles with zero
    pairs are NOT written — callers must mask with seg_counts (render pipeline
    does).
    """
    num_chunks = attrs.shape[1] // st.chunk
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    args = [seed, chunk_tile, chunk_rank, chunk_last, seg_counts, attrs]
    if USES_PIX_CTX[st.model]:
        args.append(pix_ctx)
    return _fwd_call(st, num_chunks)(*args)


def _rt_fwd(attrs, chunk_tile, chunk_rank, chunk_last, seg_counts, pix_ctx,
            seed, st):
    out = rasterize_tiles(attrs, chunk_tile, chunk_rank, chunk_last,
                          seg_counts, pix_ctx, seed, st)
    return out, (attrs, chunk_tile, chunk_rank, seg_counts, pix_ctx, seed, out)


def _rt_bwd(st, res, g):
    attrs, chunk_tile, chunk_rank, seg_counts, pix_ctx, seed, out = res
    # Backward context per tile, from the saved forward output:
    #   S_total = rgb_out . g_rgb   (sum_j w_j (c_j.g) — no extra sweep)
    #   gt_tn   = g_T * T_final
    g_rgb = g[:, 0:3, :]                                      # (T, 3, 256)
    s_total = jnp.sum(out[:, 0:3, :] * g_rgb, axis=1, keepdims=True)
    gt_tn = g[:, 3:4, :] * out[:, 3:4, :]
    pad = jnp.zeros((g.shape[0], OUT_COLS - 5, PIX), jnp.float32)
    ctx = jnp.concatenate([g_rgb, s_total, gt_tn, pad], axis=1)
    # empty tiles are never loaded by the kernel but NaNs in unwritten fwd
    # output must not poison the context
    live_tile = (seg_counts > 0)[:, None, None]
    ctx = jnp.where(live_tile, ctx, 0.0)

    num_chunks = attrs.shape[1] // st.chunk
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    args = [seed, chunk_tile, chunk_rank, seg_counts, attrs, ctx]
    if USES_PIX_CTX[st.model]:
        args.append(pix_ctx)
    d_attrs = _bwd_call(st, num_chunks)(*args)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    d_pix = None if pix_ctx is None else jnp.zeros_like(pix_ctx)
    d_seed = None if res[5] is None else f0(seed)
    return (d_attrs, f0(chunk_tile), f0(chunk_rank),
            f0(chunk_tile), f0(seg_counts), d_pix, d_seed)


rasterize_tiles.defvjp(_rt_fwd, _rt_bwd)


def assemble_image(out: jax.Array, seg_counts: jax.Array,
                   tiles_x: int, tiles_y: int,
                   width: int, height: int, background=(0.0, 0.0, 0.0),
                   with_aux: bool = False):
    """(T, 8, 256) tile blocks -> (H, W, 3) image + (H, W) transmittance
    (+ picked depth and splat id when with_aux).

    Tiles with zero pairs were never written by the kernel; mask them to the
    empty result (rgb 0, T 1, no pick) before reshaping.
    """
    empty = jnp.concatenate(
        [jnp.zeros((3, PIX), jnp.float32), jnp.ones((1, PIX), jnp.float32),
         jnp.zeros((1, PIX), jnp.float32), jnp.full((1, PIX), -1.0),
         jnp.zeros((OUT_COLS - 6, PIX), jnp.float32)], axis=0)
    out = jnp.where((seg_counts > 0)[:, None, None], out, empty[None])
    blocks = out.reshape(tiles_y, tiles_x, OUT_COLS, TILE, TILE)
    full = blocks.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * TILE, tiles_x * TILE, OUT_COLS
    )
    rgb = full[:height, :width, 0:3]
    trans = full[:height, :width, 3]
    bg = jnp.asarray(background, jnp.float32)
    img = rgb + trans[..., None] * bg
    if not with_aux:
        return img, trans
    depth = full[:height, :width, 4]
    splat_id = full[:height, :width, 5].astype(jnp.int32)
    return img, trans, depth, splat_id
