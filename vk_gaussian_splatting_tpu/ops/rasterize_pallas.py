"""Pallas TPU tile rasterizer — forward + custom-VJP backward.

TPU-native replacement for the reference's raster pipelines (mesh shader S3 +
fragment blend S5, threedgs_raster.{mesh,frag}.slang). Where the GPU rasterizes
oriented quads with per-fragment interlocked blending, the TPU kernel blends
each 16x16 tile's depth-sorted splat list front-to-back in chunks of C splats.

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
  reconstruction. Gradients flow to mean2d, conic, opacity and color, matching
  what the CUDA 3DGS backward produces.

Attribute row layout (ATTR_* indices below), array shape (16, P):
  0 x, 1 y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity, 6 r, 7 g, 8 b,
  9 depth, 10..15 reserved.
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

# backward context columns (per tile, built in XLA from fwd out + cotangents)
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


def _chunk_alpha(block: jax.Array, px, py, n_remaining, st: RasterStatics):
    """Per-chunk alpha evaluation shared by fwd and bwd.

    block: (16, C) attrs. Intermediates are (256, C) or (1, C).
    """
    x = block[ATTR_X:ATTR_X + 1, :]
    y = block[ATTR_Y:ATTR_Y + 1, :]
    ca = block[ATTR_CA:ATTR_CA + 1, :]
    cb = block[ATTR_CB:ATTR_CB + 1, :]
    cc = block[ATTR_CC:ATTR_CC + 1, :]
    op = block[ATTR_OPACITY:ATTR_OPACITY + 1, :]

    dx = px - x   # (256, C)
    dy = py - y
    d = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    g = jnp.exp(-0.5 * d)
    a_raw = op * g
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, block.shape[1]), 1)
    live = lane < n_remaining
    mask = (d <= st.qmax) & (a_raw >= st.alpha_min) & live
    alpha = jnp.where(mask, jnp.minimum(a_raw, st.alpha_clamp), 0.0)
    return dict(dx=dx, dy=dy, g=g, a_raw=a_raw, mask=mask, alpha=alpha,
                op=op, ca=ca, cb=cb, cc=cc)


def _make_fwd_kernel(st: RasterStatics):
    c = st.chunk

    def kernel(tile_ref, rank_ref, last_ref, counts_ref, attrs_ref,
               out_ref, acc, t_col, outbuf, sem):
        j = pl.program_id(0)
        t = tile_ref[j]
        k = rank_ref[j]
        px, py = _tile_pixel_coords(t, st.tiles_x)

        @pl.when(t >= 0)
        def _process():
            @pl.when(k == 0)
            def _reset():
                acc[:, :] = jnp.zeros((PIX, 3), jnp.float32)
                t_col[:, :] = jnp.ones((PIX, 1), jnp.float32)

            n_remaining = counts_ref[t] - k * c

            @pl.when(jnp.max(t_col[:, :]) > st.min_transmittance)
            def _blend():
                block = attrs_ref[:, :]
                ck = _chunk_alpha(block, px, py, n_remaining, st)
                q = 1.0 - ck["alpha"]
                excl = _cumprod_exclusive(q)
                tc = t_col[:, :]
                w = ck["alpha"] * excl * tc                    # (256, C)
                cols = block[ATTR_R:ATTR_B + 1, :]             # (3, C)
                acc[:, :] = acc[:, :] + jax.lax.dot_general(
                    w, cols, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                              # (256, 3)
                t_col[:, :] = tc * excl[:, c - 1:c] * q[:, c - 1:c]

            @pl.when(last_ref[j] > 0)
            def _flush():
                # per-tile output rides as (OUT_COLS, 256): HBM minor dims
                # < 128 are padded and their DMA slices misalign, so channels
                # go in sublanes, pixels in lanes.
                outbuf[:, :] = jnp.concatenate(
                    [jnp.transpose(acc[:, :]), jnp.transpose(t_col[:, :]),
                     jnp.zeros((OUT_COLS - 4, PIX), jnp.float32)], axis=0
                )
                copy = pltpu.make_async_copy(outbuf, out_ref.at[t], sem)
                copy.start()
                copy.wait()

    return kernel


def _make_bwd_kernel(st: RasterStatics):
    c = st.chunk

    def kernel(tile_ref, rank_ref, counts_ref, attrs_ref, ctx_hbm_ref,
               dattrs_ref, t_col, s_run, ctx, sem):
        j = pl.program_id(0)
        t = tile_ref[j]
        k = rank_ref[j]
        px, py = _tile_pixel_coords(t, st.tiles_x)

        @pl.when((t >= 0) & (k == 0))
        def _reset():
            t_col[:, :] = jnp.ones((PIX, 1), jnp.float32)
            s_run[:, :] = jnp.zeros((PIX, 1), jnp.float32)
            copy = pltpu.make_async_copy(ctx_hbm_ref.at[t], ctx, sem)
            copy.start()
            copy.wait()

        n_remaining = jnp.where(t >= 0, counts_ref[jnp.maximum(t, 0)], 0) - k * c
        computing = (t >= 0) & (jnp.max(t_col[:, :]) > st.min_transmittance)

        # Always write the full gradient block (skipped chunks => zero grads).
        block = attrs_ref[:, :]
        ck = _chunk_alpha(block, px, py, n_remaining, st)
        alpha = ck["alpha"]
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
        s_incl = s_run[:, :] + _cumsum_inclusive(wcg)         # Σ_{j<=k}
        suffix = s_total - s_incl                             # Σ_{j>k}
        qsafe = jnp.maximum(q, 1.0 - st.alpha_clamp)
        dalpha = t_k * cg - (suffix + gt_tn) / qsafe
        dalpha = jnp.where(ck["mask"], dalpha, 0.0)
        dalpha_raw = jnp.where(ck["a_raw"] <= st.alpha_clamp, dalpha, 0.0)
        dalpha_raw = jnp.where(computing, dalpha_raw, 0.0)

        g_ = ck["g"]
        dd = -0.5 * dalpha_raw * ck["op"] * g_
        dx, dy = ck["dx"], ck["dy"]
        do = jnp.sum(dalpha_raw * g_, axis=0, keepdims=True)       # (1,C)
        da = jnp.sum(dd * dx * dx, axis=0, keepdims=True)
        db = jnp.sum(dd * 2.0 * dx * dy, axis=0, keepdims=True)
        dc = jnp.sum(dd * dy * dy, axis=0, keepdims=True)
        ca2 = 2.0 * ck["ca"]
        cb2 = 2.0 * ck["cb"]
        cc2 = 2.0 * ck["cc"]
        dmx = jnp.sum(-dd * (ca2 * dx + cb2 * dy), axis=0, keepdims=True)
        dmy = jnp.sum(-dd * (cc2 * dy + cb2 * dx), axis=0, keepdims=True)
        wmask = jnp.where(computing, w, 0.0)
        dcol = jax.lax.dot_general(
            g_rgb_t, wmask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                          # (3,C)

        zero_row = jnp.zeros((1, c), jnp.float32)
        dattrs_ref[:, :] = jnp.concatenate(
            [dmx, dmy, da, db, dc, do, dcol] + [zero_row] * (NUM_ATTRS - 9), axis=0
        )

        @pl.when(computing)
        def _advance():
            t_col[:, :] = tc * excl[:, c - 1:c] * q[:, c - 1:c]
            s_run[:, :] = s_run[:, :] + jnp.sum(wcg, axis=1, keepdims=True)

    return kernel


@functools.lru_cache(maxsize=64)
def _fwd_call(st: RasterStatics, num_chunks: int):
    num_tiles = st.tiles_x * st.tiles_y
    return pl.pallas_call(
        _make_fwd_kernel(st),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_tile (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_rank (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_last (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_counts (T,)
            pl.BlockSpec((NUM_ATTRS, st.chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),  # attrs chunk (pipelined)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((PIX, 3), jnp.float32),        # acc
            pltpu.VMEM((PIX, 1), jnp.float32),        # t_col
            pltpu.VMEM((OUT_COLS, PIX), jnp.float32),  # outbuf
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_COLS, PIX), jnp.float32),
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@functools.lru_cache(maxsize=64)
def _bwd_call(st: RasterStatics, num_chunks: int):
    num_tiles = st.tiles_x * st.tiles_y
    return pl.pallas_call(
        _make_bwd_kernel(st),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_tile (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_rank (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_counts (T,)
            pl.BlockSpec((NUM_ATTRS, st.chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),  # attrs chunk (pipelined)
            pl.BlockSpec(memory_space=pltpu.HBM),   # bwd ctx (T, 256, 8)
        ],
        out_specs=pl.BlockSpec((NUM_ATTRS, st.chunk), lambda j: (0, j),
                               memory_space=pltpu.VMEM),  # d_attrs chunk
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),        # t_col
            pltpu.VMEM((PIX, 1), jnp.float32),        # s_run
            pltpu.VMEM((OUT_COLS, PIX), jnp.float32),  # ctx tile block
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct(
            (NUM_ATTRS, num_chunks * st.chunk), jnp.float32),
        interpret=st.interpret,
    )


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def rasterize_tiles(attrs: jax.Array, chunk_tile: jax.Array,
                    chunk_rank: jax.Array, chunk_last: jax.Array,
                    seg_counts: jax.Array, st: RasterStatics):
    """Blend sorted pair attrs into per-tile (256, 8) outputs.

    attrs: (16, P) f32 pair-ordered (ATTR_* rows); P = num_chunks * st.chunk
      with chunk-aligned tile segments (binning).
    chunk_tile/rank/last: (S,) i32 chunk schedule (tile id or -1, in-tile rank,
      last-chunk-of-tile flag).
    seg_counts: (T,) i32 true per-tile pair counts.
    Returns (T, 8, 256): rows 0-2 rgb, row 3 transmittance. Tiles with zero
    pairs are NOT written — callers must mask with seg_counts (render pipeline
    does).
    """
    num_chunks = attrs.shape[1] // st.chunk
    return _fwd_call(st, num_chunks)(
        chunk_tile, chunk_rank, chunk_last, seg_counts, attrs)


def _rt_fwd(attrs, chunk_tile, chunk_rank, chunk_last, seg_counts, st):
    out = rasterize_tiles(attrs, chunk_tile, chunk_rank, chunk_last,
                          seg_counts, st)
    return out, (attrs, chunk_tile, chunk_rank, seg_counts, out)


def _rt_bwd(st, res, g):
    attrs, chunk_tile, chunk_rank, seg_counts, out = res
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
    d_attrs = _bwd_call(st, num_chunks)(
        chunk_tile, chunk_rank, seg_counts, attrs, ctx)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (d_attrs, f0(chunk_tile), f0(chunk_rank),
            f0(chunk_tile), f0(seg_counts))


rasterize_tiles.defvjp(_rt_fwd, _rt_bwd)


def assemble_image(out: jax.Array, seg_counts: jax.Array,
                   tiles_x: int, tiles_y: int,
                   width: int, height: int, background=(0.0, 0.0, 0.0)):
    """(T, 8, 256) tile blocks -> (H, W, 3) image + (H, W) transmittance.

    Tiles with zero pairs were never written by the kernel; mask them to the
    empty result (rgb 0, T 1) before reshaping.
    """
    empty = jnp.concatenate(
        [jnp.zeros((3, PIX), jnp.float32), jnp.ones((1, PIX), jnp.float32),
         jnp.zeros((OUT_COLS - 4, PIX), jnp.float32)], axis=0)
    out = jnp.where((seg_counts > 0)[:, None, None], out, empty[None])
    blocks = out.reshape(tiles_y, tiles_x, OUT_COLS, TILE, TILE)
    full = blocks.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * TILE, tiles_x * TILE, OUT_COLS
    )
    rgb = full[:height, :width, 0:3]
    trans = full[:height, :width, 3]
    bg = jnp.asarray(background, jnp.float32)
    return rgb + trans[..., None] * bg, trans
