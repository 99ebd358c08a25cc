"""Pallas TPU tile blender — forward + custom-VJP backward, generic over
response models (2D conic splats for 3DGS, exact 3D ray response for 3DGUT,
opaque triangles for meshes).

TPU-native replacement for the reference's raster pipelines (mesh shaders
S3/S7 + fragment blends S5). Where the GPU rasterizes quads with per-fragment
interlocked blending, the TPU kernel blends each 16x16 tile's depth-sorted
attribute list front-to-back in 128-lane blocks.

Design notes (all shaped by Mosaic/TPU semantics and v5e measurements):

- **The grid iterates over a host-built schedule**, one step = (tile, 128-lane
  block, [lo,hi) lane range). Dynamic-trip-count loops deadlock the axon TPU
  runtime, so the kernel is straight-line code under ``pl.when``; per-tile
  accumulators persist in VMEM scratch across sequential steps and flush on
  each tile's last step. Segments may start mid-block (no physical alignment
  pass — gathers are 10-60x slower than sorts on this chip); a block shared
  by two tiles simply appears in two steps.
- Blocks are DMA'd manually at dynamic-but-provably-aligned offsets
  (``pl.multiple_of(block * 128, 128)``), double-buffered: the next step's
  block prefetches while the current one blends.
- A block of C splats blends over all 256 pixels at once: alphas form a
  (256, C) array (pixels in sublanes, splats in lanes), the front-to-back
  transmittance scan is a log2(C)-step shift-multiply prefix product on the
  VPU, and color accumulation is a (256,C)x(C,3) MXU contraction.
- Early termination when every pixel's transmittance drops below threshold
  (the FTB early-out of threedgs_raster.frag.slang:299-346; the sorted loop
  is deterministic — no fragment interlock).
- **Backward is a single forward-order sweep**: S_total = rgb_out.g_rgb from
  the saved forward output turns the back-to-front gradient walk into a
  prefix sum; response gradients come from in-kernel ``jax.vjp`` of the
  model's alpha function, so new response models get gradients for free.
  d_attrs blocks are read-modify-write accumulated (a zero-fill grid phase
  runs first) because boundary blocks receive gradients from two tiles.

Per-tile pixel context (gut3d / clip models): (T, 8, 256) HBM array
(rows RAY_* / PIX_DEPTH_LIMIT of response.py), DMA'd + transposed per tile.
Output per tile: (8, 256) block (channels in sublanes, pixels in lanes — HBM
minor dims below 128 get padded and misalign DMA): rows 0-2 rgb, row 3
transmittance, rows 4-5 picked depth + splat id (or rows 4-7 multi-iso
depths for deep shadow maps).
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
    COLOR_FNS,
    DEPTH_FNS,
    DEPTH_ROW,
    ID_HI_ROW,
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
NUM_ATTRS = 16  # widest layout; actual per-model row counts in NUM_ROWS

TILE = 16
PIX = TILE * TILE  # 256 pixels per tile
OUT_COLS = 8       # rgb, T, 4 aux

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
    stochastic: bool = False       # STOCHASTIC_SPLAT (frag.slang:265-290)
    multi_iso: bool = False        # 4 depth picks -> deep shadow map rows 4-7
    iso_thresholds: tuple = (0.75, 0.5, 0.25, 0.05)
    key_is_row: bool = False       # bucket kernel: the KEY_ROW of the attrs
                                   # already carries the sort key (e.g. the
                                   # CPU sorter's rank, SortMethod.HOST) —
                                   # use it instead of the model depth
    interpret: bool = False


def _shift_right(x: jax.Array, s: int, fill: float) -> jax.Array:
    """result[..., j] = x[..., j-s] along the lane axis; lanes < s get `fill`.

    The fill predicate is a (1, C) single-sublane row broadcast into the
    select: the old full-shape iota+compare cost 2 extra (256, C)-sized
    vector ops PER SCAN ITERATION — ~40% of the whole transmittance scan
    (the scan is ~10 iterations per blend chunk and the blend dominates
    the bucket frame: 139 of 205 ms at 1080p/1M)."""
    rolled = pltpu.roll(x, s, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
    return jnp.where(idx >= s, rolled, fill)


def _cumprod_exclusive(q: jax.Array) -> jax.Array:
    """Exclusive prefix product along lanes via log-shift scan (VPU only).

    NOT a triangular-matrix MXU contraction: Mosaic's default f32 matmul on
    full-width outputs is bf16-grade (measured 0.4% relative on-chip),
    which corrupts transmittance chains; the 21-op VPU scan is exact f32."""
    c = q.shape[1]
    x = _shift_right(q, 1, 1.0)
    s = 1
    while s < c:
        x = x * _shift_right(x, s, 1.0)
        s *= 2
    return x


def _cumsum_inclusive(v: jax.Array) -> jax.Array:
    """Inclusive prefix sum along lanes via log-shift scan (VPU, exact f32)."""
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
    xxhash32-flavoured integer mix (pure VPU ALU; identical stream under CPU
    interpret and Mosaic)."""
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


def _alpha_closure(st: RasterStatics, pix, px, py, lo, hi, rng_key=None):
    alpha_fn = ALPHA_FNS[st.model]

    def f(block):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, block.shape[1]), 1)
        live = (lane >= lo) & (lane < hi)
        alpha = alpha_fn(block, pix, px, py, live, st)
        if st.stochastic:
            # STOCHASTIC_SPLAT: binary accept with p = alpha; accepted splats
            # become opaque (threedgs_raster.frag.slang:265-290).
            u = _hash_uniform(rng_key, alpha.shape)
            alpha = jnp.where((u < alpha) & (alpha > 0.0), 1.0, 0.0)
        return alpha

    return f


def _attrs_copy(attrs_ref, scratch, sem, b, c):
    return pltpu.make_async_copy(
        attrs_ref.at[:, pl.ds(pl.multiple_of(b * c, 128), c)], scratch, sem)


def _make_fwd_kernel(st: RasterStatics):
    from vk_gaussian_splatting_tpu.ops.response import (
        PIXEL_COLOR_FNS,
        PIXEL_DEPTH_FNS,
    )
    c = st.chunk
    uses_pix = USES_PIX_CTX[st.model]
    drow = DEPTH_ROW[st.model]
    idrow = ID_ROW[st.model]
    idrow_hi = ID_HI_ROW.get(st.model)  # wide-id layouts only
    color_fn = COLOR_FNS.get(st.model,
                             lambda blk: blk[ATTR_R:ATTR_B + 1, :])
    depth_fn = DEPTH_FNS.get(st.model, lambda blk: blk[drow:drow + 1, :])
    pix_color_fn = PIXEL_COLOR_FNS.get(st.model)
    pix_depth_fn = PIXEL_DEPTH_FNS.get(st.model)

    def kernel(seed_ref, word_ref, block_ref, attrs_ref, *rest):
        if uses_pix:
            (pixctx_ref, out_ref, acc, t_col, pick_d, pick_id, outbuf,
             ablock, pixraw, pixscr, sem, osem, psem) = rest
        else:
            (out_ref, acc, t_col, pick_d, pick_id, outbuf, ablock,
             sem, osem) = rest
            pixscr = None
        j = pl.program_id(0)
        n_steps = pl.num_programs(0)
        word = word_ref[j]
        traw = word >> 17
        t = jnp.where(traw == 0x3FFF, -1, traw)
        lo = (word >> 10) & 0x7F
        hi = (word >> 2) & 0xFF
        is_first = (word >> 1) & 1
        is_last = word & 1
        b = block_ref[j]
        px, py = _tile_pixel_coords(t, st.tiles_x)
        rng_key = seed_ref[0] + b if st.stochastic else None

        slot = jax.lax.rem(j, 2)

        @pl.when((j == 0) & (t >= 0))
        def _warmup():
            _attrs_copy(attrs_ref, ablock.at[0], sem.at[0], b, c).start()

        nxt = jnp.minimum(j + 1, n_steps - 1)

        @pl.when((j + 1 < n_steps) & ((word_ref[nxt] >> 17) != 0x3FFF))
        def _prefetch():
            _attrs_copy(attrs_ref, ablock.at[1 - slot], sem.at[1 - slot],
                        block_ref[nxt], c).start()

        @pl.when(t >= 0)
        def _process():
            _attrs_copy(attrs_ref, ablock.at[slot], sem.at[slot], b, c).wait()

            @pl.when(is_first > 0)
            def _reset():
                acc[:, :] = jnp.zeros((PIX, 3), jnp.float32)
                t_col[:, :] = jnp.ones((PIX, 1), jnp.float32)
                pick_d[:, :] = jnp.full((PIX, 4), 1e30, jnp.float32)
                # col 0 = id (or id_lo), col 1 = id_hi (wide layouts);
                # unpicked = (-1, 0) so lo + 4096*hi reconstructs to -1
                pick_id[:, :] = jnp.concatenate(
                    [jnp.full((PIX, 1), -1.0, jnp.float32),
                     jnp.zeros((PIX, 1), jnp.float32)], axis=1)
                if uses_pix:
                    copy = pltpu.make_async_copy(pixctx_ref.at[t], pixraw,
                                                 psem)
                    copy.start()
                    copy.wait()
                    pixscr[:, :] = jnp.transpose(pixraw[:, :])

            # PER-PIXEL transmittance termination, matching the bucket
            # kernel bit-for-bit (raster_bucket.blend_chunk): a resolved
            # pixel's alpha row is zeroed, making its color/T/pick updates
            # exact no-ops. The old whole-tile pl.when gate cost a
            # VPU->scalar-core sync (~7.5 us) per evaluation AND diverged
            # from the bucket path's semantics once any pixel saturated
            # inside a still-live tile (ADVICE r4 medium).
            def _blend():
                block = ablock[slot]
                pix = pixscr[:, :] if uses_pix else None
                tc = t_col[:, :]
                alpha = _alpha_closure(st, pix, px, py, lo, hi,
                                       rng_key)(block)
                alpha = jnp.where(tc > st.min_transmittance, alpha, 0.0)
                q = 1.0 - alpha
                excl = _cumprod_exclusive(q)
                w = alpha * excl * tc                          # (256, C)
                if pix_color_fn is not None:
                    # per-pixel interpolated colors (tri2d_smooth Gouraud):
                    # exact VPU lane reductions per channel
                    pcs = pix_color_fn(block, px, py)          # 3 x (256, C)
                    acc[:, :] = acc[:, :] + jnp.concatenate(
                        [jnp.sum(w * pc, axis=1, keepdims=True)
                         for pc in pcs], axis=1)
                else:
                    cols = color_fn(block)                     # (3, C)
                    acc[:, :] = acc[:, :] + jax.lax.dot_general(
                        w, cols, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                          # (256, 3)

                # depth picking at the iso thresholds
                # (threedgs_raster.frag.slang:325-346); multi_iso records the
                # deep-shadow-map staircase instead of (depth, id).
                t_after = tc * excl * q                        # (256, C)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, c), 1) * jnp.ones((PIX, 1), jnp.int32)
                thresholds = (st.iso_thresholds if st.multi_iso
                              else (st.depth_iso,))
                depth_row = (pix_depth_fn(block, px, py)
                             if pix_depth_fn is not None
                             else depth_fn(block))          # (256|1, C)
                for i, thr in enumerate(thresholds):
                    cond = (t_after < thr) & (alpha > 0.0)
                    first = jnp.min(jnp.where(cond, lane, 1 << 20), axis=1,
                                    keepdims=True)
                    sel = (lane == first) & cond
                    d_sel = jnp.sum(
                        jnp.where(sel, depth_row, 0.0), axis=1,
                        keepdims=True)
                    hit = first < (1 << 20)
                    unpicked = pick_d[:, i:i + 1] > 1e29
                    upd = hit & unpicked
                    if i == 0 and not st.multi_iso:
                        id_sel = jnp.sum(
                            jnp.where(sel, block[idrow:idrow + 1, :], 0.0),
                            axis=1, keepdims=True)
                        pick_id[:, 0:1] = jnp.where(upd, id_sel,
                                                    pick_id[:, 0:1])
                        if idrow_hi is not None:
                            hi_sel = jnp.sum(jnp.where(
                                sel, block[idrow_hi:idrow_hi + 1, :], 0.0),
                                axis=1, keepdims=True)
                            pick_id[:, 1:2] = jnp.where(upd, hi_sel,
                                                        pick_id[:, 1:2])
                    pick_d[:, i:i + 1] = jnp.where(upd, d_sel,
                                                   pick_d[:, i:i + 1])

                t_col[:, :] = tc * excl[:, c - 1:c] * q[:, c - 1:c]

            _blend()

            @pl.when(is_last > 0)
            def _flush():
                pd = jnp.where(pick_d[:, :] > 1e29, 0.0, pick_d[:, :])
                if st.multi_iso:
                    aux = jnp.transpose(pd)                      # rows 4-7
                else:
                    # rows 4-7: depth, id(_lo), id_hi, zero
                    aux = jnp.concatenate(
                        [jnp.transpose(pd[:, 0:1]),
                         jnp.transpose(pick_id[:, :]),
                         jnp.zeros((OUT_COLS - 7, PIX), jnp.float32)], axis=0)
                outbuf[:, :] = jnp.concatenate(
                    [jnp.transpose(acc[:, :]), jnp.transpose(t_col[:, :]),
                     aux], axis=0
                )
                copy = pltpu.make_async_copy(outbuf, out_ref.at[t], osem)
                copy.start()
                copy.wait()

    return kernel


def _make_bwd_kernel(st: RasterStatics):
    c = st.chunk
    uses_pix = USES_PIX_CTX[st.model]

    # d_attrs arrives zero-initialized through an input/output-aliased XLA
    # zeros buffer (a ~2ms HBM fill) instead of a per-block zeroing grid
    # phase (P/chunk extra kernel steps); the grid covers schedule steps only.
    def kernel(seed_ref, word_ref, block_ref, attrs_ref, ctx_hbm_ref,
               zeros_ref, *rest):
        del zeros_ref  # aliased with the d_attrs output; contents only
        if uses_pix:
            (pixctx_ref, dattrs_ref, t_col, s_run, ctx, ablock, dblock,
             pixraw, pixscr, sem, dsem, psem) = rest
        else:
            (dattrs_ref, t_col, s_run, ctx, ablock, dblock, sem,
             dsem) = rest
            pixscr = None
        j = pl.program_id(0)
        word = word_ref[j]
        traw = word >> 17
        t = jnp.where(traw == 0x3FFF, -1, traw)
        lo = (word >> 10) & 0x7F
        hi = (word >> 2) & 0xFF
        is_first = (word >> 1) & 1
        b = block_ref[j]
        px, py = _tile_pixel_coords(t, st.tiles_x)
        rng_key = seed_ref[0] + b if st.stochastic else None

        @pl.when(t >= 0)
        def _step():
            acopy = _attrs_copy(attrs_ref, ablock, sem, b, c)
            acopy.start()
            acopy.wait()

            @pl.when(is_first > 0)
            def _reset():
                t_col[:, :] = jnp.ones((PIX, 1), jnp.float32)
                s_run[:, :] = jnp.zeros((PIX, 1), jnp.float32)
                ccopy = pltpu.make_async_copy(ctx_hbm_ref.at[t], ctx, dsem)
                ccopy.start()
                ccopy.wait()
                if uses_pix:
                    pcopy = pltpu.make_async_copy(pixctx_ref.at[t], pixraw,
                                                  psem)
                    pcopy.start()
                    pcopy.wait()
                    pixscr[:, :] = jnp.transpose(pixraw[:, :])

            # per-pixel freeze, mirroring the forward (and the bucket bwd):
            # masking inside alpha_f makes the VJP zero frozen pixels'
            # gradients too; q = 1, excl = 1 keep t_col/s_run exact no-ops
            def _grads():
                block = ablock[:, :]
                pix = pixscr[:, :] if uses_pix else None
                tc0 = t_col[:, :]
                px_live = tc0 > st.min_transmittance
                raw_alpha = _alpha_closure(st, pix, px, py, lo, hi, rng_key)

                def alpha_f(blk):
                    return jnp.where(px_live, raw_alpha(blk), 0.0)

                alpha, alpha_vjp = jax.vjp(alpha_f, block)
                q = 1.0 - alpha
                excl = _cumprod_exclusive(q)
                tc = tc0
                t_k = excl * tc
                w = alpha * t_k
                g_rgb_t = ctx[0:3, :]                             # (3, 256)
                s_total = jnp.transpose(ctx[CTX_STOTAL:CTX_STOTAL + 1, :])
                gt_tn = jnp.transpose(ctx[CTX_GTTN:CTX_GTTN + 1, :])
                cols = block[ATTR_R:ATTR_B + 1, :]
                # cg[pix, c] = sum_ch g_rgb[ch, pix] * cols[ch, c], expanded
                # as 3 broadcast FMAs: a K=3 dot_general rides the MXU where
                # Mosaic's f32 matmul is bf16-grade (0.3-2% relative grad
                # error measured on-chip); VPU broadcasts are exact.
                cg = (jnp.transpose(g_rgb_t[0:1, :]) * cols[0:1, :]
                      + jnp.transpose(g_rgb_t[1:2, :]) * cols[1:2, :]
                      + jnp.transpose(g_rgb_t[2:3, :]) * cols[2:3, :]
                      )                                           # (256, C)
                wcg = w * cg
                s_incl = s_run[:, :] + _cumsum_inclusive(wcg)
                suffix = s_total - s_incl
                qsafe = jnp.maximum(q, 1.0 - st.alpha_clamp)
                dalpha = t_k * cg - (suffix + gt_tn) / qsafe

                (d_block,) = alpha_vjp(dalpha)
                # dcol[ch, c] = sum_pix g_rgb[ch, pix] * w[pix, c]: a K=256
                # contraction would ride the MXU in bf16 (see cg above);
                # per-channel sublane reductions stay exact on the VPU.
                dcol = jnp.concatenate(
                    [jnp.sum(jnp.transpose(g_rgb_t[ch:ch + 1, :]) * w,
                             axis=0, keepdims=True) for ch in range(3)],
                    axis=0)                                        # (3,C)
                d_full = jnp.concatenate(
                    [d_block[:ATTR_R, :], d_block[ATTR_R:ATTR_B + 1, :] + dcol,
                     d_block[ATTR_B + 1:, :]], axis=0)

                # RMW accumulate into the (possibly shared) d_attrs block
                rcopy = pltpu.make_async_copy(
                    dattrs_ref.at[:, pl.ds(pl.multiple_of(b * c, 128), c)],
                    dblock, dsem)
                rcopy.start()
                rcopy.wait()
                dblock[:, :] = dblock[:, :] + d_full
                wcopy = pltpu.make_async_copy(
                    dblock,
                    dattrs_ref.at[:, pl.ds(pl.multiple_of(b * c, 128), c)],
                    dsem)
                wcopy.start()
                wcopy.wait()

                t_col[:, :] = tc * excl[:, c - 1:c] * q[:, c - 1:c]
                s_run[:, :] = s_run[:, :] + jnp.sum(wcg, axis=1, keepdims=True)

            _grads()

    return kernel


def _sched_specs():
    return [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3  # seed, word, block


@functools.lru_cache(maxsize=64)
def _fwd_call(st: RasterStatics, p_alloc: int, s_cap: int):
    num_tiles = st.tiles_x * st.tiles_y
    uses_pix = USES_PIX_CTX[st.model]
    in_specs = _sched_specs() + [pl.BlockSpec(memory_space=pltpu.HBM)]
    scratch = [
        pltpu.VMEM((PIX, 3), jnp.float32),         # acc
        pltpu.VMEM((PIX, 1), jnp.float32),         # t_col
        pltpu.VMEM((PIX, 4), jnp.float32),         # pick_d
        pltpu.VMEM((PIX, 2), jnp.float32),         # pick_id (lo, hi)
        pltpu.VMEM((OUT_COLS, PIX), jnp.float32),  # outbuf
        pltpu.VMEM((2, NUM_ATTRS, st.chunk), jnp.float32),  # ablock x2
    ]
    if uses_pix:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # pix ctx
        scratch += [
            pltpu.VMEM((OUT_COLS, PIX), jnp.float32),   # pixraw
            pltpu.VMEM((PIX, OUT_COLS), jnp.float32),   # pixscr
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        scratch += [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ]
    return pl.pallas_call(
        _make_fwd_kernel(st),
        grid=(s_cap,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_COLS, PIX),
                                       jnp.float32),
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@functools.lru_cache(maxsize=64)
def _bwd_call(st: RasterStatics, p_alloc: int, s_cap: int):
    uses_pix = USES_PIX_CTX[st.model]
    in_specs = _sched_specs() + [
        pl.BlockSpec(memory_space=pltpu.HBM),   # attrs
        pl.BlockSpec(memory_space=pltpu.HBM),   # bwd ctx (T, 8, 256)
        pl.BlockSpec(memory_space=pltpu.HBM),   # zeros, aliased to d_attrs
    ]
    scratch = [
        pltpu.VMEM((PIX, 1), jnp.float32),          # t_col
        pltpu.VMEM((PIX, 1), jnp.float32),          # s_run
        pltpu.VMEM((OUT_COLS, PIX), jnp.float32),   # ctx tile block
        pltpu.VMEM((NUM_ATTRS, st.chunk), jnp.float32),  # ablock
        pltpu.VMEM((NUM_ATTRS, st.chunk), jnp.float32),  # dblock
    ]
    if uses_pix:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # pix ctx
        scratch += [
            pltpu.VMEM((OUT_COLS, PIX), jnp.float32),   # pixraw
            pltpu.VMEM((PIX, OUT_COLS), jnp.float32),   # pixscr
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        scratch += [
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    return pl.pallas_call(
        _make_bwd_kernel(st),
        grid=(s_cap,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((NUM_ATTRS, p_alloc), jnp.float32),
        input_output_aliases={5: 0},
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def rasterize_tiles(attrs: jax.Array, sched_word, sched_block, pix_ctx, seed,
                    st: RasterStatics):
    """Blend sorted pair attrs into per-tile (8, 256) outputs.

    attrs: (16, P) f32 pair-ordered (rows per st.model — ops/response.py),
      P a multiple of st.chunk.
    sched_word/sched_block: (S,) i32 packed blend schedule (ops/binning.py).
    pix_ctx: (T, 8, 256) per-tile pixel context (gut3d/clip models) or None.
    seed: (1,) i32 stochastic sample seed or None.
    Returns (T, 8, 256): rows 0-2 rgb, row 3 transmittance, 4-7 aux. Tiles
    with zero pairs are NOT written — callers mask with seg_counts
    (assemble_image does).
    """
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    args = [seed, sched_word, sched_block, attrs]
    if USES_PIX_CTX[st.model]:
        args.append(pix_ctx)
    return _fwd_call(st, attrs.shape[1], sched_word.shape[0])(*args)


def _rt_fwd(attrs, sched_word, sched_block, pix_ctx, seed, st):
    out = rasterize_tiles(attrs, sched_word, sched_block, pix_ctx, seed, st)
    return out, (attrs, sched_word, sched_block, pix_ctx, seed, out)


def _rt_bwd(st, res, g):
    from vk_gaussian_splatting_tpu.ops.response import PIXEL_COLOR_FNS
    if st.model in COLOR_FNS or st.model in PIXEL_COLOR_FNS:
        # packed layouts carry bit patterns; interpolated-attribute mesh
        # models are a compositing prepass — neither is differentiated
        raise NotImplementedError(
            "this response model is forward-only; use pair_format='f32' "
            "splat models for training")
    (attrs, sched_word, sched_block, pix_ctx, seed, out) = res
    # Backward context per tile from the saved forward output:
    #   S_total = rgb_out . g_rgb ; gt_tn = g_T * T_final
    g_rgb = g[:, 0:3, :]
    s_total = jnp.sum(out[:, 0:3, :] * g_rgb, axis=1, keepdims=True)
    gt_tn = g[:, 3:4, :] * out[:, 3:4, :]
    pad = jnp.zeros((g.shape[0], OUT_COLS - 5, PIX), jnp.float32)
    ctx = jnp.concatenate([g_rgb, s_total, gt_tn, pad], axis=1)
    # unwritten (empty) tiles may hold garbage in the fwd output; idle steps
    # alias tile 0 after the max(), so accumulate instead of .set
    traw = sched_word >> 17
    tile_of = jnp.where(traw == 0x3FFF, -1, traw)
    written = jnp.zeros((g.shape[0],), jnp.int32).at[
        jnp.maximum(tile_of, 0)].add((tile_of >= 0).astype(jnp.int32))
    ctx = jnp.where((written > 0)[:, None, None], ctx, 0.0)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    zeros = jnp.zeros_like(attrs)  # aliased into d_attrs (RMW base)
    args = [seed, sched_word, sched_block, attrs, ctx, zeros]
    if USES_PIX_CTX[st.model]:
        args.append(pix_ctx)
    d_attrs = _bwd_call(st, attrs.shape[1], sched_word.shape[0])(*args)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    d_pix = None if pix_ctx is None else jnp.zeros_like(pix_ctx)
    d_seed = None if res[4] is None else f0(seed)
    return (d_attrs, f0(sched_word), f0(sched_block), d_pix, d_seed)


rasterize_tiles.defvjp(_rt_fwd, _rt_bwd)


def rasterize_bins(bins, pix_ctx, seed, st: RasterStatics):
    """Convenience wrapper over a TileBins schedule."""
    return rasterize_tiles(bins.attrs, bins.sched_word, bins.sched_block,
                           pix_ctx, seed, st)


def assemble_image(out: jax.Array, seg_counts: jax.Array,
                   tiles_x: int, tiles_y: int,
                   width: int, height: int, background=(0.0, 0.0, 0.0),
                   with_aux: bool = False):
    """(T, 8, 256) tile blocks -> (H, W, 3) image + (H, W) transmittance
    (+ picked depth and splat id when with_aux).

    Tiles with zero pairs were never written by the pair kernel; mask them to
    the empty result (rgb 0, T 1, no pick) before reshaping. The bucket
    kernel writes every tile — pass seg_counts=None to skip masking.
    """
    if seg_counts is not None:
        empty = jnp.concatenate(
            [jnp.zeros((3, PIX), jnp.float32),
             jnp.ones((1, PIX), jnp.float32),
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
    # wide-id layouts carry (lo, hi) in rows 5-6 (id = hi * 4096 + lo);
    # single-row layouts leave row 6 zero, so the reconstruction is shared.
    # Combine in INTEGER space: each row is f32-exact but their f32 SUM
    # rounds to even above 2^24 (the bound this encoding removes)
    splat_id = (full[:height, :width, 5].astype(jnp.int32)
                + 4096 * full[:height, :width, 6].astype(jnp.int32))
    return img, trans, depth, splat_id
