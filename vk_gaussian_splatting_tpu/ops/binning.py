"""Tile binning: splat -> (tile, depth)-sorted pair lists.

The reference builds per-frame visible-splat lists with GPU atomics + indirect
dispatch (dist.comp.slang:136-153) and draws oriented quads; tile-based
rasterization needs each splat duplicated into every 16x16 tile its extent
covers. TPU/XLA forbids dynamic shapes and atomics, so this module re-expresses
binning as pure, static-shape ops:

1. per-splat tile bounding rectangle + pair count (vectorized)
2. exclusive cumsum -> pair offsets
3. *gather-based expansion*: pair p finds its source splat with a single
   ``searchsorted`` over the offsets (no scatter, no atomics), and decodes its
   within-rect rank into a tile coordinate
4. lexicographic (tile, depth) sort via lax.sort; invalid pairs carry a
   sentinel tile id so they compact to the tail (the vrdx +inf-key padding
   trick, upsweep.slang:37)
5. per-tile segment boundaries via searchsorted

The pair capacity is a static budget; ``overflow`` reports truncation so hosts
can re-render with a bigger budget. Everything is O(P log P) in XLA with no
data-dependent shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.ops.projection import ProjectedSplats


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TileBins:
    """Sorted pair lists + per-tile ranges, chunk-aligned for the Pallas kernel.

    Each tile's segment starts at a multiple of ``chunk`` in the pair arrays
    (Mosaic dynamic DMA slices must be 128-lane aligned); ``seg_counts`` holds
    the *true* pair count, the gap up to the next aligned start is dead space
    masked inside the kernel.
    """

    pair_splat: jax.Array   # (P_aligned,) i32 source splat per pair (aligned order)
    pair_valid: jax.Array   # (P_aligned,) bool — live pair (not alignment padding)
    seg_starts: jax.Array   # (T,) i32 aligned segment starts
    seg_counts: jax.Array   # (T,) i32 true per-tile pair counts
    chunk_tile: jax.Array   # (S,) i32 chunk schedule: owning tile id, -1 = idle
    chunk_rank: jax.Array   # (S,) i32 chunk index within its tile
    chunk_last: jax.Array   # (S,) i32 1 if last chunk of its tile
    num_pairs: jax.Array    # ()   i32 valid pair count (pre-truncation)
    overflow: jax.Array     # ()   bool — pair budget exceeded, tail dropped


def tile_rect(xy: jax.Array, radius: jax.Array, tile_size: int,
              tiles_x: int, tiles_y: int):
    """Per-splat covered tile rectangle [x0,x1) x [y0,y1), clamped to the grid.

    radius: (N, 2) per-axis extent (rect bounding, threedgut.h.slang:155-160;
    isotropic for 3DGS)."""
    rx, ry = radius[:, 0], radius[:, 1]
    x0 = jnp.floor((xy[:, 0] - rx) / tile_size).astype(jnp.int32)
    y0 = jnp.floor((xy[:, 1] - ry) / tile_size).astype(jnp.int32)
    x1 = jnp.floor((xy[:, 0] + rx) / tile_size).astype(jnp.int32) + 1
    y1 = jnp.floor((xy[:, 1] + ry) / tile_size).astype(jnp.int32) + 1
    x0 = jnp.clip(x0, 0, tiles_x)
    y0 = jnp.clip(y0, 0, tiles_y)
    x1 = jnp.clip(x1, 0, tiles_x)
    y1 = jnp.clip(y1, 0, tiles_y)
    return x0, y0, x1, y1


def aligned_capacity(max_pairs: int, num_tiles: int, chunk: int) -> int:
    """Static pair-array capacity after per-tile chunk alignment."""
    cap = max_pairs + num_tiles * chunk
    return -(-cap // chunk) * chunk


@partial(jax.jit, static_argnames=("tile_size", "tiles_x", "tiles_y", "max_pairs",
                                   "chunk", "front_to_back"))
def bin_splats(
    proj: ProjectedSplats,
    *,
    tile_size: int,
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
    chunk: int = 128,
    front_to_back: bool = True,
    depth_override: jax.Array | None = None,
) -> TileBins:
    """depth_override: optional (N,) sort keys replacing view depth — used by
    the host (CPU) sorting path to impose a presorted order
    (SplatSorterAsync, SortMethod.HOST) and by the ray pipelines for radial
    ordering."""
    num_tiles = tiles_x * tiles_y

    # Pre-sort the SPLATS by depth (N elements), so pairs generated in splat
    # order are already depth-ordered; grouping by tile then needs only a
    # *stable single-key* sort over the pairs instead of a two-key
    # lexicographic sort — the dominant cost at scale (P ~ several x N).
    dsrc = proj.depth if depth_override is None else depth_override
    dkey = jnp.where(proj.valid, dsrc if front_to_back else -dsrc, jnp.inf)
    ids0 = jnp.arange(dkey.shape[0], dtype=jnp.int32)
    _, order = jax.lax.sort((dkey, ids0), num_keys=1)        # depth-sorted ids

    x0_, y0_, x1_, y1_ = tile_rect(proj.xy, proj.radius, tile_size,
                                   tiles_x, tiles_y)
    x0, y0, x1, y1 = (a[order] for a in (x0_, y0_, x1_, y1_))
    valid_s = proj.valid[order] & (proj.radius.max(axis=1)[order] > 0)
    w = jnp.maximum(x1 - x0, 0)
    h = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(valid_s, w * h, 0).astype(jnp.int32)

    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    total = starts[-1] + counts[-1]
    overflow = total > max_pairs

    # Expansion by gather: pair p -> source splat via searchsorted over offsets.
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    splat = jnp.searchsorted(starts, p, side="right").astype(jnp.int32) - 1
    splat = jnp.clip(splat, 0, counts.shape[0] - 1)
    rank = p - starts[splat]
    ws = jnp.maximum(w[splat], 1)
    tx = x0[splat] + rank % ws
    ty = y0[splat] + rank // ws
    pair_valid = p < total
    tile = jnp.where(pair_valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    tile_s, splat_sorted = jax.lax.sort((tile, splat), num_keys=1,
                                        is_stable=True)
    splat_s = order[splat_sorted]  # back to original splat indices

    tile_starts = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_counts = tile_starts[1:] - tile_starts[:-1]              # (T,)

    # Re-space segments so every tile starts at a chunk-aligned offset
    # (Mosaic DMA alignment). Pure gather: aligned position q maps back to its
    # source position in the sorted arrays.
    aligned_counts = -(-seg_counts // chunk) * chunk
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_counts)]
    ).astype(jnp.int32)                                          # (T+1,)

    p_out = aligned_capacity(max_pairs, num_tiles, chunk)
    q = jnp.arange(p_out, dtype=jnp.int32)
    seg = jnp.clip(
        jnp.searchsorted(aligned_starts, q, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1,
    )
    rank = q - aligned_starts[seg]
    src = jnp.clip(tile_starts[seg] + rank, 0, max_pairs - 1)
    pair_valid = rank < seg_counts[seg]
    pair_splat = jnp.where(pair_valid, splat_s[src], 0)

    # Chunk schedule for the grid-over-chunks rasterizer: chunk j covers pair
    # rows [j*chunk, (j+1)*chunk); segments partition [0, aligned_total), so a
    # chunk maps to exactly one tile (or -1 when past the end).
    s_chunks = p_out // chunk
    pos = jnp.arange(s_chunks, dtype=jnp.int32) * chunk
    cseg = jnp.clip(
        jnp.searchsorted(aligned_starts, pos, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1,
    )
    c_live = pos < aligned_starts[-1]
    chunk_tile = jnp.where(c_live, cseg, -1)
    chunk_rank = (pos - aligned_starts[cseg]) // chunk
    seg_aligned_end = aligned_starts[cseg] + aligned_counts[cseg]
    chunk_last = (c_live & (pos + chunk >= seg_aligned_end)).astype(jnp.int32)

    return TileBins(
        pair_splat=pair_splat,
        pair_valid=pair_valid,
        seg_starts=aligned_starts[:-1],
        seg_counts=seg_counts,
        chunk_tile=chunk_tile,
        chunk_rank=chunk_rank,
        chunk_last=chunk_last,
        num_pairs=jnp.minimum(total, max_pairs),
        overflow=overflow,
    )
