"""Bucket-grid binning: shifted class-pyramid buckets + 2x2 tile windows.

The round-1 rasterizer materialized every (splat, tile) pair and sorted ~8-16M
rows by (tile, depth) — one ``lax.sort`` was ~125 ms of the ~197 ms 1080p/1M
frame (the TPU analog of the reference's vrdx radix sort over pair keys,
3rdparty/vrdx/src/vk_radix_sort.cc:60-418). This module replaces pair
expansion entirely with a binning that sorts only N splat rows:

1. every splat is assigned to exactly ONE bucket of a class pyramid chosen by
   its screen-space radius r:
     class 0: r <   8 px -> 16 px cells     class 2: r < 128 px -> 256 px cells
     class 1: r <  32 px -> 64 px cells     class 3: the rest   -> one global bucket
   Cells are HALF-CELL SHIFTED: class-c cell j covers [c*j - c/2, c*j + c/2).
   Because tile origins are 16-aligned, c is a multiple of 16, and r < c/2,
   the dilated tile rect [16*tx - r, 16*tx + 16 + r) always spans EXACTLY the
   two cells {16*tx // c, 16*tx // c + 1} per axis — so a tile's candidate
   window is always 2x2 cells (one global list for class 3), never 3x3. The
   fine-class window is a 32x32 px region, which makes the expected per-tile
   candidate count equal to the live-pair count of pair expansion — the blend
   load does not grow, the P-row pair sort disappears;
2. ONE ``lax.sort`` of N rows by (bucket, view depth) carries the render
   attribute rows as payloads — per-bucket segments are depth-sorted runs;
3. the tile kernel (ops/raster_bucket.py) DMAs, per tile, the 7 contiguous
   row-spans of its windows (each window row = 2 adjacent cells = contiguous
   in the cy-major cell order), merges the candidates into depth order in
   VMEM (exact bitonic compare-exchange), and blends front-to-back.

Per-span capacity is static (VMEM sizing); spans that exceed their cap
truncate their tail (the far half of the second cell first) and raise
``overflow`` — same contract as the slot ladder (ops/binning.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from vk_gaussian_splatting_tpu.ops.binning import _key_sort
from vk_gaussian_splatting_tpu.ops.projection import ProjectedSplats

# class cell sizes (px); radius bound per class = cell/2 (coverage proof above)
CLASS_CELL_PX = (16, 64, 256)
CLASS_R_BOUNDS = tuple(c / 2.0 for c in CLASS_CELL_PX)
NUM_SPANS = 7  # 2 window rows x 3 pyramid classes + the global bucket


@dataclasses.dataclass(frozen=True)
class BucketGridSpec:
    """Static geometry of the class pyramid for a given image size."""

    tiles_x: int
    tiles_y: int
    dims: tuple          # ((gx0,gy0),(gx1,gy1),(gx2,gy2)) cells per class
    offsets: tuple       # linear bucket offset per class + (global, invalid)
    num_buckets: int     # total buckets incl. global + trailing invalid

    @staticmethod
    def build(tiles_x: int, tiles_y: int) -> "BucketGridSpec":
        w, h = tiles_x * 16, tiles_y * 16
        dims = []
        for cell in CLASS_CELL_PX:
            # shifted cells 0..gx-1 cover centers in [-cell/2, w + cell/2)
            dims.append((-(-w // cell) + 1, -(-h // cell) + 1))
        offs = [0]
        for gx, gy in dims:
            offs.append(offs[-1] + gx * gy)
        n = offs[-1] + 1  # + global bucket
        return BucketGridSpec(tiles_x=tiles_x, tiles_y=tiles_y,
                              dims=tuple(dims), offsets=tuple(offs),
                              num_buckets=n + 1)  # + invalid sentinel


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BucketBins:
    """Depth-sorted per-bucket splat attribute segments."""

    attrs: jax.Array          # (16, N_pad) rows in (bucket, depth) order
    bucket_starts: jax.Array  # (num_buckets + 1,) i32 segment starts
    num_valid: jax.Array      # () i32 live splats
    overflow: jax.Array       # () bool — some tile window exceeds its cap


def assign_buckets(proj: ProjectedSplats, spec: BucketGridSpec) -> jax.Array:
    """(N,) i32 linear bucket id per splat (invalid -> trailing sentinel).

    Centers may sit off-screen by up to their radius (< cell/2); the shifted
    grids cover [-cell/2, W + cell/2) so no clamping distortion occurs."""
    r = proj.radius.max(axis=1)
    x, y = proj.xy[:, 0], proj.xy[:, 1]
    bucket = jnp.full(r.shape, spec.offsets[3], jnp.int32)  # global class
    for c in range(2, -1, -1):
        gx, gy = spec.dims[c]
        cell = CLASS_CELL_PX[c]
        jx = jnp.clip(jnp.floor((x + cell / 2) / cell).astype(jnp.int32),
                      0, gx - 1)
        jy = jnp.clip(jnp.floor((y + cell / 2) / cell).astype(jnp.int32),
                      0, gy - 1)
        bucket = jnp.where(r < CLASS_R_BOUNDS[c],
                           spec.offsets[c] + jy * gx + jx, bucket)
    return jnp.where(proj.valid & (r > 0), bucket, spec.num_buckets - 1)


def window_span_table(spec: BucketGridSpec) -> jax.Array:
    """(T, 7, 2) i32 (start_bucket, end_bucket) window spans per tile.

    Spans 0-1: fine rows, 2-3: mid rows, 4-5: coarse rows, 6: global. Each
    window row = 2 adjacent cells of the shifted grid = one contiguous bucket
    range. Static per image size. Rows falling outside a grid produce empty
    spans (start == end)."""
    t = jnp.arange(spec.tiles_x * spec.tiles_y, dtype=jnp.int32)
    tx = t % spec.tiles_x
    ty = t // spec.tiles_x
    cols = []
    for c in range(3):
        gx, gy = spec.dims[c]
        cell_tiles = CLASS_CELL_PX[c] // 16
        jx = tx * 16 // CLASS_CELL_PX[c]
        jy = ty * 16 // CLASS_CELL_PX[c]
        del cell_tiles
        for dy in (0, 1):
            row = jy + dy
            ok = row < gy
            base = spec.offsets[c] + jnp.clip(row, 0, gy - 1) * gx
            s = base + jnp.minimum(jx, gx - 1)
            e = base + jnp.minimum(jx + 2, gx)
            e = jnp.where(ok, e, s)
            cols.append(jnp.stack([s, e], axis=-1))
    g = jnp.full((t.shape[0], 2), spec.offsets[3], jnp.int32)
    g = g.at[:, 1].add(1)
    cols.append(g)
    return jnp.stack(cols, axis=1)


def span_lengths(bucket_starts: jax.Array, spec: BucketGridSpec) -> jax.Array:
    """(T, 7) i32 candidate count per window span."""
    spans = window_span_table(spec)
    return bucket_starts[spans[:, :, 1]] - bucket_starts[spans[:, :, 0]]


def window_overflow(bucket_starts: jax.Array, spec: BucketGridSpec,
                    caps: tuple) -> jax.Array:
    """True if any tile's window span exceeds its class cap (coverage
    truncates — the analog of the slot ladder's overflow flag).

    The kernel rounds each span's DMA start down to a 128 multiple and masks
    the head lanes, so a span effectively holds cap - (start % 128) live
    candidates."""
    spans = window_span_table(spec)
    starts = bucket_starts[spans[:, :, 0]]
    lens = bucket_starts[spans[:, :, 1]] - starts
    cap_vec = jnp.asarray([caps[0]] * 2 + [caps[1]] * 2 + [caps[2]] * 2
                          + [caps[3]], jnp.int32)
    return jnp.any(lens + starts % 128 > cap_vec[None, :])


def _bucket_impl(proj, attr_rows, *, spec: BucketGridSpec, caps: tuple,
                 depth_override=None, pad_rows_to: int = 16):
    n = proj.xy.shape[0]
    r = attr_rows.shape[0]
    bucket = assign_buckets(proj, spec)
    depth = proj.depth if depth_override is None else depth_override
    dkey = jnp.where(bucket < spec.num_buckets - 1, depth, jnp.inf)

    (b_s, _), rows_s = _key_sort((bucket, dkey), tuple(attr_rows),
                                 is_stable=False)

    # trailing DMA-overrun pad: spans clamp their start to N_pad - cap, so a
    # cap-length copy never reads past the array
    pad = max(caps)
    p_total = -(-(n + pad) // 128) * 128
    parts = [jnp.stack(rows_s, axis=0)]
    if r < pad_rows_to:
        parts.append(jnp.zeros((pad_rows_to - r, n), jnp.float32))
    attrs = jnp.concatenate(parts, axis=0)
    attrs = jnp.pad(attrs, ((0, 0), (0, p_total - n)))

    bucket_starts = jnp.searchsorted(
        b_s, jnp.arange(spec.num_buckets + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    num_valid = bucket_starts[spec.num_buckets - 1]
    overflow = window_overflow(bucket_starts, spec, caps)
    return BucketBins(attrs=attrs, bucket_starts=bucket_starts,
                      num_valid=num_valid, overflow=overflow)


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "caps"))
def bucket_splats(proj: ProjectedSplats, attr_rows: jax.Array, *,
                  tiles_x: int, tiles_y: int,
                  caps: tuple = (512, 256, 128, 128),
                  depth_override: jax.Array | None = None) -> BucketBins:
    """Bucket + depth-sort splats for the neighborhood tile kernel.

    attr_rows: (R<=16, N) per-splat attribute rows (layouts of
    ops/response.py; the last row is the splat id by convention).
    caps: per-class window-span capacities (fine-row, mid-row, coarse-row,
    global) — the kernel's static VMEM budget per span.
    depth_override: alternative per-splat sort depth (e.g. radial distance
    for the 3DGRT shared-origin order).
    """
    spec = BucketGridSpec.build(tiles_x, tiles_y)
    return _bucket_impl(proj, attr_rows, spec=spec, caps=caps,
                        depth_override=depth_override)
