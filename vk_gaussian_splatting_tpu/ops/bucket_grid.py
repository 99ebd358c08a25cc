"""Bucket-grid binning: exact fine tiles + shifted class-pyramid windows.

The round-1 rasterizer materialized every (splat, tile) pair and sorted ~8-16M
rows by (tile, depth) — one ``lax.sort`` was ~125 ms of the ~197 ms 1080p/1M
frame (the TPU analog of the reference's vrdx radix sort over pair keys,
3rdparty/vrdx/src/vk_radix_sort.cc:60-418). This module replaces pair
expansion with a class-pyramid binning whose sort stays O(N):

- **fine class** (screen radius r < 8 px — the bulk of a trained scene): a
  splat's extent rect spans at most 2x2 tiles, so it is duplicated into
  EXACTLY its covered tile buckets via 4 static slot streams (unused slots
  carry a sentinel bucket). A tile's fine candidates are then exactly the
  splats that touch it — ONE contiguous span, no window amplification;
- **mid / coarse classes** (r < 32 / < 128 px): buckets are overlapping
  CELL PAIRS of a HALF-CELL-SHIFTED grid (64 / 256 px cells, cell j covers
  [c*j - c/2, c*j + c/2)); pair bucket (row, p) holds every splat whose
  center lies in cells {p, p+1} of that row, so a splat duplicates into the
  two pairs {j-1, j} (2 of the 4 slot streams). Because tile origins are
  16-aligned and r < c/2, the dilated tile rect always spans exactly cells
  {16*tx // c, +1} x {16*ty // c, +1} — i.e. pair bucket (jy, jx) and
  (jy+1, jx): each tile reads its mid/coarse window as 2 SINGLE-BUCKET
  spans. A single bucket is one depth-sorted run, which is what lets the
  tile kernel replace its full bitonic sort with the odd-even merge tree
  (ops/raster_bucket._oem_schedule);
- **global class** (the rest): one bucket read by every tile.

ONE ``lax.sort`` of the 4N slot rows by (bucket, view depth) carries the
render attribute rows as payloads; per-bucket segments are depth-sorted runs.
The tile kernel (ops/raster_bucket.py) DMAs, per tile, its 6 single-bucket
spans (fine + 2 mid pairs + 2 coarse pairs + global), each decomposed into
pow2 chunks so ANY x128 cap stays on the Batcher odd-even merge tree
(raster_bucket._decompose), merges the sorted runs into depth order in
VMEM, then blends front-to-back.

Per-span capacity is static (VMEM sizing); spans that exceed their cap
truncate their depth tail and raise ``overflow`` — same contract as the
round-1 slot ladder.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from vk_gaussian_splatting_tpu.ops.binning import _key_sort, tile_rect
from vk_gaussian_splatting_tpu.ops.projection import ProjectedSplats

# pyramid cell sizes (px); class radius bound = cell/2 (fine bound = 8 px
# comes from the 2x2-tile coverage bound of the exact duplication)
CLASS_CELL_PX = (16, 64, 256)
FINE_R_BOUND = 8.0
CLASS_R_BOUNDS = (FINE_R_BOUND, 32.0, 128.0)
NUM_SPANS = 6  # fine + 2 mid rows + 2 coarse rows + global
NUM_SLOTS = 4  # fine-class duplication streams


@dataclasses.dataclass(frozen=True)
class BucketGridSpec:
    """Static geometry of the class pyramid for a given image size."""

    tiles_x: int
    tiles_y: int
    dims: tuple          # class 0: (tiles_x, tiles_y); classes 1-2:
                         # (x-pairs, cell-rows) of the shifted pair grid
    cells_x: tuple       # classes 1-2: shifted CELL count per row (pairs+1)
    offsets: tuple       # linear bucket offset per class + (global, invalid)
    num_buckets: int     # total buckets incl. global + trailing invalid

    @staticmethod
    def build(tiles_x: int, tiles_y: int) -> "BucketGridSpec":
        w, h = tiles_x * 16, tiles_y * 16
        dims = [(tiles_x, tiles_y)]  # fine = the tile grid itself (exact)
        cells_x = [tiles_x]
        for cell in CLASS_CELL_PX[1:]:
            # shifted cells 0..gc-1 cover centers in [-cell/2, w + cell/2);
            # buckets are the gc-1 overlapping pairs {p, p+1}
            gc = -(-w // cell) + 1
            cells_x.append(gc)
            dims.append((gc - 1, -(-h // cell) + 1))
        offs = [0]
        for gx, gy in dims:
            offs.append(offs[-1] + gx * gy)
        n = offs[-1] + 1  # + global bucket
        return BucketGridSpec(tiles_x=tiles_x, tiles_y=tiles_y,
                              dims=tuple(dims), cells_x=tuple(cells_x),
                              offsets=tuple(offs),
                              num_buckets=n + 1)  # + invalid sentinel


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BucketBins:
    """Depth-sorted per-bucket splat attribute segments (4N slot rows).

    attrs is BLOCK-TILED: (4N_pad/128, R, 128) — lane-block-major so a
    128-aligned span slice is ONE contiguous HBM region. The row-major
    (R, 4N_pad) layout made every span DMA 16 strided 2-4 KB reads
    (row stride = the whole array width); measured on chip, that left the
    tile kernel ~92% DMA-bound (254 of 277 ms with merge AND blend
    disabled). Column i of logical row r lives at
    attrs[i // 128, r, i % 128]."""

    attrs: jax.Array          # (4N_pad/128, R, 128) in (bucket, depth) order
    bucket_starts: jax.Array  # (num_buckets + 1,) i32 segment starts
    num_valid: jax.Array      # () i32 live slot rows
    overflow: jax.Array       # () bool — some tile window exceeds its cap


def assign_buckets(proj: ProjectedSplats, spec: BucketGridSpec) -> jax.Array:
    """(4, N) i32 slot-stream bucket ids (sentinel = unused slot).

    Fine splats occupy up to 4 slots — one per covered tile (their rect spans
    at most 2x2 tiles since r < 8). Mid/coarse splats occupy slots 0-1 with
    the two overlapping pair buckets {jx-1, jx} of their shifted-grid cell
    (one at a grid edge); global splats occupy slot 0. The shifted grids
    cover centers in [-cell/2, W + cell/2) so no clamping distortion
    occurs."""
    sentinel = spec.num_buckets - 1
    r = proj.radius.max(axis=1)
    x, y = proj.xy[:, 0], proj.xy[:, 1]
    # extent rect must intersect the screen: the projection cull keeps a
    # frustum-dilation margin of off-screen centers (dist.comp.slang:64-90),
    # and without this check every such mid/coarse splat clamps into an EDGE
    # cell — measured 15K-candidate edge spans at 6.2M splats
    w_px = spec.tiles_x * 16
    h_px = spec.tiles_y * 16
    rx, ry = proj.radius[:, 0], proj.radius[:, 1]
    onscreen = ((x + rx > 0) & (x - rx < w_px)
                & (y + ry > 0) & (y - ry < h_px))
    valid = proj.valid & (r > 0) & onscreen

    # fine: exact covered-tile rectangle [x0,x1) x [y0,y1), <= 2x2
    x0, y0, x1, y1 = tile_rect(proj.xy, proj.radius, 16,
                               spec.tiles_x, spec.tiles_y)
    fine = valid & (r < FINE_R_BOUND) & (x1 > x0) & (y1 > y0)

    # slots 0-1 for non-fine classes: the two x-pair buckets, coarsest first
    b0 = jnp.full(r.shape, spec.offsets[3], jnp.int32)  # global class
    b1 = jnp.full(r.shape, sentinel, jnp.int32)
    for c in (2, 1):
        gp, gy = spec.dims[c]
        gc = spec.cells_x[c]
        cell = CLASS_CELL_PX[c]
        jx = jnp.clip(jnp.floor((x + cell / 2) / cell).astype(jnp.int32),
                      0, gc - 1)
        jy = jnp.clip(jnp.floor((y + cell / 2) / cell).astype(jnp.int32),
                      0, gy - 1)
        base = spec.offsets[c] + jy * gp
        p0_ok = jx - 1 >= 0
        p1_ok = jx <= gp - 1
        s0 = jnp.where(p0_ok, jx - 1, jx)
        in_c = r < CLASS_R_BOUNDS[c]
        b0 = jnp.where(in_c, base + s0, b0)
        b1 = jnp.where(in_c & p0_ok & p1_ok, base + jx, b1)

    def fine_tile(tx, ty, use):
        ok = fine & use & (tx < x1) & (ty < y1)
        return jnp.where(ok, ty * spec.tiles_x + tx, sentinel)

    ones = jnp.ones_like(x0, dtype=bool)
    slots = jnp.stack([
        jnp.where(fine, fine_tile(x0, y0, ones), jnp.where(valid, b0,
                                                           sentinel)),
        jnp.where(fine, fine_tile(jnp.minimum(x0 + 1, x1 - 1), y0,
                                  x1 > x0 + 1),
                  jnp.where(valid, b1, sentinel)),
        fine_tile(x0, jnp.minimum(y0 + 1, y1 - 1), y1 > y0 + 1),
        fine_tile(jnp.minimum(x0 + 1, x1 - 1), jnp.minimum(y0 + 1, y1 - 1),
                  (x1 > x0 + 1) & (y1 > y0 + 1)),
    ], axis=0)
    return slots


def window_span_table(spec: BucketGridSpec) -> jax.Array:
    """(T, 6, 2) i32 (start_bucket, end_bucket) window spans per tile.

    Span 0: the tile's own fine bucket; 1-2: mid window rows; 3-4: coarse
    window rows; 5: global. Each window row = ONE pair bucket (the 2x2-cell
    window's x-pair), i.e. every span is a single depth-sorted bucket run.
    Static per image size."""
    t = jnp.arange(spec.tiles_x * spec.tiles_y, dtype=jnp.int32)
    tx = t % spec.tiles_x
    ty = t // spec.tiles_x
    cols = [jnp.stack([t, t + 1], axis=-1)]  # fine: bucket t exactly
    for c in (1, 2):
        gp, gy = spec.dims[c]
        jx = jnp.minimum(tx * 16 // CLASS_CELL_PX[c], gp - 1)
        jy = ty * 16 // CLASS_CELL_PX[c]
        for dy in (0, 1):
            row = jy + dy
            ok = row < gy
            base = spec.offsets[c] + jnp.clip(row, 0, gy - 1) * gp
            s = base + jx
            e = jnp.where(ok, s + 1, s)
            cols.append(jnp.stack([s, e], axis=-1))
    g = jnp.full((t.shape[0], 2), spec.offsets[3], jnp.int32)
    g = g.at[:, 1].add(1)
    cols.append(g)
    return jnp.stack(cols, axis=1)


def span_lengths(bucket_starts: jax.Array, spec: BucketGridSpec) -> jax.Array:
    """(T, 6) i32 candidate count per window span."""
    spans = window_span_table(spec)
    return bucket_starts[spans[:, :, 1]] - bucket_starts[spans[:, :, 0]]


def cap_vector(caps: tuple) -> jnp.ndarray:
    return jnp.asarray([caps[0]] + [caps[1]] * 2 + [caps[2]] * 2 + [caps[3]],
                       jnp.int32)


def required_window_caps(bucket_starts: jax.Array,
                         spec: BucketGridSpec) -> jax.Array:
    """(4,) i32 per-class capacity requirement: the max over tiles of
    span length + DMA-alignment head (``start % 128`` — the kernel rounds
    each span's DMA start down to a 128 multiple and masks the head, so the
    head counts against capacity). Independent of any chosen caps — use it
    to SIZE them (fit_caps)."""
    spans = window_span_table(spec)
    starts = bucket_starts[spans[:, :, 0]]
    need = bucket_starts[spans[:, :, 1]] - starts + starts % 128
    return jnp.stack([need[:, 0].max(), need[:, 1:3].max(),
                      need[:, 3:5].max(), need[:, 5].max()])


def measure_required_caps(proj: ProjectedSplats,
                          spec: BucketGridSpec) -> jax.Array:
    """(4,) i32 requirement for one projected frame, without carrying the
    binning's payload rows: bucket occupancy only needs the sorted slot ids.

    Histogram via sort + searchsorted, NOT jnp.bincount: XLA lowers bincount
    to a serialized scatter-add (4M sequential updates on TPU — observed
    stalling the measurement for tens of minutes), while a single-key i32
    sort is milliseconds."""
    slots = jnp.sort(assign_buckets(proj, spec).reshape(-1))
    starts = jnp.searchsorted(
        slots, jnp.arange(spec.num_buckets + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    return required_window_caps(starts, spec)


def fit_caps(required, margin: float = 1.25) -> tuple:
    """Static per-class caps from measured requirements (host-side).

    Each cap is the smallest x128 multiple whose 128-unit count has at most
    TWO set bits and that is >= margin * required (>= 128): such a cap
    decomposes into <=2 pow2 merge runs (raster_bucket._decompose), keeping
    the odd-even merge tree while wasting far fewer lanes than pow2
    rounding (e.g. required 434 -> 640 = 512+256... = 512+128, not 1024).
    The margin is the headroom the round-3 bench lacked (fine spans
    measured 495-516 against a 512 cap — one boundary frame killed the
    whole artifact)."""
    caps = []
    for r in required:
        u = max(1, -(-int(float(r) * margin) // 128))
        while bin(u).count("1") > 2:
            u += 1
        caps.append(128 * u)
    return tuple(caps)


def window_overflow(bucket_starts: jax.Array, spec: BucketGridSpec,
                    caps: tuple) -> jax.Array:
    """True if any tile's window span exceeds its class cap (coverage
    truncates — the analog of the slot ladder's overflow flag).

    The kernel rounds each span's DMA start down to a 128 multiple and masks
    the head lanes, so a span effectively holds cap - (start % 128) live
    candidates."""
    return jnp.any(required_window_caps(bucket_starts, spec)
                   > jnp.asarray(caps, jnp.int32))


def _bucket_impl(proj, attr_rows, *, spec: BucketGridSpec, caps: tuple,
                 depth_override=None, pad_rows_to: int = 16):
    n = proj.xy.shape[0]
    r = attr_rows.shape[0]
    slots = assign_buckets(proj, spec)                       # (4, N)
    depth = proj.depth if depth_override is None else depth_override
    bucket = slots.reshape(-1)                               # (4N,)
    dkey = jnp.where(bucket < spec.num_buckets - 1,
                     jnp.tile(depth, NUM_SLOTS), jnp.inf)
    rows4 = tuple(jnp.tile(row, NUM_SLOTS) for row in attr_rows)

    (b_s, _), rows_s = _key_sort((bucket, dkey), rows4, is_stable=False)

    # trailing DMA-overrun pad: spans clamp nothing — the pad guarantees a
    # cap-length copy from any live start never reads past the array
    pad = max(caps)
    n4 = NUM_SLOTS * n
    p_total = -(-(n4 + pad) // 128) * 128
    parts = [jnp.stack(rows_s, axis=0)]
    if r < pad_rows_to:
        parts.append(jnp.zeros((pad_rows_to - r, n4), jnp.float32))
    attrs = jnp.concatenate(parts, axis=0)
    attrs = jnp.pad(attrs, ((0, 0), (0, p_total - n4)))
    # block-tile for contiguous span DMAs (see BucketBins docstring)
    attrs = attrs.reshape(pad_rows_to, p_total // 128, 128).transpose(1, 0, 2)

    bucket_starts = jnp.searchsorted(
        b_s, jnp.arange(spec.num_buckets + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    num_valid = bucket_starts[spec.num_buckets - 1]
    overflow = window_overflow(bucket_starts, spec, caps)
    return BucketBins(attrs=attrs, bucket_starts=bucket_starts,
                      num_valid=num_valid, overflow=overflow)


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "caps", "rows_to"))
def bucket_splats(proj: ProjectedSplats, attr_rows: jax.Array, *,
                  tiles_x: int, tiles_y: int,
                  caps: tuple = (512, 256, 512, 256),
                  depth_override: jax.Array | None = None,
                  rows_to: int = 16) -> BucketBins:
    """Bucket + depth-sort splats for the neighborhood tile kernel.

    attr_rows: (R<=16, N) per-splat attribute rows (layouts of
    ops/response.py; the last row is the splat id by convention).
    caps: per-class window-span capacities (fine, mid-row, coarse-row,
    global) — the kernel's static VMEM budget per span; multiples of 128.
    depth_override: alternative per-splat sort depth (e.g. radial distance
    for the 3DGRT shared-origin order).
    rows_to: sublane count of the output attrs array — must match
    raster_bucket.buf_rows(model) (8 for narrow packed layouts halves the
    kernel's roll/DMA cost).
    """
    spec = BucketGridSpec.build(tiles_x, tiles_y)
    return _bucket_impl(proj, attr_rows, spec=spec, caps=caps,
                        depth_override=depth_override, pad_rows_to=rows_to)
