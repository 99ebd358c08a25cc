"""On-chip cost split of bucket binning + span occupancy stats (dev tool).

Prints: assign_buckets / key-build / sort / pad+searchsorted timings and the
per-class span-length distribution (for caps tuning) on the bench scene.
Usage: profile_binning.py [n_splats] [caps]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.ops.binning import _key_sort
from vk_gaussian_splatting_tpu.ops.bucket_grid import (
    NUM_SLOTS,
    BucketGridSpec,
    assign_buckets,
    bucket_splats,
    span_lengths,
)
from vk_gaussian_splatting_tpu.ops.projection import project_splats
from vk_gaussian_splatting_tpu.render.pipelines import gs_attr_rows
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CAPS = tuple(int(x) for x in sys.argv[2].split(",")) if len(sys.argv) > 2 \
    else (384, 128, 128, 128)

cfg = RenderConfig(width=1920, height=1080, sh_degree=3)
splats = random_splats(jax.random.key(0), N, sh_degree=3, extent=4.0,
                       scale_range=(-5.5, -3.5))
prepared = splats.prepare()
cam = look_at([0, 0, -7], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height,
              fov_y_rad=0.9)
tx, ty = cfg.width // 16, cfg.height // 16
spec = BucketGridSpec.build(tx, ty)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def t(fn, *a, n=5):
    for _ in range(2):
        sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*a))
    return (time.perf_counter() - t0) / n * 1e3


proj = jax.block_until_ready(
    jax.jit(lambda p, c: project_splats(p, c, cfg))(prepared, cam))
rows = jax.block_until_ready(jax.jit(gs_attr_rows)(proj))

assign_j = jax.jit(lambda p: assign_buckets(p, spec))
print("assign ms:", t(assign_j, proj), flush=True)
slots = jax.block_until_ready(assign_j(proj))


@jax.jit
def keys_only_sort(slots, depth):
    bucket = slots.reshape(-1)
    dkey = jnp.where(bucket < spec.num_buckets - 1,
                     jnp.tile(depth, NUM_SLOTS), jnp.inf)
    (b_s, _), _ = _key_sort((bucket, dkey), ())
    return b_s


@jax.jit
def full_sort(slots, depth, rows):
    bucket = slots.reshape(-1)
    dkey = jnp.where(bucket < spec.num_buckets - 1,
                     jnp.tile(depth, NUM_SLOTS), jnp.inf)
    rows4 = tuple(jnp.tile(r, NUM_SLOTS) for r in rows)
    (b_s, _), rs = _key_sort((bucket, dkey), rows4)
    return b_s, rs


@jax.jit
def single_key_sort(slots, depth, rows):
    # fused i32 key: bucket(14b) << 17 | depth-rank(17b quantized)
    bucket = slots.reshape(-1)
    d = jnp.tile(depth, NUM_SLOTS)
    db = jax.lax.bitcast_convert_type(d, jnp.uint32)
    neg = db >= jnp.uint32(1 << 31)
    dq = jax.lax.shift_right_logical(
        jnp.where(neg, ~db, db | jnp.uint32(1 << 31)),
        jnp.uint32(15)).astype(jnp.int32)
    key = bucket * (1 << 17) + jnp.where(
        bucket < spec.num_buckets - 1, dq, 0)
    rows4 = tuple(jnp.tile(r, NUM_SLOTS) for r in rows)
    (k_s,), rs = _key_sort((key,), rows4)
    return k_s, rs


print("keys-only 2-key sort ms:", t(keys_only_sort, slots, proj.depth),
      flush=True)
print("full 2-key sort +11 rows ms:", t(full_sort, slots, proj.depth,
                                        tuple(rows)), flush=True)
print("single fused key +11 rows ms:", t(single_key_sort, slots, proj.depth,
                                         tuple(rows)), flush=True)

bin_j = jax.jit(lambda p, r: bucket_splats(p, r, tiles_x=tx, tiles_y=ty,
                                           caps=CAPS))
print("total binning ms:", t(bin_j, proj, rows), flush=True)
bins = jax.block_until_ready(bin_j(proj, rows))

lens = np.asarray(jax.jit(
    lambda b: span_lengths(b, spec))(bins.bucket_starts))
heads = np.asarray(bins.bucket_starts)
names = ["fine", "mid0", "mid1", "coarse0", "coarse1", "global"]
print(f"overflow at caps {CAPS}: {bool(bins.overflow)}")
for i, nm in enumerate(names):
    li = lens[:, i]
    print(f"span {nm:8s}: mean {li.mean():8.1f}  p90 {np.percentile(li, 90):6.0f}"
          f"  p99 {np.percentile(li, 99):6.0f}  p99.9 {np.percentile(li, 99.9):6.0f}"
          f"  max {li.max():6.0f}", flush=True)
tot = lens.sum(axis=1)
print(f"window total: mean {tot.mean():.0f}  p99 {np.percentile(tot, 99):.0f}"
      f"  max {tot.max()}")
