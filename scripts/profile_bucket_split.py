"""Isolate bucket-kernel cost components by disabling pieces (dev tool)."""
import sys
import time

import jax
import jax.numpy as jnp

import vk_gaussian_splatting_tpu.ops.raster_bucket as rb
from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.ops.bucket_grid import bucket_splats
from vk_gaussian_splatting_tpu.ops.projection import project_splats
from vk_gaussian_splatting_tpu.render.pipelines import (
    gs_attr_rows,
    raster_statics,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"  # full|nosort|nochunk
CAPS = tuple(int(x) for x in sys.argv[2].split(",")) if len(sys.argv) > 2 \
    else (384, 128, 128, 128)

if MODE in ("nosort", "fixed"):
    rb._bitonic_stage = lambda *a, **k: None

cfg = RenderConfig(width=1920, height=1080, sh_degree=3)
splats = random_splats(jax.random.key(0), 1_000_000, sh_degree=3, extent=4.0,
                       scale_range=(-5.5, -3.5))
prepared = splats.prepare()
cam = look_at([0, 0, -7], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height,
              fov_y_rad=0.9)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def t(fn, *a, n=5):
    for _ in range(2):
        sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*a))
    return (time.perf_counter() - t0) / n * 1e3


tx, ty = cfg.width // 16, cfg.height // 16
proj = jax.block_until_ready(
    jax.jit(lambda p, c: project_splats(p, c, cfg))(prepared, cam))
rows = jax.block_until_ready(jax.jit(gs_attr_rows)(proj))
bins = jax.block_until_ready(
    jax.jit(lambda p, r: bucket_splats(p, r, tiles_x=tx, tiles_y=ty,
                                       caps=CAPS))(proj, rows))
st = raster_statics(cfg, interpret=False)
if MODE in ("nochunk", "fixed"):
    st = __import__("dataclasses").replace(st, min_transmittance=1e30)
rast_j = jax.jit(lambda b: rasterize_buckets_local(b))


def rasterize_buckets_local(b):
    return rb.rasterize_buckets(b, None, None, st, CAPS)


print(MODE, CAPS, "kernel ms:", t(rast_j, bins), flush=True)
# baseline overhead measure: trivial jit
trivial = jax.jit(lambda b: jnp.sum(b.attrs[0, :128]))
print("dispatch overhead ms:", t(trivial, bins), flush=True)
