"""On-chip stage profile of the bucket rasterizer at 1080p/1M (dev tool)."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.ops.bucket_grid import bucket_splats
from vk_gaussian_splatting_tpu.ops.projection import project_splats
from vk_gaussian_splatting_tpu.ops.raster_bucket import rasterize_buckets
from vk_gaussian_splatting_tpu.render.pipelines import (
    gs_attr_rows,
    gs_attr_rows_packed,
    raster_statics,
    render_3dgs,
)
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
proj_j = jax.jit(lambda p, c: project_splats(p, c, cfg))
print("project ms:", t(proj_j, prepared, cam), flush=True)
proj = jax.block_until_ready(proj_j(prepared, cam))
rows = jax.block_until_ready(jax.jit(gs_attr_rows)(proj))

bin_j = jax.jit(lambda p, r: bucket_splats(p, r, tiles_x=tx, tiles_y=ty,
                                           caps=CAPS))
print("bucket bin ms:", t(bin_j, proj, rows), flush=True)
bins = jax.block_until_ready(bin_j(proj, rows))
print("overflow:", bool(bins.overflow), "n_valid:", int(bins.num_valid),
      flush=True)

st = raster_statics(cfg, interpret=False)
rast_j = jax.jit(lambda b: rasterize_buckets(b, None, None, st, CAPS))
print("bucket kernel ms:", t(rast_j, bins), flush=True)

bcfg = cfg.replace(raster=dataclasses.replace(cfg.raster, method="bucket",
                                              bucket_caps=CAPS))
full = jax.jit(lambda p, c: render_3dgs(p, c, bcfg))
print("full bucket frame ms:", t(full, prepared, cam), flush=True)

# packed variant
pcfg = bcfg.replace(raster=dataclasses.replace(bcfg.raster,
                                               pair_format="packed"))
fullp = jax.jit(lambda p, c: render_3dgs(p, c, pcfg))
print("full bucket packed frame ms:", t(fullp, prepared, cam), flush=True)

# packed per-stage split
from vk_gaussian_splatting_tpu.render.pipelines import gs_attr_rows_packed
from vk_gaussian_splatting_tpu.ops.raster_bucket import buf_rows
st_p = dataclasses.replace(st, model="gs2dp")
rows_p = jax.block_until_ready(jax.jit(gs_attr_rows_packed)(proj))
bin_jp = jax.jit(lambda p, r: bucket_splats(p, r, tiles_x=tx, tiles_y=ty,
                                            caps=CAPS,
                                            rows_to=buf_rows("gs2dp")))
print("packed bin ms:", t(bin_jp, proj, rows_p), flush=True)
bins_p = jax.block_until_ready(bin_jp(proj, rows_p))
print("packed attrs shape:", bins_p.attrs.shape, flush=True)
rastp_j = jax.jit(lambda b: rasterize_buckets(b, None, None, st_p, CAPS))
print("packed kernel ms:", t(rastp_j, bins_p), flush=True)
