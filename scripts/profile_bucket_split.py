"""Isolate bucket-kernel cost components by disabling pieces (dev tool).

Modes map onto the kernel's compile-time VKGS_ABLATE knob (one combo per
process — the pallas_call builders are lru_cached):
  full    = no ablation
  nosort  = merge stages removed      (VKGS_ABLATE=merge)
  nochunk = blend chunks removed      (VKGS_ABLATE=blend)
  fixed   = both removed              (VKGS_ABLATE=merge,blend)
The old in-process tricks (monkeypatching _bitonic_stage,
min_transmittance=1e30) stopped ablating anything when the runtime blend
gate was replaced by the per-pixel alpha freeze."""
import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"  # full|nosort|nochunk
_ABLATE = {"full": "", "nosort": "merge", "nochunk": "blend",
           "fixed": "merge,blend"}
os.environ["VKGS_ABLATE"] = _ABLATE[MODE]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import vk_gaussian_splatting_tpu.ops.raster_bucket as rb  # noqa: E402
from vk_gaussian_splatting_tpu.config import RenderConfig  # noqa: E402
from vk_gaussian_splatting_tpu.ops.bucket_grid import bucket_splats  # noqa: E402
from vk_gaussian_splatting_tpu.ops.projection import project_splats  # noqa: E402
from vk_gaussian_splatting_tpu.render.pipelines import (  # noqa: E402
    gs_attr_rows,
    raster_statics,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at  # noqa: E402
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats  # noqa: E402

CAPS = tuple(int(x) for x in sys.argv[2].split(",")) if len(sys.argv) > 2 \
    else (384, 128, 128, 128)

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
rast_j = jax.jit(lambda b: rasterize_buckets_local(b))


def rasterize_buckets_local(b):
    return rb.rasterize_buckets(b, None, None, st, CAPS)


print(MODE, CAPS, "kernel ms:", t(rast_j, bins), flush=True)
# baseline overhead measure: trivial jit
trivial = jax.jit(lambda b: jnp.sum(b.attrs[0, :128]))
print("dispatch overhead ms:", t(trivial, bins), flush=True)
