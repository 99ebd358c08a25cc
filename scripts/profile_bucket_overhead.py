"""Fine on-chip attribution of the bucket kernel's per-step overhead.

The round-4 stage ablation (profile_bench_scene.py) showed merge ~0 ms and
blend ~27 ms of a ~213 ms single-dispatch kernel: the cost now lives in the
DMA / assembly / keys / output machinery (~39 us per grid step). This
script runs ONE ablation combo per process (the pallas_call builders are
lru_cached and VKGS_ABLATE is read at build time) and prints its timing;
scripts/profile_bucket_sweep.sh sweeps the combos.

Usage: VKGS_ABLATE=<set> python scripts/profile_bucket_overhead.py [caps] [n]
  <set> drawn from: dma, assembly, keys, merge, blend, output
  (merge/blend knobs are honored by the kernel's abl set directly).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import vk_gaussian_splatting_tpu.ops.raster_bucket as rb  # noqa: E402
from bench import make_scene  # noqa: E402
from vk_gaussian_splatting_tpu.config import RenderConfig  # noqa: E402
from vk_gaussian_splatting_tpu.ops.bucket_grid import bucket_splats  # noqa: E402
from vk_gaussian_splatting_tpu.ops.projection import project_splats  # noqa: E402
from vk_gaussian_splatting_tpu.render.pipelines import (  # noqa: E402
    gs_attr_rows,
    raster_statics,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at  # noqa: E402

CAPS = tuple(int(x) for x in sys.argv[1].split(",")) if len(sys.argv) > 1 \
    else (768, 384, 640, 256)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

cfg = RenderConfig(width=1920, height=1080, sh_degree=3)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def t(fn, *a, n=8):
    for _ in range(2):
        sync(fn(*a))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


tx, ty = cfg.width // 16, cfg.height // 16
# bins are recomputed ON DEVICE each process: a ~300 MB host->device
# device_put of cached bins over the tunneled runtime reproducibly killed
# the client with FAILED_PRECONDITION (the old npz cache did exactly that)
prepared = make_scene(N)
cam = look_at([0, 0, -7], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height,
              fov_y_rad=0.9)
proj = jax.block_until_ready(jax.jit(
    lambda p, c: project_splats(p, c, cfg))(prepared, cam))
rows = jax.block_until_ready(jax.jit(gs_attr_rows)(proj))
bins = jax.block_until_ready(jax.jit(
    lambda p, r: bucket_splats(p, r, tiles_x=tx, tiles_y=ty,
                               caps=CAPS))(proj, rows))

import dataclasses

st = raster_statics(cfg, interpret=False)
# the PRODUCTION blend chunk (raster_statics carries the pair-path 128);
# VKGS_CHUNK sweeps alternatives
st = dataclasses.replace(st, chunk=int(
    os.environ.get("VKGS_CHUNK", cfg.raster.bucket_chunk)))
abl = os.environ.get("VKGS_ABLATE", "")
kern = jax.jit(lambda b: rb.rasterize_buckets(b, None, None, st, CAPS))
print(f"ABLATE=[{abl}] kernel ms: {t(kern, bins):.2f}", flush=True)
