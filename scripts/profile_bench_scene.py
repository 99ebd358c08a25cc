"""On-chip stage profile of the DRIVER BENCH configuration (dev tool).

Times project / attr rows / bucket binning / tile kernel separately on the
bench scene (bench.make_scene mixture) at the caps the bench derives, plus
kernel ablations (merge stages off, blend-chunks off) to attribute kernel
time. Usage: profile_bench_scene.py [caps] [n_splats]
"""
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
    else (1024, 512, 1024, 256)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

cfg = RenderConfig(width=1920, height=1080, sh_degree=3)
prepared = make_scene(N)
cam = look_at([0, 0, -7], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height,
              fov_y_rad=0.9)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def t(fn, *a, n=6):
    for _ in range(2):
        sync(fn(*a))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


tx, ty = cfg.width // 16, cfg.height // 16
proj_j = jax.jit(lambda p, c: project_splats(p, c, cfg))
print("project ms:", t(proj_j, prepared, cam), flush=True)
proj = jax.block_until_ready(proj_j(prepared, cam))
rows_j = jax.jit(gs_attr_rows)
print("attr rows ms:", t(rows_j, proj), flush=True)
rows = jax.block_until_ready(rows_j(proj))

bin_j = jax.jit(lambda p, r: bucket_splats(p, r, tiles_x=tx, tiles_y=ty,
                                           caps=CAPS))
print("bucket bin ms:", t(bin_j, proj, rows), flush=True)
bins = jax.block_until_ready(bin_j(proj, rows))
print("overflow:", bool(bins.overflow), "n_valid:", int(bins.num_valid),
      flush=True)

st = raster_statics(cfg, interpret=False)
kern_j = jax.jit(lambda b: rb.rasterize_buckets(b, None, None, st, CAPS))
print("kernel full ms:", t(kern_j, bins), flush=True)

# Stage ablations are COMPILE-TIME (VKGS_ABLATE, read when the lru_cached
# pallas_call builder first runs) — one combo per process. Use
# scripts/profile_bucket_sweep.sh to run the full attribution sweep;
# monkeypatching _oem_stage / min_transmittance=1e30 in-process no longer
# ablates anything (the runtime blend gate was removed for the per-pixel
# alpha freeze).
print("run scripts/profile_bucket_sweep.sh for merge/blend/dma ablations",
      flush=True)
