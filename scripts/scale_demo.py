"""Scale demonstration: render a >=6M-splat scene end-to-end on one v5e.

VERDICT round-1 item 4 (match: reference README.md:132-138, the 6.13M bicycle
headline scene and the 15.3M/106M giants). Produces, in-repo:

  docs/assets/scale_demo.png   — the rendered frame
  docs/scale_demo_log.txt      — config, timing, overflow flag, HBM
                                 accounting (BENCHMARK_ADV grammar), and a
                                 center-crop PSNR vs the exact pair-expansion
                                 oracle

Scene: heavy-tailed synthetic (log-normal-ish scale mix) so the class
pyramid's mid/coarse/global tiers are all exercised, like a trained outdoor
scene's big background blobs.

Run: PYTHONPATH=. python scripts/scale_demo.py [n_splats]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats
from vk_gaussian_splatting_tpu.utils.memstats import MemoryStatistics

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_200_000
# 6M splats over 2M pixels is ~5x the depth complexity of the 1M bench, so
# the fine caps scale accordingly (span cap ~3x the mean bucket occupancy);
# c_total = 2048 + 1024 + 512 + 128 = 3712 -> 4096-lane candidate buffer
CAPS = (2048, 512, 256, 256)


def build_scene(n):
    """97% small + 2.7% mid + 0.3% large radius mix (a trained outdoor
    scene's big background blobs are FEW), positioned to fill the camera
    frustum with ~uniform screen density — the depth-complexity profile the
    per-tile caps are budgeted for. A gaussian position blob instead piles
    3-4x the mean onto the center tiles, which is not how converged scenes
    distribute."""
    k = jax.random.key(42)
    ks, km, kl = jax.random.split(k, 3)
    n_s, n_m = int(n * 0.9897), int(n * 0.01)
    n_l = n - n_s - n_m
    small = random_splats(ks, n_s, sh_degree=2, extent=6.0,
                          scale_range=(-7.0, -5.0))
    mid = random_splats(km, n_m, sh_degree=2, extent=6.0,
                        scale_range=(-5.0, -3.5))
    large = random_splats(kl, n_l, sh_degree=2, extent=6.0,
                          scale_range=(-3.5, -2.5))
    import numpy as np
    fields = {}
    for f in ("means", "scales", "quats", "opacities", "sh_dc", "sh_rest"):
        fields[f] = np.concatenate([np.asarray(getattr(s, f))
                                    for s in (small, mid, large)])
    # re-place positions to fill the frustum of the demo camera uniformly
    rng = np.random.default_rng(7)
    u = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    v = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    z = rng.uniform(5.0, 16.0, n).astype(np.float32)   # along view axis
    tan_h = np.tan(0.95 / 2) * (1920 / 1080)
    tan_v = np.tan(0.95 / 2)
    # demo camera at (0, 1.5, -10.5) looking at the origin
    fields["means"] = np.stack([
        u * tan_h * z, 1.5 + v * tan_v * z - 1.5 * z / 10.5, -10.5 + z,
    ], axis=1).astype(np.float32)
    return dataclasses.replace(small, **fields)


def main():
    log = []

    def say(msg):
        log.append(str(msg))
        print(msg, flush=True)

    say(f"scale demo: {N} splats, 1920x1080, device {jax.devices()[0]}")
    cfg = RenderConfig(width=1920, height=1080, sh_degree=2)
    bcfg = cfg.replace(raster=dataclasses.replace(
        cfg.raster, method="bucket", bucket_caps=CAPS))
    splats = build_scene(N)
    prepared = splats.prepare()
    jax.block_until_ready(prepared.means)
    cam = look_at([0, 1.5, -10.5], [0, 0, 0], [0, 1, 0], cfg.width,
                  cfg.height, fov_y_rad=0.95)

    mem = MemoryStatistics()
    mem.account_scene(splats, prepared)

    # stage timings first (bin vs kernel)
    from vk_gaussian_splatting_tpu.ops.bucket_grid import bucket_splats
    from vk_gaussian_splatting_tpu.ops.projection import project_splats
    from vk_gaussian_splatting_tpu.ops.raster_bucket import rasterize_buckets
    from vk_gaussian_splatting_tpu.render.pipelines import (
        gs_attr_rows,
        raster_statics,
    )
    proj = jax.block_until_ready(
        jax.jit(lambda p, c: project_splats(p, c, bcfg))(prepared, cam))
    rows = jax.block_until_ready(jax.jit(gs_attr_rows)(proj))
    bin_j = jax.jit(lambda p, r: bucket_splats(
        p, r, tiles_x=120, tiles_y=68, caps=CAPS))
    bins = jax.block_until_ready(bin_j(proj, rows))
    t0 = time.perf_counter()
    for _ in range(2):
        bins = bin_j(proj, rows)
    jax.block_until_ready(bins.attrs)
    say(f"stage bin: {(time.perf_counter()-t0)/2*1e3:.1f} ms")
    st = raster_statics(bcfg, interpret=False)
    rast_j = jax.jit(lambda b: rasterize_buckets(b, None, None, st, CAPS))
    o = jax.block_until_ready(rast_j(bins))
    t0 = time.perf_counter()
    for _ in range(2):
        o = rast_j(bins)
    jax.block_until_ready(o)
    say(f"stage kernel: {(time.perf_counter()-t0)/2*1e3:.1f} ms")

    # the demo frame runs the stages as separate dispatches (the fused 6M
    # program currently hits a pathological XLA schedule; the staged path is
    # what the numbers above measure)
    from vk_gaussian_splatting_tpu.ops.rasterize_pallas import assemble_image
    out_tiles = rast_j(bins)
    img_j, trans_j, depth_j, sid_j = assemble_image(
        out_tiles, None, 120, 68, cfg.width, cfg.height, cfg.background,
        with_aux=True)
    say(f"overflow: {bool(bins.overflow)}  live slot rows: "
        f"{int(bins.num_valid)}")
    assert not bool(bins.overflow), "caps too small for this scene"

    class Out:
        image = img_j
        overflow = bins.overflow
        num_pairs = bins.num_valid
    out = Out()

    # HBM accounting (BENCHMARK_ADV grammar) + live device stats
    mem.account_raster(0, 120 * 68, 128, prepared.num_splats)
    mem.print_benchmark_adv(0, say)
    try:
        stats = jax.devices()[0].memory_stats()
        say(f"device bytes_in_use: {stats.get('bytes_in_use', 'n/a')}")
        say(f"device peak_bytes_in_use: "
            f"{stats.get('peak_bytes_in_use', 'n/a')}")
    except Exception as e:  # tunneled runtime may not expose stats
        say(f"device memory_stats unavailable: {e}")

    # golden crop vs the exact pair-expansion oracle (VERDICT item 4):
    # render a 256x256 sub-camera crop with the exact searchsorted expansion
    # and compare the same crop of the big frame
    img = np.clip(np.asarray(out.image), 0, 1)
    y0, x0 = (1080 - 256) // 2, (1920 - 256) // 2
    crop = img[y0:y0 + 256, x0:x0 + 256]

    ecfg = cfg.replace(width=1920, height=1080, raster=dataclasses.replace(
        cfg.raster, expansion="exact", method="pairs"))
    exact = jax.jit(lambda p, c: render_3dgs(p, c, ecfg,
                                             max_pairs=1 << 25))(prepared,
                                                                 cam)
    eimg = np.clip(np.asarray(exact.image), 0, 1)
    ecrop = eimg[y0:y0 + 256, x0:x0 + 256]
    mse = float(np.mean((crop - ecrop) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    say(f"center-crop PSNR vs exact-expansion oracle: {psnr:.2f} dB")

    from PIL import Image
    import os
    os.makedirs("docs/assets", exist_ok=True)
    Image.fromarray((img * 255).astype(np.uint8)).save(
        "docs/assets/scale_demo.png")
    say("wrote docs/assets/scale_demo.png")
    with open("docs/scale_demo_log.txt", "w") as f:
        f.write("\n".join(log) + "\n")


if __name__ == "__main__":
    main()
