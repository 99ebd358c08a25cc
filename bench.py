"""Benchmark: 3DGS forward (and fwd+bwd) throughput on one real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): reference mesh-shader raster renders the 6.13M-splat
bicycle scene at 587 FPS @ 1465x766 on an RTX 6000 Ada = 658.6 Mpixel/s.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats

BASELINE_MPIX_S = 587 * 1465 * 766 / 1e6  # 658.6


def make_scene(n_splats: int):
    """Synthetic scene matching trained-scene screen statistics: ~97% of a
    converged 3DGS model's splats are sub-8-px on screen with a few percent
    mid-size and rare large background blobs (the INRIA scenes the reference
    benches, benchmark.py:419-433). The round-2 bench scene (uniform
    scale_range (-5.5, -3.5)) was mid-dominated — mean mid-window occupancy
    ~1675 vs the 128 cap, i.e. it silently benched a TRUNCATED render; this
    mixture renders overflow-free at the default caps (asserted below).

    Everything stays ON DEVICE (jnp.concatenate, not numpy): a host
    round-trip of the ~430 MB attribute set over the tunneled runtime can
    take minutes and once stalled the whole bench past the driver timeout."""
    import dataclasses as dc

    k = jax.random.key(0)
    ks, km, kl = jax.random.split(k, 3)
    n_s, n_m = int(n_splats * 0.969), int(n_splats * 0.025)
    n_l = n_splats - n_s - n_m
    small = random_splats(ks, n_s, sh_degree=3, extent=4.0,
                          scale_range=(-7.0, -5.0))
    mid = random_splats(km, n_m, sh_degree=3, extent=4.0,
                        scale_range=(-5.0, -3.5))
    large = random_splats(kl, n_l, sh_degree=3, extent=4.0,
                          scale_range=(-3.5, -2.0))
    fields = {}
    for f in ("means", "scales", "quats", "opacities", "sh_dc", "sh_rest"):
        fields[f] = jnp.concatenate([getattr(s, f)
                                     for s in (small, mid, large)])
    return dc.replace(small, **fields).prepare()


FRAMES = 8  # frames per dispatch: the tunneled runtime costs ~44 ms per
            # host round-trip, so per-frame time is measured over an
            # on-device lax.scan of FRAMES slightly-perturbed cameras


def _sync(x):
    """Force real device completion: on the tunneled axon runtime,
    block_until_ready returns at enqueue; only a device->host fetch of a
    value that depends on the computation truly waits."""
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def time_fn(fn, *args, iters=4, warmup=2):
    """Min over iterations: the tunneled chip is time-shared, so individual
    dispatches can be inflated many-fold by other tenants (observed 6x);
    the minimum is the uncontended figure."""
    for _ in range(warmup):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / FRAMES


def main():
    n_splats = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # flagship inference path: bucket-grid binning (ops/bucket_grid.py);
    # the training benchmark (fwd_bwd) uses the same path's kernel backward
    cfg = RenderConfig(width=1920, height=1080, sh_degree=3)
    cfg = cfg.replace(raster=dataclasses.replace(
        cfg.raster, method=os.environ.get("BENCH_METHOD", "bucket")))
    prepared = make_scene(n_splats)
    cam = look_at([0, 0, -7], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height,
                  fov_y_rad=0.9)

    def jitter(c, i):
        # per-frame camera nudge: keeps the scan body un-CSE-able without
        # changing the workload
        return dataclasses.replace(
            c, viewmat=c.viewmat.at[0, 3].add(i.astype(jnp.float32) * 1e-4))

    @jax.jit
    def fwd(p, c):
        def body(carry, i):
            o = render_3dgs(p, jitter(c, i), cfg)
            s, ov = carry
            return (s + jnp.sum(o.image), ov | o.overflow), None
        (s, ov), _ = jax.lax.scan(body, (0.0, jnp.bool_(False)),
                                  jnp.arange(FRAMES))
        return s, ov

    @jax.jit
    def fwd_bwd(p, c):
        def loss(pp):
            @jax.checkpoint
            def frame_loss(pp_, i):
                # remat per frame — without it the scan stores every frame's
                # pair buffers for the backward (8 x 1GB blows HBM)
                o = render_3dgs(pp_, jitter(c, i), cfg)
                return jnp.sum(o.image ** 2)

            def body(carry, i):
                return carry + frame_loss(pp, i), None
            s, _ = jax.lax.scan(body, 0.0, jnp.arange(FRAMES))
            return s
        return jax.grad(loss)(p)

    # honesty gate: the benched render must be coverage-complete (no
    # window-cap truncation) — see make_scene docstring. The flag rides the
    # fwd program itself (a separate jit program would double compile time,
    # which dominates wall clock on the tunneled runtime).
    overflow = bool(fwd(prepared, cam)[1])
    assert not overflow, "bench scene overflows the default bucket caps"

    dt_fwd = time_fn(fwd, prepared, cam)
    dt_fwd_bwd = time_fn(fwd_bwd, prepared, cam, iters=2)

    mpix_s = cfg.width * cfg.height / dt_fwd / 1e6
    mpix_s_train = cfg.width * cfg.height / dt_fwd_bwd / 1e6

    extra = {
        "overflow": overflow,
        "fwd_ms": round(dt_fwd * 1e3, 3),
        "fwd_bwd_ms": round(dt_fwd_bwd * 1e3, 3),
        "fwd_bwd_mpix_s": round(mpix_s_train, 2),
        "fps": round(1.0 / dt_fwd, 2),
        "n_splats": n_splats,
        "device": str(jax.devices()[0]),
    }

    if os.environ.get("BENCH_ALL"):
        # per-pipeline frame times (the reference's 3DGUT/3DGRT tables);
        # packed = the fp16-analog inference tier
        import vk_gaussian_splatting_tpu.render.pipelines as pl

        variants = {
            "3dgut_ms": (pl.render_3dgut, cfg),
            "3dgrt_ms": (pl.render_3dgrt, cfg),
            "3dgs_packed_ms": (render_3dgs, cfg.replace(
                raster=dataclasses.replace(cfg.raster,
                                           pair_format="packed"))),
            "3dgut_packed_ms": (pl.render_3dgut, cfg.replace(
                raster=dataclasses.replace(cfg.raster,
                                           pair_format="packed"))),
        }
        for name, (pipe, c) in variants.items():
            @jax.jit
            def one(p, cc, pipe=pipe, c=c):
                def body(carry, i):
                    return carry + jnp.sum(
                        pipe(p, jitter(cc, i), c).image), None
                s, _ = jax.lax.scan(body, 0.0, jnp.arange(FRAMES))
                return s
            extra[name] = round(time_fn(one, prepared, cam) * 1e3, 3)

    print(json.dumps({
        "metric": "3dgs_raster_fwd_1080p_1M_splats",
        "value": round(mpix_s, 2),
        "unit": "Mpixel/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
