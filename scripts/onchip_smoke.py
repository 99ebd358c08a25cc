"""On-chip smoke tier (<~5 min): run before every snapshot commit.

VERDICT r03 weak #2/#5: two consecutive rounds shipped driver-bench
breakage that a 5-minute on-chip run would have caught, and Mosaic-specific
behavior (scratch init, DMA semantics, f32 matmul grade) is exactly where
CPU interpret mode and the chip diverge. This script:

1. AOT-compiles the flagship 1080p bucket render for the real target
   (works even when the chip is busy — the chipless compile helper);
2. runs a small bucket render + gradient ON CHIP against the pair kernel
   as a cross-architecture oracle (two independent Pallas implementations
   of the same blend);
3. asserts DETERMINISM (SURVEY.md §5): bit-equal repeat renders and an
   identical stochastic stream for equal seeds, a different stream for
   different sample ids.

The run also writes ONCHIP.json at the repo root (aot / oracle /
determinism fields) so each round's chip health is a driver-visible
artifact, not a log line (VERDICT r4 next #8) — bench.py triggers it at the
end of the driver bench.

Usage:
    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/onchip_smoke.py
    ... --aot-only     # chip busy: compile-only
    (PYTHONPATH must KEEP the inherited value — it registers the TPU)

NEVER run this under `timeout` or kill it mid-flight (device wedge);
launch in background and poll the log.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

RESULT = {"ok": False, "stage": "init"}


def write_artifact():
    RESULT["elapsed_s"] = round(time.time() - T0, 1)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ONCHIP.json")
    with open(path, "w") as f:
        json.dump(RESULT, f, indent=1)

from vk_gaussian_splatting_tpu.config import RenderConfig, StochasticMode
from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", flush=True)


def bucket_cfg(cfg, caps=None, prepared=None, cam=None):
    """Bucket config; caps auto-derived from measured span occupancy (the
    production flow — hardcoded caps rotted when the scene statistics
    moved and killed a smoke run on a legitimate overflow)."""
    if caps is None:
        from vk_gaussian_splatting_tpu.ops.bucket_grid import (
            BucketGridSpec, fit_caps, measure_required_caps)
        from vk_gaussian_splatting_tpu.ops.projection import project_splats
        spec = BucketGridSpec.build(cfg.width // 16, cfg.height // 16)
        req = jax.jit(lambda p, c: measure_required_caps(
            project_splats(p, c, cfg), spec))(prepared, cam)
        caps = fit_caps([int(x) for x in jax.device_get(req)])
        log(f"derived smoke caps: {caps}")
    return cfg.replace(raster=dataclasses.replace(
        cfg.raster, method="bucket", bucket_caps=caps))


def main():
    aot_only = "--aot-only" in sys.argv
    dev = jax.devices()[0]
    log(f"device: {dev}")
    RESULT["device"] = str(dev)
    RESULT["stage"] = "aot"

    # ---- 1. AOT-compile the flagship 1080p program for the real target ----
    # non-pow2 x128 caps: the shape class fit_caps now emits (sum-of-two-
    # pow2 run decomposition) — AOT-compiling it is the Mosaic check
    cfg_big = bucket_cfg(RenderConfig(width=1920, height=1080, sh_degree=3),
                         caps=(768, 384, 640, 256))
    splats_big = random_splats(jax.random.key(0), 100_000, sh_degree=3,
                               scale_range=(-5.0, -3.0))
    cam_big = look_at([0, 0, -7], [0, 0, 0], [0, 1, 0], cfg_big.width,
                      cfg_big.height, fov_y_rad=0.9)
    fn = jax.jit(lambda p, c: render_3dgs(p, c, cfg_big).image)
    fn.lower(splats_big.prepare(), cam_big).compile()
    log("AOT compile 1080p bucket fwd: OK")

    def loss_big(p, c):
        return jnp.sum(render_3dgs(p.prepare(), c, cfg_big).image ** 2)
    jax.jit(jax.grad(loss_big)).lower(splats_big, cam_big).compile()
    log("AOT compile 1080p bucket fwd+bwd: OK")
    RESULT["aot"] = True
    if aot_only:
        RESULT.update(ok=True, stage="aot_only")
        log("SMOKE OK (aot-only)")
        return
    RESULT["stage"] = "oracle"

    # ---- 2. small on-chip render + gradient vs the pair-kernel oracle ----
    cfg = RenderConfig(width=256, height=192, sh_degree=1)
    splats = random_splats(jax.random.key(3), 3000, sh_degree=1,
                           scale_range=(-4.0, -2.0))
    prepared = splats.prepare()
    cam = look_at([0.4, -0.7, -8], [0, 0, 0], [0, 1, 0], cfg.width,
                  cfg.height, fov_y_rad=0.9)
    bcfg = bucket_cfg(cfg, prepared=prepared, cam=cam)

    out_b = render_3dgs(prepared, cam, bcfg)
    out_p = render_3dgs(prepared, cam, cfg, max_pairs=1 << 18)
    img_b = np.asarray(out_b.image)
    img_p = np.asarray(out_p.image)
    assert np.isfinite(img_b).all(), "non-finite bucket image on chip"
    assert not bool(out_b.overflow), "smoke scene overflows bucket caps"
    d = np.abs(img_b - img_p)
    log(f"bucket vs pair image: max {d.max():.2e} mean {d.mean():.2e}")
    RESULT["oracle"] = {"image_max_abs": float(d.max()),
                        "image_mean_abs": float(d.mean())}
    # two independent kernels, same math; chip f32 reorder noise only
    assert d.max() < 5e-4, f"bucket/pair divergence {d.max()}"

    def loss_b(s):
        return jnp.sum(render_3dgs(s.prepare(), cam, bcfg).image ** 2)

    def loss_p(s):
        return jnp.sum(render_3dgs(s.prepare(), cam, cfg,
                                   max_pairs=1 << 18).image ** 2)

    g_b = jax.jit(jax.grad(loss_b))(splats)
    g_p = jax.jit(jax.grad(loss_p))(splats)
    for name in ("means", "opacities", "sh_dc"):
        a = np.asarray(getattr(g_p, name)).ravel()
        b = np.asarray(getattr(g_b, name)).ravel()
        assert np.isfinite(b).all(), f"non-finite d{name} on chip"
        scale = np.abs(a).max() + 1e-12
        rel = np.abs(b - a) / scale
        # flip-aware gates (verify skill): cutoff flips move whole
        # splat-pixel contributions on ~1% of entries; judge the bulk
        med, p999 = np.median(rel), np.quantile(rel, 0.999)
        log(f"grad {name}: median {med:.2e} p99.9 {p999:.2e}")
        RESULT["oracle"][f"grad_{name}"] = {"median_rel": float(med),
                                            "p999_rel": float(p999)}
        assert med < 1e-5 and p999 < 2e-2, (name, med, p999)

    # ---- 3. determinism (SURVEY.md §5): bit-equal repeats ----
    RESULT["stage"] = "determinism"
    img_b2 = np.asarray(render_3dgs(prepared, cam, bcfg).image)
    assert np.array_equal(img_b, img_b2), "repeat bucket render not bit-equal"

    scfg = bcfg.replace(stochastic=StochasticMode.SPLAT, temporal_samples=2)
    s1 = np.asarray(render_3dgs(prepared, cam, scfg).image)
    s2 = np.asarray(render_3dgs(prepared, cam, scfg).image)
    assert np.array_equal(s1, s2), "stochastic stream not deterministic"
    s_more = np.asarray(render_3dgs(
        prepared, cam, scfg.replace(temporal_samples=4)).image)
    assert not np.array_equal(s1, s_more), \
        "different sample count produced an identical stochastic stream"
    log("determinism: bit-equal repeats, seed-stable stochastic stream")
    RESULT.update(ok=True, determinism=True, stage="done")
    log("SMOKE OK")


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — artifact must record failure
        RESULT["error"] = f"{type(e).__name__}: {e}"
        raise
    finally:
        write_artifact()
