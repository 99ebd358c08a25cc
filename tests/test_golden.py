"""Golden trained-statistics corpus gates (VERDICT r03 next #5).

assets/golden/golden_scene.ply is a CHECKED-IN scene optimized against a
structured multi-view teacher (scripts/make_golden_scene.py — recipe in
assets/golden/meta.json). Unlike `random_splats`, its screen statistics
match a converged 3DGS model (median radius ~3 px, ~99% fine-class), which
is the distribution the INRIA benchmark scenes exercise
(reference benchmark.py:419-433)."""

import json
import os

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.io.ply import load_ply
from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
from vk_gaussian_splatting_tpu.scene.cameras import look_at

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "assets", "golden")


@pytest.fixture(scope="module")
def golden():
    splats = load_ply(os.path.join(GOLDEN, "golden_scene.ply"))
    meta = json.load(open(os.path.join(GOLDEN, "meta.json")))
    w, h = meta["recipe"]["res"]
    cfg = RenderConfig(width=w, height=h, sh_degree=0)
    cam = look_at([0, -1.5, -7.0], [0, 0.5, 0], [0, 1, 0], w, h,
                  fov_y_rad=0.9)  # orbit camera 0 of the recipe
    return splats, meta, cfg, cam


def test_golden_render_matches_checked_in_image(golden):
    splats, meta, cfg, cam = golden
    ref = np.load(os.path.join(GOLDEN, "golden_view0.npy")).astype(np.float32)
    img = np.asarray(jnp.clip(
        render_3dgs(splats.prepare(), cam, cfg, max_pairs=1 << 21).image,
        0, 1))
    mse = float(np.mean((img - ref) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # ref stored as f16 (~0.001 quantization => ~60 dB ceiling); PLY
    # round-trips f32 exactly, so any real regression craters this
    assert psnr > 45, psnr


def test_golden_trained_statistics(golden):
    """The corpus has TRAINED screen statistics, not random_splats ones."""
    from vk_gaussian_splatting_tpu.ops.projection import project_splats

    splats, meta, cfg, cam = golden
    proj = jax.jit(lambda p, c: project_splats(p, c, cfg))(
        splats.prepare(), cam)
    radii = np.asarray(proj.radius.max(axis=1))
    vis = radii > 0
    assert vis.sum() > 10000
    assert np.median(radii[vis]) < 8.0          # bulk is fine-class
    assert (radii[vis] < 8).mean() > 0.95
    assert meta["psnr_mean"] > 28               # actually converged


def test_golden_bucket_fit_caps_no_overflow(golden):
    """The bench's cap-derivation flow on the trained corpus: measure ->
    fit -> render without overflow, matching the pair path."""
    from vk_gaussian_splatting_tpu.ops.bucket_grid import (
        BucketGridSpec,
        fit_caps,
        measure_required_caps,
    )
    from vk_gaussian_splatting_tpu.ops.projection import project_splats

    splats, meta, cfg, cam = golden
    prepared = splats.prepare()
    spec = BucketGridSpec.build(cfg.width // 16, cfg.height // 16)
    req = np.asarray(jax.jit(
        lambda p, c: measure_required_caps(project_splats(p, c, cfg), spec))(
            prepared, cam))
    caps = fit_caps([int(x) for x in req])
    bcfg = cfg.replace(raster=dataclasses.replace(
        cfg.raster, method="bucket", bucket_caps=caps))
    out = render_3dgs(prepared, cam, bcfg)
    assert not bool(out.overflow)
    ref = render_3dgs(prepared, cam, cfg, max_pairs=1 << 21)
    d = np.abs(np.asarray(out.image) - np.asarray(ref.image))
    assert d.max() < 1e-4, d.max()


def test_golden_gradients_finite_difference(golden):
    """Finite-difference gradient check on the trained distribution (the
    r03 verdict: every gradient test ran on random_splats)."""
    splats, meta, cfg, cam = golden
    small = RenderConfig(width=128, height=96, sh_degree=0)
    cam_s = look_at([0, -1.5, -7.0], [0, 0.5, 0], [0, 1, 0],
                    small.width, small.height, fov_y_rad=0.9)

    def loss(op):
        s = dataclasses.replace(splats, opacities=op)
        return jnp.sum(render_3dgs(s.prepare(), cam_s, small,
                                   max_pairs=1 << 21).image ** 2)

    g = np.asarray(jax.grad(loss)(splats.opacities))
    rng = np.random.default_rng(0)
    idx = rng.choice(np.nonzero(np.abs(g) > np.quantile(np.abs(g), 0.99))[0],
                     4, replace=False)
    eps = 1e-2
    for i in idx:
        op = np.asarray(splats.opacities).copy()
        op[i] += eps
        lp = float(loss(jnp.asarray(op)))
        op[i] -= 2 * eps
        lm = float(loss(jnp.asarray(op)))
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - g[i]) < 2e-2 * max(abs(fd), abs(g[i]), 1.0), (
            i, fd, g[i])
