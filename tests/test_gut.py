"""3DGUT: UT projection, ray generation, and the gut3d tile blender vs oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vk_gaussian_splatting_tpu.config import CameraType, Pipeline, RenderConfig
from vk_gaussian_splatting_tpu.ops.projection import (
    camera_project_points,
    project_splats,
    ut_project_splats,
)
from vk_gaussian_splatting_tpu.ops.rasterize_ref import rasterize_naive_gut
from vk_gaussian_splatting_tpu.render.pipelines import render, render_3dgut
from vk_gaussian_splatting_tpu.render.rays import build_tile_rays
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats


def make_scene(seed=0, n=300, w=96, h=64, **cfg_kw):
    cfg = RenderConfig(width=w, height=h, sh_degree=1,
                       pipeline=Pipeline.MESH_3DGUT, **cfg_kw)
    splats = random_splats(jax.random.key(seed), n, sh_degree=1,
                           extent=3.0, scale_range=(-2.5, -1.0))
    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], w, h, fov_y_rad=0.9)
    return cfg, splats, cam


def test_ut_projection_matches_ewa_for_small_splats():
    """For tiny splats under a pinhole camera, the UT-projected center/cov
    must agree with the EWA linearization."""
    cfg, splats, cam = make_scene(n=128)
    splats = dataclasses.replace(splats, scales=splats.scales - 2.0)  # tiny
    prepared = splats.prepare()
    ut = ut_project_splats(prepared, cam, cfg)
    ewa = project_splats(prepared, cam, cfg)
    both = np.asarray(ut.valid & ewa.valid)
    assert both.sum() > 30
    np.testing.assert_allclose(np.asarray(ut.xy)[both], np.asarray(ewa.xy)[both],
                               atol=0.05)
    # conics agree where well-conditioned
    cu = np.asarray(ut.conic)[both]
    ce = np.asarray(ewa.conic)[both]
    np.testing.assert_allclose(cu, ce, rtol=0.08, atol=0.05)


def test_fisheye_projection_center():
    """Optical axis maps to principal point; 45-degree rays map to f*pi/4."""
    cfg, _, cam = make_scene(camera_type=CameraType.FISHEYE)
    pts = jnp.asarray([[0.0, 0.0, 5.0], [5.0, 0.0, 5.0]])
    uv, valid = camera_project_points(cam, pts, cfg)
    np.testing.assert_allclose(np.asarray(uv[0]),
                               [float(cam.cx), float(cam.cy)], atol=1e-4)
    expected_r = float(cam.fx) * np.pi / 4
    np.testing.assert_allclose(float(uv[1, 0] - cam.cx), expected_r, rtol=1e-5)
    assert bool(valid[0])


def test_ray_generation_roundtrip():
    """Projecting a point along each generated pinhole ray lands on its pixel."""
    cfg, _, cam = make_scene(w=32, h=32)
    rays = np.asarray(build_tile_rays(cam, cfg))  # (T, 8, 256)
    t = 1  # tile (0,1) -> pixels x in [16,32)
    dirs = rays[t, 0:3, :].T.reshape(16, 16, 3)
    origin = rays[t, 3:6, 0]
    p = origin + dirs[5, 7] * 4.0  # pixel (y=5, x=16+7)
    uv, valid = camera_project_points(
        jax.tree.map(jnp.asarray, cam), jnp.asarray(
            (p - origin) @ np.asarray(cam.viewmat)[:3, :3].T + 0.0)[None] * 4.0
        + jnp.asarray(np.asarray(cam.viewmat)[:3, 3] * 0.0), cfg)
    # simpler check: transform p to camera space directly
    vm = np.asarray(cam.viewmat)
    p_cam = vm[:3, :3] @ p + vm[:3, 3]
    u = float(cam.fx) * p_cam[0] / p_cam[2] + float(cam.cx)
    v = float(cam.fy) * p_cam[1] / p_cam[2] + float(cam.cy)
    np.testing.assert_allclose([u, v], [16 + 7 + 0.5, 5 + 0.5], atol=1e-3)


@pytest.mark.parametrize("camera_type", [CameraType.PINHOLE, CameraType.FISHEYE])
def test_gut_pallas_matches_oracle(camera_type):
    cfg, splats, cam = make_scene(n=300, camera_type=camera_type)
    prepared = splats.prepare()
    out = render_3dgut(prepared, cam, cfg, max_pairs=65536)
    assert not bool(out.overflow)

    proj = ut_project_splats(prepared, cam, cfg)
    rays = np.asarray(build_tile_rays(cam, cfg))
    tx = -(-cfg.width // 16)
    ty = -(-cfg.height // 16)
    full = rays.reshape(ty, tx, 8, 16, 16).transpose(0, 3, 1, 4, 2).reshape(
        ty * 16, tx * 16, 8)
    dirs = jnp.asarray(full[:cfg.height, :cfg.width, 0:3])
    orgs = jnp.asarray(full[:cfg.height, :cfg.width, 3:6])
    img_ref, t_ref = rasterize_naive_gut(
        prepared, proj, dirs, orgs, cfg.raster,
        kernel_degree=cfg.rt.kernel_degree)

    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.transmittance), np.asarray(t_ref),
                               atol=3e-5)
    assert float(t_ref.min()) < 0.9  # non-vacuous


def test_gut_gradients_match_oracle():
    cfg, splats, cam = make_scene(n=120, w=64, h=48)
    prepared = splats.prepare()
    wimg = jax.random.normal(jax.random.key(7), (cfg.height, cfg.width, 3))

    def loss_pallas(pp):
        o = render_3dgut(pp, cam, cfg, max_pairs=65536)
        return jnp.sum(o.image * wimg)

    def loss_naive(pp):
        proj = ut_project_splats(pp, cam, cfg)
        rays = build_tile_rays(cam, cfg)
        tx = -(-cfg.width // 16)
        ty = -(-cfg.height // 16)
        full = rays.reshape(ty, tx, 8, 16, 16).transpose(0, 3, 1, 4, 2).reshape(
            ty * 16, tx * 16, 8)
        img, _ = rasterize_naive_gut(
            pp, proj, full[:cfg.height, :cfg.width, 0:3],
            full[:cfg.height, :cfg.width, 3:6], cfg.raster,
            kernel_degree=cfg.rt.kernel_degree)
        return jnp.sum(img * wimg)

    g_p = jax.grad(loss_pallas)(prepared)
    g_n = jax.grad(loss_naive)(prepared)
    for name in ("means", "scales_log", "quats", "color", "sh"):
        a = np.asarray(getattr(g_p, name), np.float64)
        b = np.asarray(getattr(g_n, name), np.float64)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-3,
                                   err_msg=f"grad mismatch: {name}")
        assert np.abs(b).max() > 0, f"oracle grad for {name} is zero"


def test_gut_dof_temporal():
    """DoF + temporal sampling: image changes with aperture, stays finite."""
    cfg, splats, cam = make_scene(n=200, temporal_samples=4)
    cam_dof = dataclasses.replace(
        cam, aperture=jnp.float32(0.3), focus_dist=jnp.float32(8.0))
    prepared = splats.prepare()
    sharp = render_3dgut(prepared, cam, cfg, max_pairs=65536)
    blurred = render_3dgut(prepared, cam_dof, cfg, max_pairs=65536)
    a, b = np.asarray(sharp.image), np.asarray(blurred.image)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # DoF visibly changes the render


def test_dispatch_gut():
    cfg, splats, cam = make_scene(n=50)
    out = render(splats.prepare(), cam, cfg, max_pairs=16384)
    assert np.isfinite(np.asarray(out.image)).all()


def test_opencv_distortion_models():
    """Distorted pinhole/fisheye against a scalar transcription of the
    reference math (camera_projections:91-171)."""
    import dataclasses as dc
    cfg, _, cam = make_scene()
    # rational radial + tangential + thin prism
    dist = np.zeros(18, np.float32)
    dist[0], dist[1] = 0.1, -0.02         # k1, k2
    dist[3] = 0.05                        # k4 (denominator)
    dist[6], dist[7] = 0.01, -0.005       # p1, p2
    dist[8], dist[10] = 0.002, -0.001     # s1, s3
    cam_d = dc.replace(cam, distortion=jnp.asarray(dist))
    pts = jnp.asarray([[0.5, -0.3, 4.0], [0.0, 0.0, 2.0]])
    uv, valid = camera_project_points(cam_d, pts, cfg)

    for i, (x, y, z) in enumerate(np.asarray(pts)):
        un, vn = x / z, y / z
        r2 = un * un + vn * vn
        icd = (1 + r2 * (dist[0] + r2 * dist[1])) / (1 + r2 * dist[3])
        du = dist[6] * 2 * un * vn + dist[7] * (r2 + 2 * un * un) + r2 * dist[8]
        dv = dist[6] * (r2 + 2 * vn * vn) + dist[7] * 2 * un * vn + r2 * dist[10]
        eu = float(cam.fx) * (icd * un + du) + float(cam.cx)
        ev = float(cam.fy) * (icd * vn + dv) + float(cam.cy)
        np.testing.assert_allclose(np.asarray(uv[i]), [eu, ev], rtol=1e-5)
        assert bool(valid[i])

    # undistorted fisheye poly = pure equidistant; with k1 it deviates
    cfg_f, _, cam_f = make_scene(camera_type=CameraType.FISHEYE)
    p = jnp.asarray([[2.0, 1.0, 3.0]])
    uv0, _ = camera_project_points(cam_f, p, cfg_f)
    dist2 = np.zeros(18, np.float32)
    dist2[12] = 0.05
    uv1, _ = camera_project_points(
        dc.replace(cam_f, distortion=jnp.asarray(dist2)), p, cfg_f)
    x, y, z = 2.0, 1.0, 3.0
    rho = np.hypot(x, y)
    th = np.arctan2(rho, z)
    delta = th * (1 + 0.05 * th * th) / rho
    np.testing.assert_allclose(
        np.asarray(uv1[0]),
        [float(cam_f.fx) * x * delta + float(cam_f.cx),
         float(cam_f.fy) * y * delta + float(cam_f.cy)], rtol=1e-5)
    assert np.abs(np.asarray(uv1) - np.asarray(uv0)).max() > 0.5


def test_gut_packed_pair_format_matches_f32():
    import dataclasses as _dc

    from vk_gaussian_splatting_tpu.render.pipelines import render_3dgrt

    cfg = RenderConfig(width=128, height=96, sh_degree=1)
    splats = random_splats(jax.random.key(0), 1000, sh_degree=1).prepare()
    cam = look_at([0.4, -0.8, -7], [0, 0, 0], [0, 1, 0],
                  cfg.width, cfg.height)
    cfgp = cfg.replace(raster=_dc.replace(cfg.raster, pair_format="packed"))
    for fn in (render_3dgut, render_3dgrt):
        o1 = fn(splats, cam, cfg, max_pairs=1 << 18)
        o2 = fn(splats, cam, cfgp, max_pairs=1 << 18)
        i1, i2 = np.asarray(o1.image), np.asarray(o2.image)
        mse = float(np.mean((i1 - i2) ** 2))
        psnr = 10 * np.log10(max(float(i1.max()), 1.0) ** 2
                             / max(mse, 1e-12))
        assert psnr > 55.0, (fn.__name__, psnr)
