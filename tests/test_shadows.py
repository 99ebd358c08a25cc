"""Deep shadow maps + hybrid pipelines."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import Pipeline, RenderConfig
from vk_gaussian_splatting_tpu.render.pipelines import render, render_hybrid
from vk_gaussian_splatting_tpu.render.shadows import (
    render_deep_shadow_map,
    sample_shadow,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.lights import LightType, make_light
from vk_gaussian_splatting_tpu.scene.splat_set import SplatSet, random_splats


def blocker_scene():
    """A dense opaque blob at the origin; light above; probes below."""
    blob = random_splats(jax.random.key(0), 150, sh_degree=0, extent=0.6,
                         scale_range=(-1.2, -0.8))
    blob = dataclasses.replace(blob, opacities=jnp.full_like(blob.opacities, 6.0))
    return blob.prepare()


def test_deep_shadow_map_blocks_behind():
    cfg = RenderConfig(width=64, height=64, sh_degree=0)
    prepared = blocker_scene()
    light = make_light(LightType.POINT, position=(0.0, -8.0, 0.0))
    dsm = render_deep_shadow_map(prepared, light, cfg, res=128)
    bp = np.asarray(dsm.breakpoints)
    assert (bp > 0).any(), "no shadow breakpoints recorded"

    # point below the blob (occluded) vs far to the side (unoccluded)
    behind = jnp.asarray([[0.0, 4.0, 0.0]])
    side = jnp.asarray([[6.0, 4.0, 0.0]])
    t_b = float(sample_shadow(behind, dsm)[0])
    t_s = float(sample_shadow(side, dsm)[0])
    assert t_b < 0.3, f"occluded point not shadowed: T={t_b}"
    assert t_s > 0.9, f"unoccluded point wrongly shadowed: T={t_s}"


def test_hybrid_pipeline_shadows_change_image():
    cfg = RenderConfig(width=64, height=64, sh_degree=0,
                       pipeline=Pipeline.HYBRID)
    # blob + a big receiver slab below it
    blob = blocker_scene()
    slab = random_splats(jax.random.key(1), 200, sh_degree=0, extent=4.0,
                         scale_range=(-1.5, -1.0))
    slab = dataclasses.replace(
        slab,
        means=slab.means * jnp.asarray([1.0, 0.05, 1.0]) + jnp.asarray([0., 4.0, 0.]),
        opacities=jnp.full_like(slab.opacities, 4.0))
    merged = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                          jax.tree.map(jnp.asarray, blob),
                          jax.tree.map(jnp.asarray, slab.prepare()))
    cam = look_at([0, -2.0, -12.0], [0, 2.0, 0], [0, 1, 0], 64, 64)
    light = make_light(LightType.POINT, position=(0.0, -8.0, 0.0), intensity=1.5)

    _, shaded_sh, _ = render_hybrid(merged, cam, cfg, 65536, lights=(light,),
                                    shadow_res=128)
    out_nosh, shaded_nosh, _ = render_hybrid(merged, cam, cfg, 65536, lights=())
    a, b = np.asarray(shaded_sh), np.asarray(shaded_nosh)
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() > 1e-3  # shadows visibly darken something


def test_hybrid_gut_dispatch():
    cfg = RenderConfig(width=64, height=48, sh_degree=0,
                       pipeline=Pipeline.HYBRID_3DGUT)
    splats = random_splats(jax.random.key(2), 100, sh_degree=0,
                           scale_range=(-2.5, -1.2))
    cam = look_at([0, 0, -9], [0, 0, 0], [0, 1, 0], 64, 48)
    out = render(splats.prepare(), cam, cfg, max_pairs=32768)
    assert np.isfinite(np.asarray(out.image)).all()
