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


def test_ray_shadows_continuous_and_consistent():
    """Per-ray shadows (rt.shadows='ray', the reference's per-pixel shadow
    trace rgen:1261-1464) must produce CONTINUOUS transmittance through a
    soft blocker where the deep-shadow-map staircase quantizes to <=5 levels,
    while agreeing with the map on the hard in/out classification."""
    import dataclasses

    import jax.numpy as jnp

    from vk_gaussian_splatting_tpu.render.shadows import (
        make_ray_shadow_fn,
        make_shadow_fn,
    )
    from vk_gaussian_splatting_tpu.scene.lights import LightType, make_light

    cfg = RenderConfig(width=32, height=32, sh_degree=0)
    # one wide soft blocker splat between the light and a receiving line
    base = random_splats(jax.random.key(21), 1, sh_degree=0)
    splats = dataclasses.replace(
        base, means=np.asarray([[0.0, 2.0, 0.0]], np.float32),
        opacities=np.full((1,), 1.5, np.float32),
        scales=np.log(np.full((1, 3), 0.8, np.float32))).prepare()
    light = make_light(LightType.POINT, position=[0.0, 6.0, 0.0],
                       intensity=3.0)

    # receiving points on a line under the blocker: x in [-4, 4]
    xs = np.linspace(-4, 4, 41, dtype=np.float32)
    pts = jnp.asarray(np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)],
                               axis=1))

    ray_fn = make_ray_shadow_fn(splats, cfg)
    t_ray = np.asarray(ray_fn(pts, light))
    map_fn = make_shadow_fn(splats, (light,), cfg, res=128)
    t_map = np.asarray(map_fn(pts, light))

    # center occluded, edges lit — both paths agree on that
    assert t_ray[20] < 0.35 and t_map[20] < 0.8, (t_ray[20], t_map[20])
    assert t_ray[0] > 0.9 and t_map[0] > 0.9, (t_ray[0], t_map[0])
    # the ray path resolves a smooth penumbra; the map is a <=5-level
    # staircase by construction
    assert len(np.unique(np.round(t_ray, 3))) > 8
    assert len(np.unique(np.round(t_map, 3))) <= 5
    # monotone falloff from the lit edge into the umbra
    half = t_ray[:21]
    assert np.all(np.diff(half) < 1e-3)


def test_colored_shadow_tint_formula():
    """shadow_tint reproduces the reference post-loop (rgen:1446-1460):
    black below threshold, tinted transmission zone, no tint at T=1."""
    import jax.numpy as jnp

    from vk_gaussian_splatting_tpu.render.shadows import shadow_tint

    rad = jnp.asarray([[0.8, 0.2, 0.1]])
    # below threshold -> black regardless of color
    out = shadow_tint(jnp.asarray([0.5]), rad, threshold=0.8, strength=1.0)
    assert np.allclose(np.asarray(out), 0.0)
    # fully transmissive -> exactly 1 (tint fades at scaledT = 1)
    out = shadow_tint(jnp.asarray([1.0]), rad, threshold=0.8, strength=1.0)
    assert np.allclose(np.asarray(out), 1.0)
    # transmission zone: channel ratios follow the normalized radiance,
    # red (max channel) the brightest
    out = np.asarray(shadow_tint(jnp.asarray([0.9]), rad, threshold=0.8,
                                 strength=1.0))[0]
    assert out[0] > out[1] > out[2] > 0.0
    assert np.isclose(out[0], 0.5)  # max channel = scaledT exactly
    # strength 0 with threshold 0 degenerates to the raw scalar T
    out = shadow_tint(jnp.asarray([0.37]), rad, threshold=0.0, strength=0.0)
    assert np.allclose(np.asarray(out), 0.37)


def test_colored_ray_shadows_tint_matches_blocker_color():
    """A red blocker's colored shadow is redder than its green/blue; the
    map path's tint image agrees with the ray path on channel ORDER."""
    import dataclasses

    import jax.numpy as jnp

    from vk_gaussian_splatting_tpu.render.shadows import (
        make_ray_shadow_fn,
        render_deep_shadow_map,
        sample_shadow_colored,
    )
    from vk_gaussian_splatting_tpu.scene.lights import LightType, make_light

    base = random_splats(jax.random.key(5), 1, sh_degree=0)
    red = dataclasses.replace(
        base, means=np.asarray([[0.0, 2.0, 0.0]], np.float32),
        opacities=np.full((1,), 1.0, np.float32),
        sh_dc=np.asarray([[2.0, -1.0, -1.5]], np.float32),  # red
        scales=np.log(np.full((1, 3), 0.8, np.float32))).prepare()
    light = make_light(LightType.POINT, position=[0.0, 6.0, 0.0])
    cfg = RenderConfig(width=32, height=32, sh_degree=0).replace(
        rt=dataclasses.replace(
            RenderConfig().rt, shadow_transmittance_threshold=0.2,
            shadow_color_strength=1.0))

    pts = jnp.asarray([[0.0, 0.0, 0.0]])
    t_ray = np.asarray(make_ray_shadow_fn(red, cfg)(pts, light))[0]
    assert t_ray.shape == (3,)
    assert t_ray[0] > t_ray[1] and t_ray[0] > t_ray[2], t_ray

    dsm = render_deep_shadow_map(red, light, cfg, res=64)
    t_map = np.asarray(sample_shadow_colored(pts, dsm, 0.2, 1.0))[0]
    assert t_map[0] >= t_map[1] and t_map[0] >= t_map[2], t_map


def test_colored_mesh_shadows_glass_tint():
    """A glass quad between light and probe filters the shadow by its
    material transmittance; an opaque quad blacks it out (rgen:1320-1340)."""
    import dataclasses

    import jax.numpy as jnp

    from vk_gaussian_splatting_tpu.render.mesh_raster import MeshBuffers
    from vk_gaussian_splatting_tpu.render.shadows import make_ray_shadow_fn
    from vk_gaussian_splatting_tpu.scene.lights import LightType, make_light

    # far-away splat so particle T ~ 1 on the probe ray
    bg = random_splats(jax.random.key(6), 1, sh_degree=0)
    bg = dataclasses.replace(
        bg, means=np.asarray([[50.0, 0.0, 0.0]], np.float32)).prepare()

    def quad(illum, trans):
        v = jnp.asarray([[-2, 2, -2], [2, 2, -2], [2, 2, 2], [-2, 2, 2]],
                        jnp.float32)
        f = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        ones = jnp.ones((2, 3), jnp.float32)
        return MeshBuffers(
            positions=v, normals=jnp.tile(jnp.asarray([[0., -1., 0.]]),
                                          (4, 1)),
            indices=f, face_colors=ones * 0.5, face_emission=ones * 0,
            face_ambient=ones * 0, face_specular=ones * 0,
            face_shininess=jnp.ones((2,)),
            face_transmittance=jnp.tile(jnp.asarray([trans], jnp.float32),
                                        (2, 1)),
            face_ior=jnp.full((2,), 1.5),
            face_illum=jnp.full((2,), illum, jnp.int32))

    light = make_light(LightType.POINT, position=[0.0, 6.0, 0.0])
    cfg = RenderConfig(width=32, height=32, sh_degree=0)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [8.0, 0.0, 0.0]])

    glass = quad(4, [0.9, 0.1, 0.1])
    t = np.asarray(make_ray_shadow_fn(bg, cfg, meshes=glass)(pts, light))
    assert t.shape == (2, 3)
    assert t[0, 0] > 0.8 and t[0, 1] < 0.2, t[0]   # red glass filter
    assert np.all(t[1] > 0.95), t[1]               # side probe unoccluded

    opaque = quad(0, [0.0, 0.0, 0.0])
    t = np.asarray(make_ray_shadow_fn(bg, cfg, meshes=opaque)(pts, light))
    assert np.all(t[0] < 1e-6), t[0]


def test_enclosed_point_light_cube_shadow():
    """A point light INSIDE the scene bounds gets a cube map via
    make_shadow_fn; occlusion works in opposite directions at once (a
    single-cone map cannot express this), and the cube agrees with the
    per-ray oracle on in/out classification."""
    import dataclasses

    import jax.numpy as jnp

    from vk_gaussian_splatting_tpu.render.shadows import (
        make_ray_shadow_fn,
        make_shadow_fn,
    )
    from vk_gaussian_splatting_tpu.scene.lights import LightType, make_light

    # two dense blobs left and right of an interior light; probes beyond
    base = random_splats(jax.random.key(7), 300, sh_degree=0, extent=0.5,
                         scale_range=(-1.4, -1.0))
    means = np.array(base.means, np.float32)
    means[:150] += np.asarray([3.0, 0.0, 0.0], np.float32)
    means[150:] += np.asarray([-3.0, 0.0, 0.0], np.float32)
    blobs = dataclasses.replace(
        base, means=jnp.asarray(means),
        opacities=jnp.full_like(base.opacities, 6.0)).prepare()
    light = make_light(LightType.POINT, position=[0.0, 0.0, 0.0])
    cfg = RenderConfig(width=32, height=32, sh_degree=0)

    fn = make_shadow_fn(blobs, (light,), cfg, res=128)

    pts = jnp.asarray([[7.0, 0.0, 0.0], [-7.0, 0.0, 0.0],
                       [0.0, 7.0, 0.0]])
    t_cube = np.asarray(fn(pts, light))
    ray_fn = make_ray_shadow_fn(blobs, cfg)
    t_ray = np.asarray(ray_fn(pts, light))
    # both opposite probes occluded, the perpendicular one lit — in both
    # paths (a single cone can cover at most one of the first two)
    for t in (t_cube, t_ray):
        assert t[0] < 0.4 and t[1] < 0.4, t
        assert t[2] > 0.85, t
