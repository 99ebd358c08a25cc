"""Splat shadows via per-light deep shadow maps.

The reference traces per-pixel shadow rays through the particle BVH
(rgen:1261-1464: any-hit transmittance accumulation toward each light with
``particleShadowOffset`` self-shadow bias and a transmittance threshold). The
TPU-native equivalent renders, per light, a *deep shadow map*: one gs2d pass
from the light's viewpoint with the tile blender's multi-iso depth picks —
the depths at which transmittance crosses (0.75, 0.5, 0.25, 0.05) — giving a
piecewise-constant T(depth) staircase per light pixel. The deferred pass
projects each shade point into the light frustum and reads off its
transmittance level.

Exactness: the staircase quantizes transmittance to 5 levels and the light
frustum is a single perspective cone (point/spot lights anywhere outside the
scene work; fully-enclosed point lights would need a cube map — future work;
directional lights use a far-away narrow-fov frustum). The reference's
per-ray marching is exact; this trades that for one raster pass per light.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import RenderConfig, tiles_x, tiles_y
from vk_gaussian_splatting_tpu.ops.projection import project_splats
from vk_gaussian_splatting_tpu.ops.rasterize_pallas import (
    RasterStatics,
    assemble_image,
    rasterize_bins,
)
from vk_gaussian_splatting_tpu.scene.cameras import Camera, make_camera
from vk_gaussian_splatting_tpu.scene.lights import LightSource, LightType
from vk_gaussian_splatting_tpu.scene.splat_set import PreparedSplats

ISO_LEVELS = (0.75, 0.5, 0.25, 0.05)


def scene_bounds(prepared: PreparedSplats):
    lo = prepared.means.min(axis=0)
    hi = prepared.means.max(axis=0)
    center = 0.5 * (lo + hi)
    radius = jnp.maximum(jnp.linalg.norm(hi - lo) * 0.5, 1e-3)
    return center, radius


def light_camera(light: LightSource, center, radius, res: int) -> Camera:
    """Perspective frustum from the light covering the scene bounding sphere."""
    is_dir = light.type == LightType.DIRECTIONAL
    dirn = light.direction / jnp.maximum(jnp.linalg.norm(light.direction), 1e-9)
    pos = jnp.where(is_dir, center - dirn * (20.0 * radius), light.position)

    fwd = center - pos
    dist = jnp.maximum(jnp.linalg.norm(fwd), 1e-6)
    fwd = fwd / dist
    upw = jnp.where(jnp.abs(fwd[1]) > 0.95,
                    jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    right = jnp.cross(fwd, upw)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
    down = jnp.cross(fwd, right)
    r = jnp.stack([right, down, fwd], axis=0)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    viewmat = viewmat.at[:3, :3].set(r)
    viewmat = viewmat.at[:3, 3].set(-r @ pos)

    # focal so the bounding sphere fits with margin (tan fov/2 = r*1.1/dist)
    tan_half = jnp.clip(radius * 1.1 / dist, 0.05, 3.0)
    f = 0.5 * res / tan_half
    near = jnp.maximum(dist - radius * 1.2, 1e-3)
    far = dist + radius * 1.2
    return make_camera(viewmat, f, f, res * 0.5, res * 0.5, near, far)


@dataclasses.dataclass
class DeepShadowMap:
    cam: Camera
    breakpoints: jax.Array   # (res, res, 4) depth at T crossing ISO_LEVELS


def render_deep_shadow_map(prepared: PreparedSplats, light: LightSource,
                           cfg: RenderConfig, res: int = 512,
                           max_pairs: int | None = None,
                           interpret: bool | None = None) -> DeepShadowMap:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    center, radius = scene_bounds(prepared)
    cam = light_camera(light, center, radius, res)
    light_cfg = cfg.replace(width=res, height=res)
    if max_pairs is None:
        max_pairs = max(4 * prepared.num_splats, 1 << 18)

    proj = project_splats(prepared, cam, light_cfg)
    from vk_gaussian_splatting_tpu.render.pipelines import (
        bin_for_cfg,
        gs_attr_rows,
    )
    bins = bin_for_cfg(proj, gs_attr_rows(proj), light_cfg, max_pairs)
    st = RasterStatics(
        tiles_x=tiles_x(light_cfg), tiles_y=tiles_y(light_cfg),
        chunk=cfg.raster.chunk, model="gs2d", multi_iso=True,
        iso_thresholds=ISO_LEVELS, interpret=interpret)
    out = rasterize_bins(bins, None, None, st)
    # rows 4-7 hold the iso depths; reuse assemble for layout then slice
    from vk_gaussian_splatting_tpu.ops.rasterize_pallas import OUT_COLS, PIX, TILE
    empty = jnp.zeros((out.shape[0], OUT_COLS, PIX), jnp.float32)
    live = (bins.seg_counts > 0)[:, None, None]
    out = jnp.where(live, out, empty)
    ty, tx = tiles_y(light_cfg), tiles_x(light_cfg)
    blocks = out.reshape(ty, tx, OUT_COLS, TILE, TILE)
    full = blocks.transpose(0, 3, 1, 4, 2).reshape(ty * TILE, tx * TILE,
                                                   OUT_COLS)
    return DeepShadowMap(cam=cam, breakpoints=full[:res, :res, 4:8])


def sample_shadow(world_pos: jax.Array, dsm: DeepShadowMap,
                  shadow_offset: float = 0.05) -> jax.Array:
    """(...,3) world points -> (...) transmittance toward the light.

    shadow_offset biases the comparison toward the light
    (FrameInfo.particleShadowOffset self-shadow bias)."""
    cam = dsm.cam
    p_view = jnp.matmul(world_pos, cam.viewmat[:3, :3].T,
                        precision=jax.lax.Precision.HIGHEST) \
        + cam.viewmat[:3, 3]
    z = p_view[..., 2]
    zs = jnp.maximum(z, 1e-6)
    u = cam.fx * p_view[..., 0] / zs + cam.cx
    v = cam.fy * p_view[..., 1] / zs + cam.cy
    res_y, res_x = dsm.breakpoints.shape[:2]
    ui = jnp.clip(u.astype(jnp.int32), 0, res_x - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, res_y - 1)
    bp = dsm.breakpoints[vi, ui]                        # (...,4)

    zb = (z - shadow_offset)[..., None]
    t = jnp.ones_like(z)
    for i, level in enumerate(ISO_LEVELS):
        crossed = (bp[..., i] > 0) & (zb[..., 0] > bp[..., i])
        t = jnp.where(crossed, level, t)
    # fully behind the deepest breakpoint: extrapolate to opaque
    deep = (bp[..., 3] > 0) & (zb[..., 0] > bp[..., 3])
    t = jnp.where(deep, 0.0, t)
    # outside the frustum (behind the light or off the map): unshadowed —
    # the map only covers the scene bounding sphere
    inside = (z > 0) & (u >= 0) & (u < res_x) & (v >= 0) & (v < res_y)
    return jnp.where(inside, t, 1.0)


def make_shadow_fn(prepared: PreparedSplats, lights, cfg: RenderConfig,
                   res: int = 512, interpret: bool | None = None):
    """Builds deferred_shade's shadow_fn: one deep shadow map per light."""
    maps = {id(light): render_deep_shadow_map(prepared, light, cfg, res,
                                              interpret=interpret)
            for light in lights}

    def shadow_fn(world_pos, light):
        return sample_shadow(world_pos, maps[id(light)])

    return shadow_fn


def make_ray_shadow_fn(prepared: PreparedSplats, cfg: RenderConfig,
                       shadow_offset: float = 0.05, chunk: int = 256,
                       ray_block: int = 2048):
    """Exact per-ray shadow transmittance (the reference's per-pixel shadow
    trace, rgen:1261-1464): one ray per shade point toward the light,
    integrating splat opacity with ops/raytrace.trace_splats. Continuous
    transmittance (no 5-level staircase) and correct for enclosed point
    lights — at per-frame trace cost; deep shadow maps remain the fast path
    (rt.shadows config selects)."""
    from vk_gaussian_splatting_tpu.ops.raytrace import trace_splats
    from vk_gaussian_splatting_tpu.scene.lights import LightType

    def shadow_fn(world_pos, light):
        shape = world_pos.shape[:-1]
        p = world_pos.reshape(-1, 3)
        is_dir = light.type == LightType.DIRECTIONAL
        dirn = light.direction / jnp.maximum(
            jnp.linalg.norm(light.direction), 1e-9)
        to_light = jnp.where(is_dir, -dirn[None, :], light.position - p)
        dist = jnp.linalg.norm(to_light, axis=-1)
        d = to_light / jnp.maximum(dist[:, None], 1e-9)
        t_max = jnp.where(is_dir, jnp.inf, dist)
        res = trace_splats(
            prepared, p, d,
            jnp.full((p.shape[0],), shadow_offset), t_max, cfg,
            chunk=chunk, ray_block=ray_block, order="radial")
        return res.transmittance.reshape(shape)

    return shadow_fn
