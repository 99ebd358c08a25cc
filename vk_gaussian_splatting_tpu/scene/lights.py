"""Light sources (H10, light_manager_vk.{h,cpp}; shaderio LightSource).

Point / spot / directional lights with the reference's attenuation modes and
the energy-conserving Phong model of wavefront.h.slang:122-232, 388-403 —
evaluated as vectorized jnp over full images in deferred shading and over
shade points in ray-traced lighting.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp


class LightType(enum.IntEnum):
    POINT = 0
    SPOT = 1
    DIRECTIONAL = 2


class AttenuationMode(enum.IntEnum):
    NONE = 0
    LINEAR = 1
    QUADRATIC = 2
    PHYSICAL = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LightSource:
    """All-array light record so lists of lights stack into batched pytrees."""

    type: jax.Array           # () i32 LightType
    position: jax.Array       # (3,)
    direction: jax.Array      # (3,)
    color: jax.Array          # (3,)
    intensity: jax.Array      # ()
    range: jax.Array          # ()
    attenuation_mode: jax.Array  # () i32
    inner_cone_deg: jax.Array    # ()
    outer_cone_deg: jax.Array    # ()
    radius: jax.Array            # () soft-shadow disk radius


def make_light(light_type: LightType = LightType.POINT,
               position=(0, 0, 0), direction=(0, 0, -1), color=(1, 1, 1),
               intensity=1.0, range=1e10,
               attenuation=AttenuationMode.NONE,
               inner_cone_deg=20.0, outer_cone_deg=30.0,
               radius=0.0) -> LightSource:
    f = lambda v: jnp.asarray(v, jnp.float32)
    return LightSource(
        type=jnp.asarray(int(light_type), jnp.int32),
        position=f(position), direction=f(direction), color=f(color),
        intensity=f(intensity), range=f(range),
        attenuation_mode=jnp.asarray(int(attenuation), jnp.int32),
        inner_cone_deg=f(inner_cone_deg), outer_cone_deg=f(outer_cone_deg),
        radius=f(radius),
    )


def headlight(camera_position) -> LightSource:
    """Camera-attached fallback light (wavefront.h.slang:106-119)."""
    return make_light(LightType.POINT, position=camera_position)


def _attenuation(mode, distance, rng):
    return jnp.select(
        [mode == 1, mode == 2, mode == 3],
        [jnp.maximum(1.0 - distance / rng, 0.0),
         1.0 / (1.0 + distance * distance),
         1.0 / (distance * distance + 0.01)],
        1.0,
    )


def compute_light(light: LightSource, world_pos: jax.Array,
                  world_nrm: jax.Array) -> jax.Array:
    """Diffuse irradiance term (computeLight, wavefront.h.slang:122-232).
    world_pos/world_nrm (..., 3) -> (..., 3)."""
    to_light = light.position - world_pos
    dist = jnp.linalg.norm(to_light, axis=-1)
    l_pt = to_light / jnp.maximum(dist, 1e-12)[..., None]
    l_dir = -light.direction / jnp.maximum(
        jnp.linalg.norm(light.direction), 1e-12)
    is_dir = light.type == LightType.DIRECTIONAL
    l_vec = jnp.where(is_dir, l_dir, l_pt)

    ndotl = jnp.maximum(jnp.sum(world_nrm * l_vec, axis=-1), 0.0)
    att = _attenuation(light.attenuation_mode, dist, light.range)
    att = jnp.where(is_dir, 1.0, att * (dist <= light.range))

    # spot cone falloff (computeSpotLight :208-226)
    spot_dir = light.direction / jnp.maximum(
        jnp.linalg.norm(light.direction), 1e-12)
    cos_theta = jnp.sum(l_pt * (-spot_dir), axis=-1)
    inner = jnp.cos(jnp.deg2rad(light.inner_cone_deg))
    outer = jnp.cos(jnp.deg2rad(light.outer_cone_deg))
    spot = jnp.clip((cos_theta - outer) / jnp.maximum(inner - outer, 1e-6),
                    0.0, 1.0)
    spot = spot * spot * (3.0 - 2.0 * spot)  # smoothstep
    att = jnp.where(light.type == LightType.SPOT, att * spot, att)

    return (light.color * light.intensity)[..., :] * (ndotl * att)[..., None]


def light_direction_to(light: LightSource, world_pos: jax.Array):
    """(dir-to-light (...,3), distance (...)) for shadow rays
    (computeLightToSurfaceVector, wavefront.h.slang:33-70)."""
    to_light = light.position - world_pos
    dist = jnp.linalg.norm(to_light, axis=-1)
    l_pt = to_light / jnp.maximum(dist, 1e-12)[..., None]
    l_dir = -light.direction / jnp.maximum(
        jnp.linalg.norm(light.direction), 1e-12)
    is_dir = light.type == LightType.DIRECTIONAL
    d = jnp.where(is_dir, l_dir, l_pt)
    dist = jnp.where(is_dir, 1e10, dist)
    return d, dist


def compute_specular(specular, shininess, view_dir, light_dir, normal):
    """Energy-conserving Phong (wavefrontComputeSpecular,
    wavefront.h.slang:388-403)."""
    k_shin = jnp.maximum(shininess, 4.0)
    energy = (2.0 + k_shin) / (2.0 * jnp.pi)
    v = -view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12)
    r = -light_dir + 2.0 * jnp.sum(light_dir * normal, axis=-1,
                                   keepdims=True) * normal
    spec = energy * jnp.maximum(jnp.sum(v * r, axis=-1), 0.0) ** k_shin
    return specular * spec[..., None]
