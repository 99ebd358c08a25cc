"""Reference (oracle) rasterizer: naive per-pixel blend over all splats.

Implements exactly the fragment math of threedgs_raster.frag.slang:236-309 —
``A = dot(fragPos, fragPos)`` Gaussian falloff with discard at A > 8, opacity
``exp(-0.5 A) * alpha``, and sorted front-to-back "under" compositing
``w = α·T, T *= (1-α)`` — but vectorized over (pixels × splats) with no tile
binning. O(H·W·N) memory: use only for small test scenes. Fully differentiable
by JAX autodiff; the Pallas tile rasterizer is validated against this, both for
images and for gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vk_gaussian_splatting_tpu.config import RasterConfig
from vk_gaussian_splatting_tpu.ops.projection import ProjectedSplats


def rasterize_naive(
    proj: ProjectedSplats,
    width: int,
    height: int,
    rc: RasterConfig = RasterConfig(),
    background=(0.0, 0.0, 0.0),
):
    """Returns (img (H,W,3), transmittance (H,W)). Front-to-back over depth order."""
    n = proj.xy.shape[0]
    depth_sorted = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_sorted, stable=True)

    xy = proj.xy[order]
    conic = proj.conic[order]
    color = proj.color[order]
    alpha = proj.alpha[order]
    valid = proj.valid[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    px = xs.reshape(-1, 1)  # (P,1)
    py = ys.reshape(-1, 1)

    dx = px - xy[None, :, 0]  # (P,N)
    dy = py - xy[None, :, 1]
    d = (conic[None, :, 0] * dx * dx
         + 2.0 * conic[None, :, 1] * dx * dy
         + conic[None, :, 2] * dy * dy)
    g = jnp.exp(-0.5 * d)
    a_raw = alpha[None, :] * g
    mask = (d <= rc.alpha_cull_qmax) & (a_raw >= rc.alpha_min) & valid[None, :]
    a = jnp.where(mask, jnp.minimum(a_raw, rc.alpha_clamp), 0.0)

    q = 1.0 - a
    # exclusive running transmittance: shift, don't divide (q can be tiny)
    t_excl = jnp.concatenate([jnp.ones_like(q[:, :1]), jnp.cumprod(q, axis=1)[:, :-1]], axis=1)
    w = a * t_excl  # (P,N)
    rgb = w @ color  # (P,3)
    t_final = jnp.prod(q, axis=1)  # (P,)

    bg = jnp.asarray(background, jnp.float32)
    img = rgb + t_final[:, None] * bg
    return img.reshape(height, width, 3), t_final.reshape(height, width)
