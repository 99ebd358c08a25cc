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


def blend_ftb(alpha: jax.Array, color_sorted: jax.Array, background):
    """Shared front-to-back compositing: alpha (P,N) in sorted order,
    color_sorted (N,3). Returns (rgb (P,3), transmittance (P,))."""
    q = 1.0 - alpha
    t_excl = jnp.concatenate(
        [jnp.ones_like(q[:, :1]), jnp.cumprod(q, axis=1)[:, :-1]], axis=1)
    w = alpha * t_excl
    rgb = w @ color_sorted
    t_final = jnp.prod(q, axis=1)
    bg = jnp.asarray(background, jnp.float32)
    return rgb + t_final[:, None] * bg, t_final


def rasterize_naive_gut(
    prepared,
    proj: ProjectedSplats,
    dirs: jax.Array,      # (H,W,3) unit ray directions (world/model space)
    origins: jax.Array,   # (H,W,3) ray origins
    rc: RasterConfig = RasterConfig(),
    kernel_degree: int = 2,
    kernel_min_response: float = 0.0113,
    splat_scale: float = 1.0,
    background=(0.0, 0.0, 0.0),
):
    """Oracle for the gut3d response: per-pixel exact 3D ray evaluation over
    all splats in depth order (particleProcessHitGut, threedgrt.h.slang:238-278
    + the FTB blend of threedgut_raster.frag.slang)."""
    from vk_gaussian_splatting_tpu.ops.response import kernel_response
    from vk_gaussian_splatting_tpu.scene.splat_set import quat_to_rotmat

    h, w = dirs.shape[:2]
    depth_sorted = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_sorted, stable=True)

    pos = prepared.means[order]                        # (N,3)
    scl = jnp.exp(prepared.scales_log[order]) * splat_scale
    rot = quat_to_rotmat(prepared.quats[order])        # (N,3,3)
    op = proj.alpha[order]
    color = proj.color[order]
    valid = proj.valid[order]

    d = dirs.reshape(-1, 1, 3)                         # (P,1,3)
    o = origins.reshape(-1, 1, 3)
    hp = jax.lax.Precision.HIGHEST
    rel = o - pos[None]                                # (P,N,3)
    oc = jnp.einsum("pni,nij->pnj", rel, rot,
                    precision=hp) / jnp.maximum(scl[None], 1e-12)
    dc = jnp.einsum("pni,nij->pnj", jnp.broadcast_to(d, rel.shape), rot,
                    precision=hp) / jnp.maximum(scl[None], 1e-12)
    dc = dc / jnp.linalg.norm(dc, axis=-1, keepdims=True).clip(1e-15)
    cr = jnp.cross(dc, oc)
    dist_sq = jnp.sum(cr * cr, axis=-1)                # (P,N)

    resp = kernel_response(dist_sq, kernel_degree)
    a_raw = op[None] * resp
    mask = (a_raw > rc.alpha_min) & (resp > kernel_min_response) & valid[None]
    alpha = jnp.where(mask, jnp.minimum(a_raw, rc.alpha_clamp), 0.0)

    rgb, t_final = blend_ftb(alpha, color, background)
    return rgb.reshape(h, w, 3), t_final.reshape(h, w)


def raytrace_naive_exact(
    prepared,
    proj: ProjectedSplats,
    dirs: jax.Array,
    origins: jax.Array,
    rc: RasterConfig = RasterConfig(),
    kernel_degree: int = 2,
    kernel_min_response: float = 0.0113,
    splat_scale: float = 1.0,
    background=(0.0, 0.0, 0.0),
):
    """Gold-standard ray tracer: *exact per-ray* front-to-back ordering by the
    canonical hit parameter t = -(o_c . d_c) (threedgrt_raytrace.rint:159-172),
    i.e. what the reference's k-buffer marching converges to with unlimited
    passes. O(P * N log N) — tiny scenes only; used to quantify how close the
    production sort orders (radial / view-z) get."""
    from vk_gaussian_splatting_tpu.ops.response import kernel_response
    from vk_gaussian_splatting_tpu.scene.splat_set import quat_to_rotmat

    h, w = dirs.shape[:2]
    pos = prepared.means
    scl = jnp.exp(prepared.scales_log) * splat_scale
    rot = quat_to_rotmat(prepared.quats)
    op = proj.alpha
    color = proj.color
    valid = proj.valid

    d = dirs.reshape(-1, 1, 3)
    o = origins.reshape(-1, 1, 3)
    hp = jax.lax.Precision.HIGHEST
    rel = o - pos[None]
    oc = jnp.einsum("pni,nij->pnj", rel, rot,
                    precision=hp) / jnp.maximum(scl[None], 1e-12)
    dcu = jnp.einsum("pni,nij->pnj", jnp.broadcast_to(d, rel.shape), rot,
                     precision=hp) / jnp.maximum(scl[None], 1e-12)
    dc = dcu / jnp.linalg.norm(dcu, axis=-1, keepdims=True).clip(1e-15)
    cr = jnp.cross(dc, oc)
    dist_sq = jnp.sum(cr * cr, axis=-1)
    # world-units hit parameter (rint:159-172): canonical t divided by the
    # canonical direction scale so values compare across splats
    t_hit = -jnp.sum(oc * dcu, axis=-1) / jnp.maximum(
        jnp.sum(dcu * dcu, axis=-1), 1e-20)

    resp = kernel_response(dist_sq, kernel_degree)
    a_raw = op[None] * resp
    mask = (a_raw > rc.alpha_min) & (resp > kernel_min_response) & valid[None]
    alpha = jnp.where(mask, jnp.minimum(a_raw, rc.alpha_clamp), 0.0)

    order = jnp.argsort(jnp.where(mask, t_hit, jnp.inf), axis=1)   # per ray
    alpha_s = jnp.take_along_axis(alpha, order, axis=1)
    col_s = color[order]                                # (P,N,3)

    q = 1.0 - alpha_s
    t_excl = jnp.concatenate(
        [jnp.ones_like(q[:, :1]), jnp.cumprod(q, axis=1)[:, :-1]], axis=1)
    wgt = alpha_s * t_excl
    rgb = jnp.einsum("pn,pnc->pc", wgt, col_s)
    t_final = jnp.prod(q, axis=1)
    bg = jnp.asarray(background, jnp.float32)
    img = rgb + t_final[:, None] * bg
    return img.reshape(h, w, 3), t_final.reshape(h, w)
