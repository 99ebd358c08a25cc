"""EWA splat projection (the 3DGS path).

Re-implements, TPU-vectorized over all splats at once, the per-splat math of the
reference's raster shaders:

- covariance projection J·W·Σ·Wᵀ·Jᵀ (threedgs.h.slang:26-56,
  ``threedgsCovarianceProjection``)
- low-pass dilation +0.3 px, Mip-Splatting alpha compensation
  sqrt(det_orig / det_blur), eigenvalue extent with sqrt(8)·σ radius clamped to
  2048 px (threedgs.h.slang:60-121, ``threedgsProjectedExtentBasis``)
- NDC center frustum cull with dilation margin and optional screen-size cull
  (dist.comp.slang:64-133)

Unlike the reference (which rasterizes an oriented quad from eigen basis
vectors), the tile rasterizer consumes the *conic* (inverse 2D covariance)
directly — the INRIA formulation the reference documents in its comments
(threedgs.h.slang:85-90). Both formulations evaluate the same Gaussian.

Everything here is plain jnp: XLA fuses it into one elementwise pass; autodiff
provides the backward for free (the custom-VJP boundary is the tile blender).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vk_gaussian_splatting_tpu.config import RenderConfig, CameraType
from vk_gaussian_splatting_tpu.ops.sh import eval_sh_radiance
from vk_gaussian_splatting_tpu.scene.cameras import Camera, view_transform_points
from vk_gaussian_splatting_tpu.scene.splat_set import PreparedSplats, dequantize_sh


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProjectedSplats:
    """Per-splat 2D render attributes (all (N,...) f32 except valid)."""

    xy: jax.Array       # (N,2) pixel-space projected center
    conic: jax.Array    # (N,3) inverse 2D covariance (a, b, c)
    depth: jax.Array    # (N,)  view-space z
    radius: jax.Array   # (N,)  extent radius in pixels (0 = culled)
    color: jax.Array    # (N,3) rgb (base + SH radiance)
    alpha: jax.Array    # (N,)  opacity (incl. MS compensation)
    valid: jax.Array    # (N,)  bool


def unpack_cov3d(cov6: jax.Array) -> jax.Array:
    """(N,6) packed xx,xy,xz,yy,yz,zz -> (N,3,3)."""
    xx, xy, xz, yy, yz, zz = (cov6[:, i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )


def ewa_project_cov(
    cov3d: jax.Array,      # (N,3,3) world-space covariance
    p_view: jax.Array,     # (N,3) camera-space centers
    fx, fy,
    view_rot: jax.Array,   # (3,3) world->camera rotation
    tan_fovx, tan_fovy,
) -> jax.Array:
    """Project 3D covariance to 2D: returns (N,3) packed (a, b, c) of the 2x2.

    threedgs.h.slang:26-56. The x/z, y/z terms in the Jacobian are clamped to
    1.3·tan(fov) (INRIA's stabilization) so off-frustum splats don't produce
    degenerate conics before the cull masks them.
    """
    x, y, z = p_view[..., 0], p_view[..., 1], p_view[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(x * inv_z, -lim_x, lim_x) * z
    ty = jnp.clip(y * inv_z, -lim_y, lim_y) * z

    zeros = jnp.zeros_like(z)
    j_row0 = jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z * inv_z], -1)
    j_row1 = jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z * inv_z], -1)
    jmat = jnp.stack([j_row0, j_row1], axis=-2)              # (N,2,3)

    t = jnp.einsum("nij,jk->nik", jmat, view_rot)            # (N,2,3) = J @ W
    cov2d = jnp.einsum("nij,njk,nlk->nil", t, cov3d, t)      # T Σ Tᵀ
    return jnp.stack([cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]], -1)


def project_splats(
    prepared: PreparedSplats,
    cam: Camera,
    cfg: RenderConfig,
) -> ProjectedSplats:
    """Full per-splat preprocessing stage (dist.comp + raster mesh-shader math)."""
    rc = cfg.raster
    means = prepared.means
    p_view = view_transform_points(cam.viewmat, means)
    depth = p_view[..., 2]

    zsafe = jnp.where(jnp.abs(depth) < 1e-6, 1e-6, depth)
    u = cam.fx * p_view[..., 0] / zsafe + cam.cx
    v = cam.fy * p_view[..., 1] / zsafe + cam.cy
    xy = jnp.stack([u, v], -1)

    tan_fovx = 0.5 * cfg.width / cam.fx
    tan_fovy = 0.5 * cfg.height / cam.fy

    cov3d = unpack_cov3d(prepared.cov3d)
    cov2d = ewa_project_cov(cov3d, p_view, cam.fx, cam.fy, cam.viewmat[:3, :3],
                            tan_fovx, tan_fovy)

    det_orig = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    a = cov2d[:, 0] + rc.dilation
    b = cov2d[:, 1]
    c = cov2d[:, 2] + rc.dilation
    det = a * c - b * b

    # opacity with optional Mip-Splatting compensation (threedgs.h.slang:63-76)
    alpha = prepared.color[:, 3] * cfg.opacity_gain
    if rc.ms_antialiasing:
        alpha = alpha * jnp.sqrt(jnp.clip(det_orig / jnp.where(det == 0, 1.0, det), 0.0, None))

    det_safe = jnp.where(det <= 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)

    # eigenvalues -> extent radius (threedgs.h.slang:91-118)
    mid = 0.5 * (a + c)
    term = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + term
    lambda2 = mid - term
    if rc.point_cloud_mode:
        lambda1 = jnp.full_like(lambda1, 0.2)
        lambda2 = jnp.full_like(lambda2, 0.2)
    radius = jnp.minimum(rc.extent_sigma * jnp.sqrt(jnp.maximum(lambda1, 0.0)),
                         rc.max_basis_px) * cfg.splat_scale
    radius = jnp.ceil(radius)

    # frustum cull on the center in dilated NDC (dist.comp.slang:64-90)
    clip = 1.0 + rc.frustum_dilation
    ndc_x = (u - cam.cx) / (0.5 * cfg.width)
    ndc_y = (v - cam.cy) / (0.5 * cfg.height)
    valid = (
        (depth > cam.near)
        & (depth < cam.far)
        & (jnp.abs(ndc_x) <= clip)
        & (jnp.abs(ndc_y) <= clip)
        & (det > 0)
        & (lambda2 > 0)
        & (alpha >= rc.alpha_min)
    )

    if rc.size_culling:
        # projected bounding-sphere diameter in pixels (dist.comp.slang:93-133)
        scale_max = jnp.exp(prepared.scales_log).max(axis=-1) * cfg.splat_scale
        extent_px = (scale_max * 2.8284271247 * 2.0) * jnp.maximum(cam.fx, cam.fy) \
            / jnp.maximum(jnp.abs(depth), 1e-4)
        valid = valid & (extent_px >= rc.size_culling_min_px)

    # color = activated base + SH radiance along camera->splat dir
    # (threedgs_raster.mesh.slang:238-243)
    rgb = prepared.color[:, :3]
    if cfg.sh_degree >= 1 and prepared.sh.shape[1] > 0:
        dirs = means - cam.position
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        sh_rad = eval_sh_radiance(dequantize_sh(prepared.sh), dirs, cfg.sh_degree)
        if cfg.show_sh_only:
            rgb = jnp.full_like(rgb, 0.5) + sh_rad
        else:
            rgb = rgb + sh_rad
        rgb = jnp.clip(rgb, 0.0, None)

    radius = jnp.where(valid, radius, 0.0)
    return ProjectedSplats(
        xy=xy, conic=conic, depth=depth, radius=radius,
        color=rgb, alpha=alpha, valid=valid,
    )
