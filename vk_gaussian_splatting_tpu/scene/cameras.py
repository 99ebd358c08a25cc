"""Cameras.

Clean OpenCV-convention re-design of the reference camera stack
(camera_set.h:1-273, shaders/cameras.h.slang:27-105, FrameInfo math in
gaussian_splatting.cpp:1150-1295):

- view matrix maps world -> camera with +x right, +y down, +z forward
  (COLMAP / OpenCV). The reference uses Vulkan clip space; we never build a
  projection matrix — the tile rasterizer works directly in pixel space with
  (fx, fy, cx, cy).
- pinhole and equidistant ("perfect") fisheye models, thin-lens depth of field
  (focus distance + aperture), matching cameras.h.slang ray generation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Dynamic camera parameters (all jax scalars/arrays; shapes stay static).

    viewmat: (4,4) world->camera, OpenCV axes.
    fx, fy, cx, cy: pixel-space intrinsics.
    near, far: clip distances (depth culling only; no projective clip).
    focus_dist, aperture: thin-lens DoF (camera_set.h dofMode/focusDist/aperture).
    """

    viewmat: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    near: jax.Array
    far: jax.Array
    focus_dist: jax.Array
    aperture: jax.Array
    # OpenCV distortion pack (threedgut_camera_models.h.slang:26-42), all
    # zeros = ideal lens: [0:6] rational radial k1..k6, [6:8] tangential
    # p1 p2, [8:12] thin-prism s1..s4, [12:16] fisheye theta-poly k1..k4,
    # [16] fisheye max angle override (0 = auto), [17] pad.
    distortion: jax.Array

    @property
    def world_from_camera(self) -> jax.Array:
        r = self.viewmat[:3, :3]
        t = self.viewmat[:3, 3]
        inv = jnp.eye(4, dtype=self.viewmat.dtype)
        inv = inv.at[:3, :3].set(r.T)
        inv = inv.at[:3, 3].set(-r.T @ t)
        return inv

    @property
    def position(self) -> jax.Array:
        r = self.viewmat[:3, :3]
        return -jnp.matmul(r.T, self.viewmat[:3, 3],
                           precision=jax.lax.Precision.HIGHEST)


def make_camera(
    viewmat,
    fx,
    fy,
    cx,
    cy,
    near=0.01,
    far=1e4,
    focus_dist=1.0,
    aperture=0.0,
    distortion=None,
) -> Camera:
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    if distortion is None:
        distortion = jnp.zeros((18,), jnp.float32)
    return Camera(
        viewmat=f32(viewmat),
        fx=f32(fx), fy=f32(fy), cx=f32(cx), cy=f32(cy),
        near=f32(near), far=f32(far),
        focus_dist=f32(focus_dist), aperture=f32(aperture),
        distortion=f32(distortion),
    )


def look_at(eye, center, up, width: int, height: int, fov_y_rad: float = 0.8,
            near: float = 0.01, far: float = 1e4) -> Camera:
    """Build a pinhole camera looking from eye at center (OpenCV axes: y down)."""
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)  # y-down completes right-handed (x, y, z)=(right, down, fwd)
    r = np.stack([right, down, fwd], axis=0)  # world->camera rotation rows
    t = -r @ eye
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, :3] = r
    viewmat[:3, 3] = t
    fy = 0.5 * height / np.tan(0.5 * fov_y_rad)
    return make_camera(viewmat, fy, fy, width * 0.5, height * 0.5, near, far)


def view_transform_points(viewmat: jax.Array, points: jax.Array) -> jax.Array:
    """(N,3) world points -> camera space via (4,4) viewmat.

    precision=highest: TPU's default f32 matmul runs at bfloat16 precision,
    which visibly shifts projected positions (~1e-3 relative); geometry math
    must use the full-precision MXU passes."""
    return jnp.matmul(points, viewmat[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + viewmat[:3, 3]


def project_pinhole(cam: Camera, p_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Camera-space (N,3) -> pixel (N,2), depth (N,). No clipping (caller masks z)."""
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = cam.fx * p_cam[..., 0] / zs + cam.cx
    v = cam.fy * p_cam[..., 1] / zs + cam.cy
    return jnp.stack([u, v], -1), z


def project_fisheye_equidistant(cam: Camera, p_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Equidistant fisheye r = f * theta (the reference's "perfect fisheye",
    threedgut_camera_projections.h.slang + initPerfectFisheyeCamera in dist.comp.slang:78).
    Returns pixel coords (N,2) and view depth (N,) = |p| * sign(z)·cos? — we
    return the euclidean range along the optical axis direction (z) for sorting.
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    rxy = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(rxy, z)
    scale = jnp.where(rxy > 1e-8, theta / jnp.maximum(rxy, 1e-8), 1.0 / jnp.maximum(z, 1e-8))
    u = cam.fx * x * scale + cam.cx
    v = cam.fy * y * scale + cam.cy
    return jnp.stack([u, v], -1), z


def camera_rays_pinhole(cam: Camera, width: int, height: int):
    """Per-pixel world-space rays (origin (3,), dirs (H,W,3)) — cameras.h.slang:27-60."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    d_cam = jnp.stack(
        [(xs - cam.cx) / cam.fx, (ys - cam.cy) / cam.fy, jnp.ones_like(xs)], -1
    )
    r_wc = cam.viewmat[:3, :3].T
    dirs = jnp.matmul(d_cam, r_wc.T, precision=jax.lax.Precision.HIGHEST)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return cam.position, dirs


def camera_rays_fisheye(cam: Camera, width: int, height: int):
    """Equidistant fisheye ray generation (cameras.h.slang fisheye path)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    mx = (xs - cam.cx) / cam.fx
    my = (ys - cam.cy) / cam.fy
    theta = jnp.sqrt(mx * mx + my * my)
    valid = theta < jnp.pi
    sin_t = jnp.sin(theta)
    safe = jnp.maximum(theta, 1e-8)
    d_cam = jnp.stack(
        [sin_t * mx / safe, sin_t * my / safe, jnp.cos(theta)], -1
    )
    r_wc = cam.viewmat[:3, :3].T
    dirs = d_cam @ r_wc.T
    return cam.position, jnp.where(valid[..., None], dirs, 0.0)


class CameraSet:
    """Host-side camera presets (camera_set.h:116-216): active camera + named list."""

    def __init__(self):
        self.cameras: list[Camera] = []
        self.names: list[str] = []
        self.active: int = -1

    def add(self, cam: Camera, name: str = "") -> int:
        self.cameras.append(cam)
        self.names.append(name or f"camera {len(self.cameras) - 1}")
        if self.active < 0:
            self.active = 0
        return len(self.cameras) - 1

    def get(self) -> Camera:
        return self.cameras[self.active]
