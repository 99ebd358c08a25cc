"""Triangle rasterization + mesh/splat compositing."""

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.io.obj import ObjMaterial, ObjMesh
from vk_gaussian_splatting_tpu.render.mesh_raster import (
    MeshBuffers,
    mesh_buffers_from_obj,
    render_mesh,
)
from vk_gaussian_splatting_tpu.render.pipelines import (
    render_3dgs,
    render_3dgs_composed,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats


def quad_mesh(z=0.0, half=2.0, color=(1.0, 0.2, 0.2)):
    pos = np.asarray([[-half, -half, z], [half, -half, z],
                      [half, half, z], [-half, half, z]], np.float32)
    nrm = np.tile([0, 0, -1.0], (4, 1)).astype(np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = ObjMesh(positions=pos, normals=nrm, indices=idx,
                   mat_indices=np.zeros(2, np.int32),
                   materials=[ObjMaterial(diffuse=color)])
    return mesh_buffers_from_obj(mesh)


def test_mesh_raster_coverage_and_depth():
    cfg = RenderConfig(width=96, height=64, sh_degree=0)
    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    mesh = quad_mesh(z=0.0, half=2.0)
    img, trans, depth, fid = render_mesh(mesh, cam, cfg, 16384)
    trans = np.asarray(trans)
    covered = trans < 0.5
    # center covered, corners not
    assert covered[32, 48] and not covered[2, 2]
    # opaque: T is exactly 0 or 1
    assert ((trans < 1e-6) | (trans > 1 - 1e-6)).all()
    # depth at the quad plane: z distance = 10
    np.testing.assert_allclose(np.asarray(depth)[covered], 10.0, atol=0.2)
    # red-ish color where covered
    img = np.asarray(img)
    assert (img[covered][:, 0] > img[covered][:, 2]).all()
    # coverage matches an analytic projection of the quad extents
    fx = float(cam.fx)
    half_px = 2.0 * fx / 10.0
    xs = np.nonzero(covered.any(axis=0))[0]
    assert abs((xs.max() - xs.min()) / 2 - half_px) < 2.5


def test_composite_occlusion_both_ways():
    cfg = RenderConfig(width=64, height=64, sh_degree=0)
    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    splats = random_splats(jax.random.key(0), 150, sh_degree=0,
                           scale_range=(-2.0, -1.0))
    prepared = splats.prepare()

    # mesh far behind all splats: composite == splats over mesh color
    far_mesh = quad_mesh(z=50.0, half=30.0, color=(0.0, 0.8, 0.0))
    out = render_3dgs_composed(prepared, cam, cfg, 32768, far_mesh)
    plain = render_3dgs(prepared, cam, cfg, 32768)
    img, t = np.asarray(out.image), np.asarray(plain.transmittance)
    # where no splat coverage -> green mesh
    empty = t > 0.999
    if empty.any():
        assert (img[empty][:, 1] > 0.3).all()
    # splat contribution preserved in covered areas
    diff = np.abs(np.asarray(plain.image) - img)
    heavy = t < 0.05
    if heavy.any():
        assert diff[heavy].max() < 0.05

    # mesh in front of all splats: mesh hides splats completely
    near_mesh = quad_mesh(z=-5.0, half=30.0, color=(0.0, 0.0, 0.9))
    out2 = render_3dgs_composed(prepared, cam, cfg, 32768, near_mesh)
    img2 = np.asarray(out2.image)
    # fully covered by the blue quad (flat-shaded headlight value ~0.39)
    assert (np.asarray(out2.transmittance) < 1e-3).all()
    np.testing.assert_allclose(img2[:, :, 2], img2[0, 0, 2], atol=1e-3)
    assert img2[:, :, 0].max() < 1e-3  # no red splats leak through


def _slanted_quad(color=(0.8, 0.8, 0.8)):
    """A quad tilted in depth: z varies linearly from 2 (left) to 8 (right)."""
    pos = np.asarray([[-3, -3, 2.0], [3, -3, 8.0],
                      [3, 3, 8.0], [-3, 3, 2.0]], np.float32)
    n = np.asarray([-1.0, 0, -1.0]) / np.sqrt(2)
    nrm = np.tile(n, (4, 1)).astype(np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = ObjMesh(positions=pos, normals=nrm, indices=idx,
                   mat_indices=np.zeros(2, np.int32),
                   materials=[ObjMaterial(diffuse=color)])
    return mesh_buffers_from_obj(mesh)


def test_smooth_mesh_interpolated_depth():
    """tri2d_smooth must report per-pixel interpolated view depth, not the
    per-face centroid (VERDICT round-1 item 8; threedmesh_raster.vert.slang's
    hardware z interpolation). A quad slanted from z=2 to z=8 must produce a
    smoothly increasing depth ramp; the flat tier produces just two levels."""
    import dataclasses
    cfg = RenderConfig(width=96, height=64, sh_degree=0)
    cam = look_at([0, 0, -6], [0, 0, 2], [0, 1, 0], cfg.width, cfg.height,
                  fov_y_rad=1.0)
    mesh = _slanted_quad()
    _, trans, depth, _ = render_mesh(mesh, cam, cfg, 16384)
    depth = np.asarray(depth)
    covered = np.asarray(trans) < 0.5
    row = depth[32]
    cov = covered[32]
    xs = np.where(cov)[0]
    assert len(xs) > 20
    vals = row[xs]
    # monotone ramp along the slant (either screen direction) with many
    # distinct levels
    d = np.diff(vals)
    assert np.all(d > -1e-3) or np.all(d < 1e-3)
    assert len(np.unique(np.round(vals, 3))) > 10
    assert abs(vals[-1] - vals[0]) > 2.0

    fcfg = cfg.replace(raster=dataclasses.replace(cfg.raster,
                                                  mesh_shading="flat"))
    _, trans_f, depth_f, _ = render_mesh(mesh, cam, fcfg, 16384)
    vals_f = np.asarray(depth_f)[32][np.asarray(trans_f)[32] < 0.5]
    assert len(np.unique(np.round(vals_f, 3))) <= 2   # centroid depth only


def _octa_sphere(subdiv=2, radius=2.0):
    """Octahedron-subdivision sphere with exact per-vertex normals."""
    verts = [np.array(v, np.float64) for v in
             [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1),
              (0, 0, -1)]]
    faces = [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
             (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]
    for _ in range(subdiv):
        new_faces = []
        cache = {}

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in cache:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                cache[k] = len(verts)
                verts.append(m)
            return cache[k]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [(a, ab, ca), (ab, b, bc), (ca, bc, c),
                          (ab, bc, ca)]
        faces = new_faces
    pos = np.asarray(verts, np.float32) * radius
    nrm = np.asarray(verts, np.float32)
    idx = np.asarray(faces, np.int32)
    mesh = ObjMesh(positions=pos, normals=nrm, indices=idx,
                   mat_indices=np.zeros(len(faces), np.int32),
                   materials=[ObjMaterial(diffuse=(0.9, 0.9, 0.9))])
    return mesh_buffers_from_obj(mesh)


def test_smooth_sphere_shading_continuity():
    """Per-vertex normals + Gouraud interpolation: shading across the sphere
    must be smooth (no per-face intensity steps). The flat tier shows facet
    jumps an order of magnitude larger."""
    import dataclasses
    cfg = RenderConfig(width=96, height=96, sh_degree=0)
    cam = look_at([0, 0, -7], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height,
                  fov_y_rad=0.8)
    mesh = _octa_sphere(subdiv=1)

    def interior_steps(c):
        img, trans, _, _ = render_mesh(mesh, cam, c, 1 << 15)
        g = np.asarray(img).mean(axis=2)
        cov = np.asarray(trans) < 0.5
        # interior horizontal steps (erode the silhouette by 2px)
        interior = cov & np.roll(cov, 2, 1) & np.roll(cov, -2, 1) \
            & np.roll(cov, 2, 0) & np.roll(cov, -2, 0)
        steps = np.abs(np.diff(g, axis=1))
        m = interior[:, 1:] & interior[:, :-1]
        return steps[m]

    smooth = interior_steps(cfg)
    flat = interior_steps(cfg.replace(
        raster=dataclasses.replace(cfg.raster, mesh_shading="flat")))
    # Gouraud is C0-continuous: the p99 step is small shading gradient, not
    # a facet jump; flat shading's p99 is a facet discontinuity
    assert float(np.percentile(smooth, 99)) \
        < 0.5 * float(np.percentile(flat, 99)), (
            np.percentile(smooth, 99), np.percentile(flat, 99))
    assert float(np.median(smooth)) < 0.02
