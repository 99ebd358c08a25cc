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
