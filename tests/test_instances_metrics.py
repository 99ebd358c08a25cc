"""Multi-instance scene flattening + image metrics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.ops.metrics import flip, flip_mean, mse, psnr
from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.instances import (
    SplatScene,
    decompose_rigid_uniform,
    quat_multiply,
)
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats


def rot_z(angle, scale=1.0, t=(0, 0, 0)):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(4)
    m[:3, :3] = scale * np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    m[:3, 3] = t
    return m


def test_decompose_rigid_uniform():
    m = rot_z(0.7, scale=2.5, t=(1, 2, 3))
    s, q, t = decompose_rigid_uniform(m)
    assert abs(s - 2.5) < 1e-6
    np.testing.assert_allclose(t, [1, 2, 3], atol=1e-6)
    with pytest.raises(ValueError):
        bad = np.eye(4)
        bad[0, 0] = 2.0
        decompose_rigid_uniform(bad)


def test_quat_multiply_identity():
    q = jnp.asarray([[0.2, 0.4, -0.1, 0.88]])
    e = jnp.asarray([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(np.asarray(quat_multiply(e, q)), np.asarray(q),
                               atol=1e-6)


def test_identity_instance_matches_single():
    splats = random_splats(jax.random.key(0), 200, sh_degree=1)
    scene = SplatScene()
    a = scene.add_asset(splats)
    scene.add_instance(a)
    prepared, table = scene.flatten()
    single = splats.prepare()
    np.testing.assert_allclose(np.asarray(prepared.means),
                               np.asarray(single.means), atol=1e-6)
    np.testing.assert_allclose(np.asarray(prepared.cov3d),
                               np.asarray(single.cov3d), atol=1e-5)
    assert int(table.instance_base[-1]) == 200


def test_transformed_instance_renders_like_transformed_asset():
    """Baking the instance transform must equal transforming the raw splats."""
    cfg = RenderConfig(width=96, height=64, sh_degree=0)
    splats = random_splats(jax.random.key(1), 200, sh_degree=0,
                           scale_range=(-2.5, -1.0))
    m = rot_z(0.6, scale=1.5, t=(0.3, -0.2, 0.5))

    scene = SplatScene()
    a = scene.add_asset(splats)
    scene.add_instance(a, transform=m)
    prepared, _ = scene.flatten()

    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    img_inst = render_3dgs(prepared, cam, cfg, max_pairs=65536).image

    # manual transform of the raw parameters
    r = m[:3, :3] / 1.5
    means2 = (np.asarray(splats.means) @ r.T) * 1.5 + m[:3, 3]
    # rotate covariance via rotating the quaternion with the same rotation
    from vk_gaussian_splatting_tpu.scene.instances import rotmat_to_quat
    qt = jnp.asarray(rotmat_to_quat(r), jnp.float32)
    qn = splats.quats / jnp.linalg.norm(splats.quats, axis=-1, keepdims=True)
    quats2 = quat_multiply(qt[None], qn)
    manual = dataclasses.replace(
        splats, means=jnp.asarray(means2, jnp.float32), quats=quats2,
        scales=splats.scales + np.log(1.5))
    img_manual = render_3dgs(manual.prepare(), cam, cfg, max_pairs=65536).image
    np.testing.assert_allclose(np.asarray(img_inst), np.asarray(img_manual),
                               atol=1e-4)
    assert float(np.asarray(img_inst).sum()) > 0


def test_two_instances_unified_sort():
    """Two interleaved instances must composite in correct global depth order:
    compare against a single asset containing both point sets."""
    cfg = RenderConfig(width=64, height=64, sh_degree=0)
    s1 = random_splats(jax.random.key(2), 100, sh_degree=0, scale_range=(-2.0, -1.0))
    s2 = random_splats(jax.random.key(3), 100, sh_degree=0, scale_range=(-2.0, -1.0))

    scene = SplatScene()
    scene.add_instance(scene.add_asset(s1))
    scene.add_instance(scene.add_asset(s2))
    prepared, table = scene.flatten()
    cam = look_at([0, 0, -9], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    img_multi = render_3dgs(prepared, cam, cfg, max_pairs=65536).image

    merged = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), s1, s2)
    img_merged = render_3dgs(merged.prepare(), cam, cfg, max_pairs=65536).image
    np.testing.assert_allclose(np.asarray(img_multi), np.asarray(img_merged),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(table.instance_id[:100]), 0)
    np.testing.assert_array_equal(np.asarray(table.instance_id[100:]), 1)


def test_metrics_basics():
    key = jax.random.key(0)
    a = jax.random.uniform(key, (32, 48, 3))
    assert float(mse(a, a)) == 0.0
    assert float(psnr(a, a)) >= 120.0 - 1e-3
    b = jnp.clip(a + 0.1, 0, 1)
    p = float(psnr(a, b))
    assert 15 < p < 25
    # FLIP: identical -> 0; gray vs inverted -> large
    f0 = float(flip_mean(a, a))
    assert f0 < 1e-4
    f1 = float(flip_mean(a, 1.0 - a))
    # the shader's Hunt-adapted YCxCz scale (F_L(1.0) ~ 0.175) puts the
    # inverted-noise error around 0.08 — "barely perceptible"+ territory
    assert f1 > 0.05
    # monotone in perturbation size
    f_small = float(flip_mean(a, jnp.clip(a + 0.02, 0, 1)))
    f_big = float(flip_mean(a, jnp.clip(a + 0.3, 0, 1)))
    assert f_small < f_big
    # error map shape + range
    m = np.asarray(flip(a, b))
    assert m.shape == (32, 48)
    assert (m >= 0).all() and (m <= 1).all()
    # approx mode runs
    m2 = np.asarray(flip(a, b, approx=True))
    assert np.isfinite(m2).all()


def test_nonuniform_instance_transform_refactorizes_covariance():
    """bake_general_transform must produce (scale, quat) whose covariance
    equals the direct A Sigma A^T matrix transform."""
    from vk_gaussian_splatting_tpu.scene.instances import (
        bake_general_transform,
    )
    from vk_gaussian_splatting_tpu.scene.splat_set import quat_to_rotmat

    rng = np.random.default_rng(0)
    n = 64
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = rng.uniform(-2.5, -0.5, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    t4 = np.eye(4, dtype=np.float32)
    t4[:3, :3] = np.array([[1.5, 0.3, 0.0],
                           [0.0, 0.7, 0.1],
                           [0.0, 0.0, 2.0]], np.float32)  # shear + aniso
    t4[:3, 3] = [1.0, -2.0, 0.5]

    m2, s2, q2 = bake_general_transform(t4, means, scales, quats)

    r_in = np.asarray(quat_to_rotmat(jnp.asarray(quats)))
    s_in = np.exp(scales)
    a = t4[:3, :3].astype(np.float64)
    m_dir = (a[None] @ r_in) * s_in[:, None, :]
    cov_direct = m_dir @ np.swapaxes(m_dir, 1, 2)

    r_out = np.asarray(quat_to_rotmat(jnp.asarray(q2)))
    m_out = r_out * np.exp(s2)[:, None, :]
    cov_baked = m_out @ np.swapaxes(m_out, 1, 2)

    np.testing.assert_allclose(cov_baked, cov_direct, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        m2, means @ t4[:3, :3].T + t4[:3, 3], rtol=1e-5, atol=1e-5)


def test_nonuniform_instance_scene_renders():
    from vk_gaussian_splatting_tpu.scene.instances import (
        SplatInstance,
        SplatScene,
    )

    cfg = RenderConfig(width=64, height=48, sh_degree=0)
    base = random_splats(jax.random.key(7), 200, sh_degree=0)
    scene = SplatScene()
    scene.assets.append(base)
    t4 = np.diag([2.0, 0.5, 1.0, 1.0]).astype(np.float32)
    scene.instances.append(SplatInstance(asset=0, transform=t4))
    prepared, table = scene.flatten()
    cam = look_at([0, 0, -8], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    out = render_3dgs(prepared, cam, cfg, max_pairs=1 << 16)
    img = np.asarray(out.image)
    assert np.isfinite(img).all() and img.max() > 0


def test_flip_reference_mode_matches_shader_oracle():
    """flip(mode=reference) must match a direct per-pixel transliteration of
    image_compare_metric.comp.slang's Reference path (5-channel Gaussian
    features + CSF-weighted YCxCz color diff, q=3 Minkowski pooling)."""
    import math

    rng = np.random.default_rng(3)
    h = w = 24
    a = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.12, a.shape), 0, 1).astype(np.float32)

    def srgb2lin(c):
        return np.where(c <= 0.04045, c / 12.92,
                        ((c + 0.055) / 1.055) ** 2.4)

    M = np.array([[0.31670331, 0.70299344, -0.01969366],
                  [0.10938715, 0.87060437, 0.01990658],
                  [0.01840087, 0.10476914, 0.87470614]], np.float64)

    def to_ycxcz(img):
        lms = srgb2lin(img.astype(np.float64)) @ M.T
        kc = 5.0 ** (1 / 3)
        fl = 0.2 * kc * (1 - math.exp(-0.42 * kc))
        hunt = lms * fl
        return np.stack([hunt[..., 1], hunt[..., 0] - hunt[..., 1],
                         hunt[..., 1] - hunt[..., 2]], -1)

    def csf(f):
        return math.exp(-0.5 * f) / math.sqrt(1 + (f / 4.0) ** 2)

    lumw = np.array([0.2126, 0.7152, 0.0722])
    ppd = 67.0

    def features(img):
        lum = img.astype(np.float64) @ lumw
        out = np.zeros((h, w, 5))
        for i, f in enumerate((0.5, 1.0, 2.0, 4.0, 8.0)):
            sigma = max(ppd / (f * 6.28), 0.5)
            radius = int(np.ceil(3 * sigma))
            for y in range(h):
                for x in range(w):
                    if (y < radius or x < radius or y >= h - radius
                            or x >= w - radius):
                        continue  # shader border early-out -> feature 0
                    acc = wsum = 0.0
                    for dy in range(-radius, radius + 1):
                        wy = math.exp(-dy * dy / (2 * sigma * sigma))
                        for dx in range(-radius, radius + 1):
                            wgt = wy * math.exp(-dx * dx
                                                / (2 * sigma * sigma))
                            acc += lum[y + dy, x + dx] * wgt
                            wsum += wgt
                    out[y, x, i] = abs(lum[y, x] - acc / wsum) * csf(f)
        return out

    ya, yb = to_ycxcz(a), to_ycxcz(b)
    d = np.abs(ya - yb)
    color = d[..., 0] * csf(1.0) + (d[..., 1] + d[..., 2]) * csf(1.0) * 0.4
    feat = np.abs(features(a) - features(b)).sum(-1)
    total = np.clip(color + feat, 0, 1)
    oracle = (np.mean(total ** 3)) ** (1 / 3)

    ours = float(flip_mean(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - oracle) < 1e-3, (ours, oracle)
    # per-pixel map too
    ours_map = np.asarray(flip(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours_map, total, atol=2e-3)
