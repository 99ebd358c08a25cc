"""Training recipe: loss functions + optimization convergence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.ops.metrics import psnr
from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats
from vk_gaussian_splatting_tpu.train import (
    TrainConfig,
    densify_split,
    make_optimizer,
    prune_splats,
    rgb_loss,
    ssim,
    train_step,
)


def test_ssim_properties():
    a = jax.random.uniform(jax.random.key(0), (32, 32, 3))
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    noisy = jnp.clip(a + 0.3 * jax.random.normal(jax.random.key(1), a.shape), 0, 1)
    assert float(ssim(a, noisy)) < 0.9
    assert float(rgb_loss(a, a)) < 1e-5


def test_overfit_single_view():
    """A jittered splat set must recover a rendered target by optimization."""
    cfg = RenderConfig(width=64, height=48, sh_degree=0)
    cam = look_at([0, 0, -9], [0, 0, 0], [0, 1, 0], 64, 48)
    gt = random_splats(jax.random.key(0), 120, sh_degree=0,
                       scale_range=(-2.2, -1.2))
    target = render_3dgs(gt.prepare(), cam, cfg, 32768).image

    # perturb and optimize back
    k = jax.random.key(1)
    init = dataclasses.replace(
        gt,
        means=gt.means + 0.1 * jax.random.normal(k, gt.means.shape),
        sh_dc=gt.sh_dc + 0.3 * jax.random.normal(k, gt.sh_dc.shape),
    )
    tc = TrainConfig(scene_extent=3.0, lr_means=2e-3)
    opt = make_optimizer(tc)
    state = opt.init(init)

    img0 = render_3dgs(init.prepare(), cam, cfg, 32768).image
    p0 = float(psnr(target, img0))
    splats, losses = init, []
    for _ in range(60):
        splats, state, loss, overflow = train_step(
            splats, state, cam, target, cfg, 32768, tc, opt)
        losses.append(float(loss))
    assert not bool(overflow)
    img1 = render_3dgs(splats.prepare(), cam, cfg, 32768).image
    p1 = float(psnr(target, img1))
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])
    assert p1 > p0 + 3.0, (p0, p1)


def test_prune_and_densify():
    s = random_splats(jax.random.key(2), 100, sh_degree=0)
    s = dataclasses.replace(
        s, opacities=s.opacities.at[:50].set(-10.0))  # transparent half
    pruned = prune_splats(s)
    assert pruned.num_splats == 50

    g = jnp.zeros((50, 3)).at[:10].set(1.0)
    grown = densify_split(pruned, g, grad_threshold=0.5)
    # clones add 1 each, splits replace 1 by 2: either way +10
    assert grown.num_splats == 60


def test_densify_split_opacity_renorm():
    """Split children carry renormalized opacity: n children composing at the
    center must reproduce the parent's alpha, and parents are removed."""
    import dataclasses as dc

    from vk_gaussian_splatting_tpu.train import reset_opacities

    s = random_splats(jax.random.key(3), 8, sh_degree=0)
    s = dc.replace(s, scales=jnp.full_like(s.scales, jnp.log(0.5)),
                   opacities=jnp.full_like(s.opacities, 2.0))  # big + opaque
    g = jnp.ones((8, 3))
    out = densify_split(s, g, grad_threshold=0.5, scale_threshold=0.01)
    assert out.num_splats == 16  # all split: 8 parents -> 16 children
    o_parent = float(jax.nn.sigmoid(2.0))
    o_child = np.asarray(jax.nn.sigmoid(out.opacities))
    np.testing.assert_allclose(1.0 - (1.0 - o_child) ** 2, o_parent,
                               atol=1e-5)
    # children scales shrink by 1.6
    np.testing.assert_allclose(np.exp(np.asarray(out.scales)), 0.5 / 1.6,
                               rtol=1e-5)

    # opacity reset clamps activated opacity to the ceiling
    r = reset_opacities(out, ceiling=0.01)
    assert float(jax.nn.sigmoid(r.opacities).max()) <= 0.01 + 1e-6


def test_checkpoint_roundtrip(tmp_path):
    from vk_gaussian_splatting_tpu.train import (
        TrainConfig,
        load_checkpoint,
        make_optimizer,
        save_checkpoint,
    )

    splats = random_splats(jax.random.key(0), 50, sh_degree=1)
    opt = make_optimizer(TrainConfig())
    state = opt.init(splats)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, splats, state, step=42)
    s2, st2, step = load_checkpoint(path, splats, state)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(s2.means),
                                  np.asarray(splats.means))
    chex = jax.tree.structure(st2) == jax.tree.structure(state)
    assert chex
