import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu import RenderConfig
from vk_gaussian_splatting_tpu.render import render_3dgs
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats


def test_end_to_end_small():
    cfg = RenderConfig(width=64, height=48, sh_degree=1)
    splats = random_splats(jax.random.key(0), 256, sh_degree=1)
    prepared = splats.prepare()
    cam = look_at([0, 0, -10], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    out = render_3dgs(prepared, cam, cfg, max_pairs=8192)
    img = np.asarray(out.image)
    assert img.shape == (48, 64, 3)
    assert np.isfinite(img).all()
    assert not bool(out.overflow)
    # something must have been drawn
    assert float(jnp.sum(out.image)) > 0.0
    assert float(out.transmittance.min()) < 1.0


def test_non_tile_multiple_resolution():
    """Width/height not multiples of 16: padded tiles blend, assembly crops."""
    import numpy as np

    from vk_gaussian_splatting_tpu.config import RenderConfig
    from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
    from vk_gaussian_splatting_tpu.scene.cameras import look_at
    from vk_gaussian_splatting_tpu.scene.splat_set import random_splats

    cfg = RenderConfig(width=101, height=67, sh_degree=0)
    splats = random_splats(jax.random.key(5), 200, sh_degree=0).prepare()
    cam = look_at([0, 0, -8], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    out = render_3dgs(splats, cam, cfg, max_pairs=1 << 15)
    img = np.asarray(out.image)
    assert img.shape == (67, 101, 3)
    assert np.isfinite(img).all() and img.max() > 0


def test_empty_visible_scene_is_background():
    """All splats behind the camera -> pure background, T = 1."""
    import dataclasses

    import numpy as np

    from vk_gaussian_splatting_tpu.config import RenderConfig
    from vk_gaussian_splatting_tpu.render.pipelines import render_3dgs
    from vk_gaussian_splatting_tpu.scene.cameras import look_at
    from vk_gaussian_splatting_tpu.scene.splat_set import random_splats

    cfg = RenderConfig(width=48, height=32, sh_degree=0,
                       background=(0.2, 0.3, 0.4))
    base = random_splats(jax.random.key(6), 100, sh_degree=0)
    splats = dataclasses.replace(
        base, means=base.means - jnp.array([0.0, 0.0, 50.0])).prepare()
    cam = look_at([0, 0, -8], [0, 0, -20], [0, 1, 0], cfg.width, cfg.height)
    out = render_3dgs(splats, cam, cfg, max_pairs=1 << 14)
    img = np.asarray(out.image)
    np.testing.assert_allclose(img, np.broadcast_to([0.2, 0.3, 0.4],
                                                    img.shape), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.transmittance), 1.0, atol=1e-6)
