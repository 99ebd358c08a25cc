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
