"""Visual helpers (H16: grid_helper_vk + transform_helper_vk overlays)."""

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.render.helpers import (
    render_gizmo_overlay,
    render_grid_overlay,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at


def _blank(cfg):
    return (jnp.zeros((cfg.height, cfg.width, 3)),
            jnp.zeros((cfg.height, cfg.width)))


def test_grid_draws_below_horizon_only():
    cfg = RenderConfig(width=128, height=96)
    img, depth = _blank(cfg)
    down = look_at([0, 3, 0.01], [0, -1, 0], [0, 0, 1], cfg.width,
                   cfg.height)
    out = np.asarray(render_grid_overlay(img, depth, down, cfg,
                                         plane_y=-1.0))
    assert np.isfinite(out).all()
    assert out.sum() > 50.0          # looking down: grid everywhere
    up = look_at([0, 3, 0.01], [0, 7, 0], [0, 0, 1], cfg.width, cfg.height)
    out_up = np.asarray(render_grid_overlay(img, depth, up, cfg,
                                            plane_y=-1.0))
    assert out_up.sum() == 0.0       # looking up: plane is behind every ray


def test_grid_occluded_by_scene_depth():
    cfg = RenderConfig(width=128, height=96)
    img, _ = _blank(cfg)
    cam = look_at([0, 3, -8], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    free = np.asarray(render_grid_overlay(
        img, jnp.zeros((cfg.height, cfg.width)), cam, cfg, plane_y=-1.0))
    blocked = np.asarray(render_grid_overlay(
        img, jnp.full((cfg.height, cfg.width), 0.5), cam, cfg, plane_y=-1.0))
    # everything is behind depth 0.5 -> checkerboard-dimmed grid
    assert blocked.sum() < 0.5 * free.sum()


def test_gizmo_axis_colors_present():
    cfg = RenderConfig(width=128, height=96)
    img, depth = _blank(cfg)
    cam = look_at([2, 2, -6], [0, 0, 0], [0, 1, 0], cfg.width, cfg.height)
    for mode in ("translate", "scale", "rotate"):
        out = np.asarray(render_gizmo_overlay(img, depth, cam, cfg,
                                              origin=(0, 0, 0), size=1.0,
                                              mode=mode))
        assert np.isfinite(out).all()
        # red, green, and blue channels each dominate somewhere
        for ch in range(3):
            others = [c for c in range(3) if c != ch]
            dom = (out[..., ch] > 0.4) & \
                (out[..., ch] > out[..., others[0]] + 0.1) & \
                (out[..., ch] > out[..., others[1]] + 0.1)
            assert dom.any(), (mode, ch)
