"""Image comparison tool (H15, image_compare.{h,cpp} + S14 composite).

Capture a reference frame, composite split views in the reference's six
display modes (image_compare_composite.comp.slang), and track metric history
for convergence charts (the ImageCompare ring buffer)."""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.ops.metrics import flip, mse, psnr


class CompareMode(enum.IntEnum):
    """Split-view display modes (image_compare.h Parameters)."""

    CAPTURE = 0
    CURRENT = 1
    DIFF_RAW = 2
    DIFF_RED_ON_GRAY = 3
    DIFF_RED_ONLY = 4
    FLIP_HEATMAP = 5


def _viridis(t: jax.Array) -> jax.Array:
    """Small viridis-like colormap for the FLIP heatmap."""
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    c0 = jnp.asarray([0.267, 0.005, 0.329])
    c1 = jnp.asarray([0.128, 0.565, 0.551])
    c2 = jnp.asarray([0.993, 0.906, 0.144])
    lo = c0 + (c1 - c0) * (t * 2.0)
    hi = c1 + (c2 - c1) * (t * 2.0 - 1.0)
    return jnp.where(t < 0.5, lo, hi)


def composite(capture: jax.Array, current: jax.Array, mode: CompareMode,
              split_x: float = 0.5, amplify: float = 1.0) -> jax.Array:
    """Split-view composite: left of split_x shows the capture, right shows
    the selected comparison (S14 semantics)."""
    h, w = capture.shape[:2]
    if mode == CompareMode.CAPTURE:
        right = capture
    elif mode == CompareMode.CURRENT:
        right = current
    elif mode == CompareMode.DIFF_RAW:
        right = jnp.clip(jnp.abs(current - capture) * amplify, 0, 1)
    elif mode == CompareMode.DIFF_RED_ON_GRAY:
        gray = jnp.mean(capture, axis=-1, keepdims=True) * jnp.ones((1, 1, 3))
        err = jnp.clip(
            jnp.abs(current - capture).max(axis=-1, keepdims=True) * amplify,
            0, 1)
        red = jnp.concatenate(
            [jnp.ones_like(err), jnp.zeros_like(err), jnp.zeros_like(err)], -1)
        right = gray * (1 - err) + red * err
    elif mode == CompareMode.DIFF_RED_ONLY:
        err = jnp.clip(
            jnp.abs(current - capture).max(axis=-1, keepdims=True) * amplify,
            0, 1)
        right = jnp.concatenate(
            [err, jnp.zeros_like(err), jnp.zeros_like(err)], -1)
    elif mode == CompareMode.FLIP_HEATMAP:
        right = _viridis(flip(capture, current) * amplify)
    else:
        raise ValueError(mode)
    xs = jnp.arange(w)[None, :, None]
    return jnp.where(xs < int(split_x * w), capture, right)


@dataclasses.dataclass
class MetricsSample:
    frame: int
    mse: float
    psnr: float
    flip_mean: float


class ImageCompare:
    """Capture + metrics-history tool (ImageCompare, image_compare.h:83-125)."""

    def __init__(self, history: int = 256):
        self.captured: jax.Array | None = None
        self.history_len = history
        self.history: list[MetricsSample] = []
        self._frame = 0

    def capture(self, image: jax.Array) -> None:
        self.captured = jnp.asarray(image)
        self.history.clear()
        self._frame = 0

    def compute_metrics(self, current: jax.Array) -> MetricsSample:
        assert self.captured is not None, "capture a reference frame first"
        sample = MetricsSample(
            frame=self._frame,
            mse=float(mse(self.captured, current)),
            psnr=float(psnr(self.captured, current)),
            flip_mean=float(jnp.mean(flip(self.captured, current))),
        )
        self.history.append(sample)
        if len(self.history) > self.history_len:
            self.history.pop(0)
        self._frame += 1
        return sample

    def render(self, current: jax.Array, mode: CompareMode,
               split_x: float = 0.5, amplify: float = 1.0) -> jax.Array:
        assert self.captured is not None, "capture a reference frame first"
        return composite(self.captured, current, mode, split_x, amplify)
