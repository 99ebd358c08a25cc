"""Differentiable splat optimization.

The reference is a pure viewer; this framework's pipelines are differentiable
end-to-end (BASELINE.json: "rendered images AND pixel gradients ... match"),
so training comes with it. This module packages the standard 3DGS recipe:

- loss = (1-λ) L1 + λ D-SSIM (INRIA defaults, λ=0.2)
- optax Adam with per-parameter-group learning rates (positions scaled by
  scene extent, as in the original 3DGS)
- a jitted train step over any pipeline, single-chip or via
  parallel.train_step_sharded for meshes

Densification/pruning heuristics are exposed as pure functions over the
parameter pytree (they change shapes, so they run between jit boundaries).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.render.pipelines import render
from vk_gaussian_splatting_tpu.scene.cameras import Camera
from vk_gaussian_splatting_tpu.scene.splat_set import SplatSet, prepare_splats


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def ssim(a: jax.Array, b: jax.Array, window: int = 11,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jax.Array:
    """Mean SSIM with a box window (channels-last images)."""

    def blur(x):
        k = jnp.ones((window,), jnp.float32) / window
        pad = window // 2
        xp = jnp.pad(x, ((pad, pad), (0, 0), (0, 0)), mode="edge")
        out = jnp.zeros_like(x)
        for i in range(window):
            out = out + k[i] * jax.lax.dynamic_slice_in_dim(
                xp, i, x.shape[0], 0)
        xp = jnp.pad(out, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        out2 = jnp.zeros_like(x)
        for i in range(window):
            out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(
                xp, i, x.shape[1], 1)
        return out2

    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a * mu_a
    var_b = blur(b * b) - mu_b * mu_b
    cov = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2))
    return jnp.mean(s)


def rgb_loss(pred: jax.Array, target: jax.Array,
             ssim_lambda: float = 0.2) -> jax.Array:
    """(1-λ) L1 + λ (1 - SSIM) — the 3DGS training loss."""
    return ((1.0 - ssim_lambda) * l1_loss(pred, target)
            + ssim_lambda * (1.0 - ssim(pred, target)))


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr_means: float = 1.6e-4      # x scene extent
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacities: float = 5e-2
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 2.5e-3 / 20
    ssim_lambda: float = 0.2
    scene_extent: float = 1.0


def make_optimizer(tc: TrainConfig):
    if optax is None:
        raise ImportError("optax is required for training")
    lrs = SplatSet(
        means=tc.lr_means * tc.scene_extent, scales=tc.lr_scales,
        quats=tc.lr_quats, opacities=tc.lr_opacities,
        sh_dc=tc.lr_sh_dc, sh_rest=tc.lr_sh_rest,
    )

    def label_fn(params):
        return SplatSet(means="means", scales="scales", quats="quats",
                        opacities="opacities", sh_dc="sh_dc",
                        sh_rest="sh_rest")

    return optax.multi_transform(
        {f: optax.adam(getattr(lrs, f), eps=1e-15)
         for f in ("means", "scales", "quats", "opacities", "sh_dc",
                   "sh_rest")},
        label_fn,
    )


@partial(jax.jit, static_argnames=("cfg", "max_pairs", "tc", "optimizer"))
def train_step(splats: SplatSet, opt_state, cam: Camera, target: jax.Array,
               cfg: RenderConfig, max_pairs: int, tc: TrainConfig,
               optimizer=None):
    """One optimization step; returns (splats', opt_state', loss)."""
    if optimizer is None:
        raise ValueError("pass optimizer=make_optimizer(tc)")

    def loss_fn(s):
        prepared = prepare_splats(s, cfg.sh_format)
        out = render(prepared, cam, cfg, max_pairs)
        return rgb_loss(out.image, target, tc.ssim_lambda)

    loss, grads = jax.value_and_grad(loss_fn)(splats)
    updates, opt_state = optimizer.update(grads, opt_state, splats)
    splats = optax.apply_updates(splats, updates)
    return splats, opt_state, loss


def prune_splats(splats: SplatSet, min_opacity: float = 0.005) -> SplatSet:
    """Drop splats whose activated opacity fell below threshold (host-side;
    changes N — call between jit boundaries)."""
    import numpy as np

    keep = np.asarray(jax.nn.sigmoid(splats.opacities)) > min_opacity
    idx = np.nonzero(keep)[0]
    take = lambda a: jnp.asarray(np.asarray(a)[idx])
    return jax.tree.map(take, splats)


def densify_split(splats: SplatSet, grad_means: jax.Array,
                  grad_threshold: float = 2e-4,
                  scale_threshold: float = 0.01) -> SplatSet:
    """Clone-or-split densification (3DGS heuristic, host-side)."""
    import numpy as np

    g = np.linalg.norm(np.asarray(grad_means), axis=1)
    big = np.exp(np.asarray(splats.scales)).max(axis=1) > scale_threshold
    select = (g > grad_threshold)
    if not select.any():
        return splats
    idx = np.nonzero(select)[0]
    rng = np.random.RandomState(0)
    means = np.asarray(splats.means)
    scales = np.asarray(splats.scales)
    jitter = rng.normal(size=(len(idx), 3)).astype("float32") * \
        np.exp(scales[idx])
    new = {
        "means": means[idx] + np.where(big[idx, None], jitter, 0.0),
        "scales": np.where(big[idx, None], scales[idx] - np.log(1.6),
                           scales[idx]),
        "quats": np.asarray(splats.quats)[idx],
        "opacities": np.asarray(splats.opacities)[idx],
        "sh_dc": np.asarray(splats.sh_dc)[idx],
        "sh_rest": np.asarray(splats.sh_rest)[idx],
    }
    cat = lambda f: jnp.concatenate([jnp.asarray(getattr(splats, f)),
                                     jnp.asarray(new[f])])
    return SplatSet(**{f: cat(f) for f in new})


# ---------------------------------------------------------------------------
# Checkpoint / resume (SURVEY.md §5: the training-side analog of the .vkgs
# scene project — splat parameters + optimizer state + step, orbax-backed)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, splats: SplatSet, opt_state, step: int) -> None:
    """Write an atomic training checkpoint (directory) via orbax."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = {"splats": splats, "opt_state": opt_state,
            "step": jnp.asarray(step, jnp.int32)}
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, splats_like: SplatSet, opt_state_like):
    """Restore (splats, opt_state, step) saved by save_checkpoint; the
    *_like templates supply shapes/dtypes/pytree structure."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = {"splats": splats_like, "opt_state": opt_state_like,
            "step": jnp.asarray(0, jnp.int32)}
    restored = ckptr.restore(os.path.abspath(path), tree)
    return restored["splats"], restored["opt_state"], int(restored["step"])
