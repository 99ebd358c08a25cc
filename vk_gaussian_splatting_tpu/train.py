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


def ssim(a: jax.Array, b: jax.Array, window: int = 11, sigma: float = 1.5,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jax.Array:
    """Mean SSIM with the standard 11x11 Gaussian window (sigma 1.5) —
    the window INRIA 3DGS trains against (channels-last images)."""
    r = jnp.arange(window, dtype=jnp.float32) - (window - 1) / 2.0
    k = jnp.exp(-0.5 * (r / sigma) ** 2)
    k = k / jnp.sum(k)

    def blur(x):
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
    """One optimization step; returns (splats', opt_state', loss, overflow).

    overflow is the binning truncation flag of the rendered frame — when it
    fires, part of the image trained against truncated splat coverage; the
    caller should re-render with expansion="exact" / a larger slots_k (the
    analog of the reference's RTX->raster fallback, gaussian_splatting.cpp:
    371-386) or treat the step as suspect."""
    if optimizer is None:
        raise ValueError("pass optimizer=make_optimizer(tc)")

    def loss_fn(s):
        prepared = prepare_splats(s, cfg.sh_format)
        out = render(prepared, cam, cfg, max_pairs)
        return rgb_loss(out.image, target, tc.ssim_lambda), out.overflow

    (loss, overflow), grads = jax.value_and_grad(loss_fn, has_aux=True)(splats)
    updates, opt_state = optimizer.update(grads, opt_state, splats)
    splats = optax.apply_updates(splats, updates)
    return splats, opt_state, loss, overflow


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
                  scale_threshold: float = 0.01,
                  n_split: int = 2,
                  seed: int = 0) -> SplatSet:
    """Clone-or-split densification (the 3DGS adaptive-density heuristic,
    host-side — changes N, so it runs between jit boundaries).

    - **clone** (under-reconstruction: high positional gradient, small
      splat): duplicate the splat as-is.
    - **split** (over-reconstruction: high gradient, large splat): REPLACE
      the splat by n_split children sampled from its own Gaussian, scales
      divided by 1.6, with opacity renormalized so the composite alpha of
      the stack matches the parent: o' = 1 - (1 - o)^(1/n) (n overlapping
      children compose (1-o')^n = 1-o at the center).
    """
    import numpy as np

    g = np.linalg.norm(np.asarray(grad_means), axis=1)
    lin_scales = np.exp(np.asarray(splats.scales))
    big = lin_scales.max(axis=1) > scale_threshold
    select = g > grad_threshold
    if not select.any():
        return splats
    clone_idx = np.nonzero(select & ~big)[0]
    split_idx = np.nonzero(select & big)[0]
    keep_idx = np.nonzero(~(select & big))[0]  # split parents are removed

    means = np.asarray(splats.means)
    scales = np.asarray(splats.scales)
    quats = np.asarray(splats.quats, np.float64)
    opac = np.asarray(splats.opacities)

    parts = {f: [np.asarray(getattr(splats, f))[keep_idx]]
             for f in ("means", "scales", "quats", "opacities", "sh_dc",
                       "sh_rest")}
    # clones: verbatim copies (both keep training independently)
    for f in parts:
        parts[f].append(np.asarray(getattr(splats, f))[clone_idx])

    if len(split_idx):
        rng = np.random.RandomState(seed)
        k = len(split_idx)
        q = quats[split_idx]
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        rot = np.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ], axis=1).reshape(k, 3, 3).astype(np.float32)
        sig = np.asarray(splats.opacities)[split_idx]
        o_act = 1.0 / (1.0 + np.exp(-sig))
        # composite-alpha renormalization, back through the sigmoid
        o_new = np.clip(1.0 - (1.0 - o_act) ** (1.0 / n_split), 1e-4,
                        1.0 - 1e-4)
        sig_new = np.log(o_new / (1.0 - o_new)).astype(np.float32)
        for _ in range(n_split):
            canon = rng.normal(size=(k, 3)).astype(np.float32) * \
                lin_scales[split_idx]
            parts["means"].append(
                means[split_idx] + np.einsum("nij,nj->ni", rot, canon))
            parts["scales"].append(
                scales[split_idx] - np.float32(np.log(1.6)))
            parts["quats"].append(np.asarray(splats.quats)[split_idx])
            parts["opacities"].append(sig_new)
            parts["sh_dc"].append(np.asarray(splats.sh_dc)[split_idx])
            parts["sh_rest"].append(np.asarray(splats.sh_rest)[split_idx])

    return SplatSet(**{f: jnp.asarray(np.concatenate(parts[f]))
                       for f in parts})


def reset_opacities(splats: SplatSet, ceiling: float = 0.01) -> SplatSet:
    """Clamp activated opacities to <= ceiling (the periodic opacity reset of
    3DGS training — every ~3000 iters — that lets pruning reclaim splats the
    optimizer saturated)."""
    sig_ceiling = jnp.log(ceiling / (1.0 - ceiling))
    return dataclasses.replace(
        splats, opacities=jnp.minimum(splats.opacities, sig_ceiling))


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
