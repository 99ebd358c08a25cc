"""Multi-instance splat-set scene model.

The reference manages per-set VRAM buffers, per-instance transforms, and a
**global index table** resolving global splat id -> (set, local id) so one
unified sort covers every instance (SplatSetManagerVk,
splat_set_manager_vk.cpp:2304-2360 rebuildGlobalIndexTables, :2426-2517
unified sorting buffers). The shaders then fetch through bindless descriptors
and apply instance transforms per splat.

The TPU-native equivalent *bakes instance transforms into the flattened
parameter arrays* at scene-preparation time (the analog of
processVramUpdates): a rigid + uniform-scale instance transform composes
exactly into per-splat (mean, quat, log-scale), so the whole scene becomes one
concatenated PreparedSplats that every pipeline (and the unified sort) already
handles. The global index table survives as (instance_id, local_id) arrays
for picking/selection parity.

Limitations mirrored honestly: non-uniform instance scale is rejected (it
breaks the scale/quat factorization the gut3d response needs; the reference
supports it by keeping matrices in-shader — a per-splat 3x3 would be needed
here).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.config import ShFormat
from vk_gaussian_splatting_tpu.scene.splat_set import (
    PreparedSplats,
    SplatSet,
    prepare_splats,
)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, (...,4) (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def rotmat_to_quat(r: np.ndarray) -> np.ndarray:
    """(3,3) rotation -> (w,x,y,z) unit quaternion (numpy, host-side)."""
    t = np.trace(r)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                         (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
    i = int(np.argmax(np.diag(r)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + r[i, i] - r[j, j] - r[k, k], 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (r[k, j] - r[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (r[j, i] + r[i, j]) / s
    q[1 + k] = (r[k, i] + r[i, k]) / s
    return q


def decompose_rigid_uniform(transform: np.ndarray, atol: float = 1e-4):
    """4x4 -> (scale, quat(w,x,y,z), translation). Raises on non-uniform
    scale or shear (see module docstring)."""
    m = np.asarray(transform, np.float64)
    a = m[:3, :3]
    t = m[:3, 3]
    norms = np.linalg.norm(a, axis=0)
    if np.ptp(norms) > atol * max(norms.max(), 1.0):
        raise ValueError(
            f"instance transform has non-uniform scale {norms}; only rigid + "
            "uniform-scale instance transforms are supported")
    s = float(norms.mean())
    r = a / s
    if not np.allclose(r @ r.T, np.eye(3), atol=1e-3):
        raise ValueError("instance transform has shear; unsupported")
    if np.linalg.det(r) < 0:
        raise ValueError("instance transform has a reflection; unsupported")
    return s, rotmat_to_quat(r), t


@dataclasses.dataclass
class SplatInstance:
    """One placed instance of a splat-set asset (SplatSetInstanceVk,
    splat_set_manager_vk.h): transform + per-instance material overrides."""

    asset: int
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    splat_scale: float = 1.0
    opacity_gain: float = 1.0
    visible: bool = True
    name: str = ""


@dataclasses.dataclass
class GlobalIndexTable:
    """Global splat id -> (instance, local id) (manager :2304-2360)."""

    instance_id: jax.Array   # (N_total,) i32
    local_id: jax.Array      # (N_total,) i32
    instance_base: np.ndarray  # (n_instances+1,) host offsets


class SplatScene:
    """Asset + instance CRUD (the manager's create/delete protocol,
    splat_set_manager_vk.h Request flags) — host-side; ``flatten`` produces
    the device scene."""

    def __init__(self):
        self.assets: list[SplatSet] = []
        self.asset_names: list[str] = []
        self.instances: list[SplatInstance] = []

    def add_asset(self, splats: SplatSet, name: str = "") -> int:
        self.assets.append(splats)
        self.asset_names.append(name or f"asset {len(self.assets) - 1}")
        return len(self.assets) - 1

    def add_instance(self, asset: int, transform=None, **kw) -> int:
        if transform is None:
            transform = np.eye(4, dtype=np.float32)
        self.instances.append(
            SplatInstance(asset=asset, transform=np.asarray(transform), **kw))
        return len(self.instances) - 1

    def remove_instance(self, idx: int) -> None:
        del self.instances[idx]

    @property
    def total_splats(self) -> int:
        return sum(self.assets[i.asset].num_splats
                   for i in self.instances if i.visible)

    def flatten(self, sh_format: ShFormat = ShFormat.FLOAT32
                ) -> tuple[PreparedSplats, GlobalIndexTable]:
        """Bake instances into one concatenated PreparedSplats + index table.

        Instance transforms compose into per-splat parameters:
          mean' = s R mean + t,  quat' = q_T (x) quat,  log-scale' += log(s).
        SH coefficients are view-dependent in *model* space in the reference
        (it evaluates with the inverse-transformed camera,
        threedgs_raster.mesh.slang:240); baking the rotation into the
        quaternion keeps geometry exact, and SH is rotated per instance by the
        same world rotation via the per-splat view direction — rotating SH
        bands exactly is future work; degree-0 (the dominant term) is
        rotation-invariant.
        """
        live = [inst for inst in self.instances if inst.visible]
        if not live:
            raise ValueError("scene has no visible instances")
        parts = []
        inst_ids = []
        local_ids = []
        bases = [0]
        max_m = max(np.asarray(self.assets[i.asset].sh_rest).shape[1]
                    for i in live)
        for idx, inst in enumerate(live):
            asset = self.assets[inst.asset]
            s, q_t, t = decompose_rigid_uniform(inst.transform)
            n = asset.num_splats
            means = jnp.asarray(asset.means)
            quats = jnp.asarray(asset.quats)
            from vk_gaussian_splatting_tpu.scene.splat_set import quat_to_rotmat
            r = jnp.asarray(quat_to_rotmat(jnp.asarray(q_t)[None])[0], jnp.float32)
            means2 = jnp.matmul(
                means, r.T, precision=jax.lax.Precision.HIGHEST) * s \
                + jnp.asarray(t, jnp.float32)
            quats_n = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)
            quats2 = quat_multiply(jnp.asarray(q_t, jnp.float32)[None], quats_n)
            scales2 = jnp.asarray(asset.scales) + np.log(s) \
                + np.log(max(inst.splat_scale, 1e-12))
            sh = jnp.asarray(asset.sh_rest)
            m = sh.shape[1]
            if m < max_m:
                sh = jnp.concatenate(
                    [sh, jnp.zeros((n, max_m - m, 3), jnp.float32)], axis=1)
            opac = jnp.asarray(asset.opacities)
            if inst.opacity_gain != 1.0:
                # opacity gain applies in activated space: sigmoid(o') = g*sigmoid(o)
                a = jax.nn.sigmoid(opac) * inst.opacity_gain
                a = jnp.clip(a, 1e-6, 1 - 1e-6)
                opac = jnp.log(a / (1 - a))
            parts.append(SplatSet(
                means=means2, scales=scales2, quats=quats2, opacities=opac,
                sh_dc=jnp.asarray(asset.sh_dc), sh_rest=sh))
            inst_ids.append(jnp.full((n,), idx, jnp.int32))
            local_ids.append(jnp.arange(n, dtype=jnp.int32))
            bases.append(bases[-1] + n)

        merged = SplatSet(
            **{f: jnp.concatenate([getattr(p, f) for p in parts])
               for f in ("means", "scales", "quats", "opacities",
                         "sh_dc", "sh_rest")})
        table = GlobalIndexTable(
            instance_id=jnp.concatenate(inst_ids),
            local_id=jnp.concatenate(local_ids),
            instance_base=np.asarray(bases, np.int64),
        )
        return prepare_splats(merged, sh_format), table
