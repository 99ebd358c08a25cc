"""antimatter15 .splat format (32 bytes/record, no header).

Vectorized numpy re-implementation of loadSplatFile
(ply_loader_async.cpp:41-180): position f32x3, linear scale f32x3 (-> log),
rgba u8x4 (rgb -> f_dc via inverse SH0 fold, a -> logit opacity), quaternion
u8x4 stored (x,y,z,w) as (q*128+128).

Note: the reference stores the decoded quaternion as (x,y,z,w) into its
(w,x,y,z) slots despite its own comment (ply_loader_async.cpp:136-142) — a
bug we do not reproduce; we store (w,x,y,z) correctly.
"""

from __future__ import annotations

import numpy as np

from vk_gaussian_splatting_tpu.scene.splat_set import (
    SH_C0,
    CoordinateSystem,
    SplatSet,
)

_DTYPE = np.dtype([
    ("position", "<f4", 3),
    ("scale", "<f4", 3),
    ("color", "u1", 4),
    ("rotation", "u1", 4),
])


def load_splat_file(path: str, to_rub: bool = True) -> SplatSet:
    rec = np.fromfile(path, dtype=_DTYPE)
    if rec.size == 0:
        raise ValueError(f"empty or invalid .splat file: {path}")
    q = (rec["rotation"].astype(np.float32) - 128.0) / 128.0      # (n,4) x,y,z,w
    quats = np.concatenate([q[:, 3:4], q[:, 0:3]], axis=1)        # w,x,y,z
    alpha = np.clip(rec["color"][:, 3].astype(np.float32) / 255.0, 1e-6, 1 - 1e-6)
    splats = SplatSet(
        means=rec["position"].astype(np.float32),
        scales=np.log(np.maximum(rec["scale"].astype(np.float32), 1e-30)),
        quats=quats,
        opacities=np.log(alpha / (1.0 - alpha)),
        sh_dc=(rec["color"][:, 0:3].astype(np.float32) / 255.0 - 0.5) / SH_C0,
        sh_rest=np.zeros((rec.size, 0, 3), np.float32),
    )
    if to_rub:
        splats = splats.convert_coordinates(CoordinateSystem.RDF, CoordinateSystem.RUB)
    return splats


def save_splat_file(path: str, splats: SplatSet, from_rub: bool = True) -> None:
    if from_rub:
        splats = splats.convert_coordinates(CoordinateSystem.RUB, CoordinateSystem.RDF)
    n = int(np.asarray(splats.means).shape[0])
    rec = np.zeros(n, dtype=_DTYPE)
    rec["position"] = np.asarray(splats.means, np.float32)
    rec["scale"] = np.exp(np.asarray(splats.scales, np.float32))
    q = np.asarray(splats.quats, np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    xyzw = np.concatenate([q[:, 1:4], q[:, 0:1]], axis=1)
    rec["rotation"] = np.clip(np.round(xyzw * 128.0 + 128.0), 0, 255).astype(np.uint8)
    rgb = 0.5 + SH_C0 * np.asarray(splats.sh_dc, np.float32)
    a = 1.0 / (1.0 + np.exp(-np.asarray(splats.opacities, np.float32)))
    rgba = np.concatenate([rgb, a[:, None]], axis=1)
    rec["color"] = np.clip(np.round(rgba * 255.0), 0, 255).astype(np.uint8)
    rec.tofile(path)
