"""INRIA ``cameras.json`` import (camera_set.h:216-270 importCamerasINRIA).

The json entries carry camera-to-world rotation (columns = camera axes),
position (camera center), fx/fy and image size, in the RDF world of the
training data. Splats convert RDF->RUB on load, so cameras get the same
world flip F = diag(1,-1,-1); the OpenCV camera axes convention is kept.
"""

from __future__ import annotations

import json

import numpy as np

from vk_gaussian_splatting_tpu.scene.cameras import Camera, make_camera


def import_cameras_inria(path: str, to_rub: bool = True) -> list[tuple[str, Camera]]:
    with open(path) as f:
        data = json.load(f)

    flip = np.diag([1.0, -1.0, -1.0]) if to_rub else np.eye(3)
    out = []
    for item in data:
        r_c2w = np.asarray(item["rotation"], np.float64)     # columns = cam axes
        pos = np.asarray(item["position"], np.float64)
        r_c2w = flip @ r_c2w
        pos = flip @ pos
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[:3, :3] = r_c2w.T
        viewmat[:3, 3] = -r_c2w.T @ pos
        cam = make_camera(
            viewmat,
            fx=item["fx"], fy=item["fy"],
            cx=item["width"] * 0.5, cy=item["height"] * 0.5,
        )
        out.append((item.get("img_name", str(item.get("id", len(out)))), cam))
    return out
