from vk_gaussian_splatting_tpu.io.ply import load_ply, save_ply
from vk_gaussian_splatting_tpu.io.splat_file import load_splat_file, save_splat_file
from vk_gaussian_splatting_tpu.io.spz import load_spz, save_spz
from vk_gaussian_splatting_tpu.io.cameras_json import import_cameras_inria
from vk_gaussian_splatting_tpu.io.obj import load_obj

import os


def load_scene(path: str, **kw):
    """Extension-dispatched splat loading (PlyLoaderAsync::innerLoad,
    ply_loader_async.cpp:291-305 + parameters.cpp suffix dispatch)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        return load_ply(path, **kw)
    if ext == ".spz":
        return load_spz(path, **kw)
    if ext == ".splat":
        return load_splat_file(path, **kw)
    raise ValueError(f"unsupported splat file extension: {ext}")


__all__ = [
    "load_ply", "save_ply", "load_splat_file", "save_splat_file",
    "load_spz", "save_spz", "import_cameras_inria", "load_obj", "load_scene",
]
