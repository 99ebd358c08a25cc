"""IO roundtrips: PLY / .splat / .spz / cameras.json / OBJ."""

import json

import numpy as np
import jax

from vk_gaussian_splatting_tpu.io import (
    import_cameras_inria,
    load_obj,
    load_ply,
    load_scene,
    load_splat_file,
    load_spz,
    save_ply,
    save_splat_file,
    save_spz,
)
from vk_gaussian_splatting_tpu.scene.splat_set import (
    CoordinateSystem,
    SplatSet,
    coordinate_flips,
    random_splats,
)


def np_splats(n=64, sh_degree=2, seed=0):
    s = random_splats(jax.random.key(seed), n, sh_degree=sh_degree)
    return SplatSet(**{f: np.asarray(getattr(s, f)) for f in (
        "means", "scales", "quats", "opacities", "sh_dc", "sh_rest")})


def assert_splats_close(a, b, atol=1e-5):
    for f in ("means", "scales", "quats", "opacities", "sh_dc", "sh_rest"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            atol=atol, err_msg=f)


def test_ply_roundtrip(tmp_path):
    s = np_splats(sh_degree=3)
    p = str(tmp_path / "test.ply")
    save_ply(p, s)
    s2 = load_ply(p)
    assert_splats_close(s, s2)
    assert s2.max_sh_degree == 3
    # dispatch helper
    s3 = load_scene(p)
    assert_splats_close(s2, s3)


def test_ply_reordered_properties(tmp_path):
    """A valid PLY may interleave property groups; the native fast path
    memcpys contiguous runs, so reordered groups must fall back to the
    structured-dtype reader instead of parsing garbage."""
    s = np_splats(sh_degree=0)
    ref_path = str(tmp_path / "normal.ply")
    save_ply(ref_path, s)
    ref = load_ply(ref_path)

    # scale group split by the opacity property
    names = (["x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2",
              "scale_0", "opacity", "scale_1", "scale_2",
              "rot_0", "rot_1", "rot_2", "rot_3"])
    n = 64
    rec = np.zeros(n, dtype=np.dtype([(nm, "<f4") for nm in names]))
    # save_ply converts RUB->RDF on write; mirror that so loads agree
    from vk_gaussian_splatting_tpu.scene.splat_set import CoordinateSystem
    s_rdf = s.convert_coordinates(CoordinateSystem.RUB, CoordinateSystem.RDF)
    for i, a in enumerate("xyz"):
        rec[a] = np.asarray(s_rdf.means)[:, i]
    for i in range(3):
        rec[f"f_dc_{i}"] = np.asarray(s_rdf.sh_dc)[:, i]
        rec[f"scale_{i}"] = np.asarray(s_rdf.scales)[:, i]
    for i in range(4):
        rec[f"rot_{i}"] = np.asarray(s_rdf.quats)[:, i]
    rec["opacity"] = np.asarray(s_rdf.opacities)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header", ""]
    p = str(tmp_path / "reordered.ply")
    with open(p, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        rec.tofile(f)

    got = load_ply(p)
    assert_splats_close(ref, got)


def test_ply_no_sh(tmp_path):
    s = np_splats(sh_degree=0)
    p = str(tmp_path / "nosh.ply")
    save_ply(p, s)
    s2 = load_ply(p)
    assert s2.sh_rest.shape == (64, 0, 3)
    assert s2.max_sh_degree == 0


def test_ply_coordinate_convention(tmp_path):
    """load applies RDF->RUB: y,z of positions negate vs raw file contents."""
    s = np_splats(sh_degree=1)
    p = str(tmp_path / "conv.ply")
    save_ply(p, s)
    raw = load_ply(p, to_rub=False)
    conv = load_ply(p, to_rub=True)
    flip_p, _, _ = coordinate_flips(CoordinateSystem.RDF, CoordinateSystem.RUB)
    np.testing.assert_allclose(np.asarray(conv.means),
                               np.asarray(raw.means) * flip_p, atol=1e-6)


def test_splat_file_roundtrip(tmp_path):
    s = np_splats(sh_degree=0)
    # quantization to u8 loses precision; normalize quats for comparison
    p = str(tmp_path / "test.splat")
    save_splat_file(p, s)
    s2 = load_splat_file(p)
    np.testing.assert_allclose(s2.means, np.asarray(s.means), atol=1e-5)
    np.testing.assert_allclose(s2.scales, np.asarray(s.scales), atol=1e-5)
    qa = np.asarray(s.quats)
    qa = qa / np.linalg.norm(qa, axis=1, keepdims=True)
    qb = np.asarray(s2.quats)
    qb = qb / np.maximum(np.linalg.norm(qb, axis=1, keepdims=True), 1e-9)
    # sign ambiguity: align
    sign = np.sign(np.sum(qa * qb, axis=1, keepdims=True))
    np.testing.assert_allclose(qb * sign, qa, atol=2e-2)
    a = 1 / (1 + np.exp(-np.asarray(s.opacities)))
    a2 = 1 / (1 + np.exp(-np.asarray(s2.opacities)))
    np.testing.assert_allclose(a2, a, atol=1e-2)


def test_spz_roundtrip(tmp_path):
    s = np_splats(n=128, sh_degree=2)
    # keep values in quantizable ranges
    s = SplatSet(
        means=np.asarray(s.means),
        scales=np.clip(np.asarray(s.scales), -9.9, 5.9),
        quats=np.asarray(s.quats),
        opacities=np.asarray(s.opacities),
        sh_dc=np.clip(np.asarray(s.sh_dc), -1.5, 1.5),
        sh_rest=np.clip(np.asarray(s.sh_rest), -0.9, 0.9),
    )
    p = str(tmp_path / "test.spz")
    save_spz(p, s)
    s2 = load_spz(p)
    np.testing.assert_allclose(s2.means, s.means, atol=1e-3)
    np.testing.assert_allclose(s2.scales, s.scales, atol=0.04)
    np.testing.assert_allclose(s2.sh_dc, s.sh_dc, atol=0.02)
    np.testing.assert_allclose(s2.sh_rest, s.sh_rest, atol=0.01)
    a = 1 / (1 + np.exp(-s.opacities))
    a2 = 1 / (1 + np.exp(-np.asarray(s2.opacities)))
    np.testing.assert_allclose(a2, a, atol=5e-3)
    qa = s.quats / np.linalg.norm(s.quats, axis=1, keepdims=True)
    qb = np.asarray(s2.quats)
    sign = np.sign(np.sum(qa * qb, axis=1, keepdims=True))
    np.testing.assert_allclose(qb * sign, qa, atol=5e-3)


def test_cameras_inria(tmp_path):
    cams = [{
        "id": 0, "img_name": "000", "width": 640, "height": 480,
        "position": [1.0, 2.0, 3.0],
        "rotation": np.eye(3).tolist(),
        "fx": 500.0, "fy": 510.0,
    }]
    p = tmp_path / "cameras.json"
    p.write_text(json.dumps(cams))
    out = import_cameras_inria(str(p))
    assert len(out) == 1
    name, cam = out[0]
    assert name == "000"
    # flip applied: position (1, -2, -3)
    np.testing.assert_allclose(np.asarray(cam.position), [1, -2, -3], atol=1e-5)
    assert float(cam.fx) == 500.0


def test_obj(tmp_path):
    obj = tmp_path / "tri.obj"
    mtl = tmp_path / "tri.mtl"
    mtl.write_text("newmtl red\nKd 1 0 0\nNs 10\nillum 2\n")
    obj.write_text(
        "mtllib tri.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "usemtl red\nf 1 2 3\nf 2 4 3\n")
    m = load_obj(str(obj))
    assert m.indices.shape == (2, 3)
    assert m.positions.shape[0] == 4
    assert m.materials[m.mat_indices[0]].diffuse == (1.0, 0.0, 0.0)
    # generated normals point +z or -z
    np.testing.assert_allclose(np.abs(m.normals[:, 2]), 1.0, atol=1e-5)
