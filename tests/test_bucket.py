"""Bucket-grid binning + bucket-neighborhood kernel vs the pair path.

Both architectures compute the identical front-to-back blend over the same
depth order, so images must agree to float tolerance on scenes without depth
ties."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vk_gaussian_splatting_tpu.config import RenderConfig
from vk_gaussian_splatting_tpu.ops.bucket_grid import (
    BucketGridSpec,
    assign_buckets,
    bucket_splats,
    span_lengths,
    window_span_table,
)
from vk_gaussian_splatting_tpu.render.pipelines import (
    render_3dgs,
    render_3dgrt,
    render_3dgut,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats


def _scene(n=600, w=128, h=96, seed=0, scale_range=(-3.0, -1.2)):
    cfg = RenderConfig(width=w, height=h, sh_degree=1)
    splats = random_splats(jax.random.key(seed), n, sh_degree=1,
                           extent=2.5, scale_range=scale_range)
    prepared = splats.prepare()
    cam = look_at([0, 0, -6], [0, 0, 0], [0, 1, 0], w, h, fov_y_rad=0.9)
    return prepared, cam, cfg


def _bucket_cfg(cfg, caps=(512, 512, 128, 128)):
    return cfg.replace(raster=dataclasses.replace(
        cfg.raster, method="bucket", bucket_caps=caps))


def test_window_covers_every_touching_splat():
    """Coverage invariant: every tile covered by a splat's extent rect finds
    at least one of that splat's slot buckets inside its window spans."""
    prepared, cam, cfg = _scene(n=400, seed=3, scale_range=(-2.5, -0.5))
    from vk_gaussian_splatting_tpu.ops.bucket_grid import NUM_SPANS
    from vk_gaussian_splatting_tpu.ops.projection import project_splats
    proj = jax.jit(lambda p, c: project_splats(p, c, cfg))(prepared, cam)
    spec = BucketGridSpec.build(cfg.width // 16, cfg.height // 16)
    slots = np.asarray(assign_buckets(proj, spec))   # (4, N)
    spans = np.asarray(window_span_table(spec))      # (T, 6, 2)
    xy = np.asarray(proj.xy)
    rad = np.asarray(proj.radius)
    valid = np.asarray(proj.valid)
    tiles_x = cfg.width // 16
    sentinel = spec.num_buckets - 1
    for i in range(xy.shape[0]):
        if not valid[i] or rad[i].max() <= 0 or slots[0, i] >= sentinel:
            continue
        x0 = max(int((xy[i, 0] - rad[i, 0]) // 16), 0)
        x1 = min(int((xy[i, 0] + rad[i, 0]) // 16), tiles_x - 1)
        y0 = max(int((xy[i, 1] - rad[i, 1]) // 16), 0)
        y1 = min(int((xy[i, 1] + rad[i, 1]) // 16), cfg.height // 16 - 1)
        for ty in range(y0, y1 + 1):
            for tx in range(x0, x1 + 1):
                t = ty * tiles_x + tx
                hit = any(spans[t, s, 0] <= slots[k, i] < spans[t, s, 1]
                          for s in range(NUM_SPANS) for k in range(4))
                assert hit, (i, t, slots[:, i])


def test_bucket_matches_pairs_3dgs():
    prepared, cam, cfg = _scene()
    ref = render_3dgs(prepared, cam, cfg, max_pairs=1 << 17)
    out = render_3dgs(prepared, cam, _bucket_cfg(cfg))
    assert not bool(out.overflow)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.transmittance),
                               np.asarray(ref.transmittance), atol=2e-5)
    # depth/id picks agree where both picked
    both = (np.asarray(out.splat_id) >= 0) & (np.asarray(ref.splat_id) >= 0)
    assert (np.asarray(out.splat_id)[both]
            == np.asarray(ref.splat_id)[both]).mean() > 0.99


def test_bucket_matches_pairs_big_splats():
    """Mid/coarse/global classes: large splats must land in higher pyramid
    levels and still blend identically."""
    prepared, cam, cfg = _scene(n=150, scale_range=(-1.5, 0.2), seed=7)
    ref = render_3dgs(prepared, cam, cfg, max_pairs=1 << 18)
    out = render_3dgs(prepared, cam,
                      _bucket_cfg(cfg, caps=(256, 256, 256, 256)))
    assert not bool(out.overflow)
    # 2e-4: near-equal depths may blend in either order across the two
    # architectures (merge network vs pair schedule) at float-associativity
    # scale, and each path freezes saturated pixels (T <= 1e-4) at ITS OWN
    # blend-chunk boundary (bucket 768 lanes vs pair 128), so residual
    # contributions bounded by min_transmittance can differ
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=2e-4)


def test_bucket_matches_pairs_packed():
    prepared, cam, cfg = _scene(seed=1)
    pf = dataclasses.replace(cfg.raster, pair_format="packed")
    cfg_p = cfg.replace(raster=pf)
    ref = render_3dgs(prepared, cam, cfg_p, max_pairs=1 << 17)
    out = render_3dgs(prepared, cam, _bucket_cfg(cfg_p))
    # packed sorts on bf16-truncated depth: near-equal depths may swap,
    # so compare loosely (the pair path sorted on exact f32 depth)
    assert np.abs(np.asarray(out.image) - np.asarray(ref.image)).max() < 3e-2


def test_bucket_matches_pairs_3dgut():
    # gut3d evaluates the exact 3D ray response: the pair path clips each
    # splat to its extent RECT (tile coverage), the bucket path evaluates
    # anywhere in the window — tails just outside the rect contribute only in
    # the bucket image (measured max 0.005, <0.3% of pixels). Everything
    # inside the rect must agree to float tolerance, so bound both the max
    # difference and the affected-pixel fraction.
    prepared, cam, cfg = _scene(n=300, seed=5)
    ref = render_3dgut(prepared, cam, cfg, max_pairs=1 << 17)
    out = render_3dgut(prepared, cam, _bucket_cfg(cfg))
    d = np.abs(np.asarray(out.image) - np.asarray(ref.image))
    assert d.max() < 2e-2
    assert (d > 1e-3).mean() < 0.01


def test_bucket_matches_pairs_3dgrt():
    prepared, cam, cfg = _scene(n=300, seed=6)
    ref = render_3dgrt(prepared, cam, cfg, max_pairs=1 << 17)
    out = render_3dgrt(prepared, cam, _bucket_cfg(cfg))
    d = np.abs(np.asarray(out.image) - np.asarray(ref.image))
    assert d.max() < 2e-2
    assert (d > 1e-3).mean() < 0.01


def test_bucket_overflow_flags_truncation():
    # fine-dominated scene (max fine span ~213): the 128 fine cap truncates
    # and must raise the flag; the 512 cap absorbs the same scene
    prepared, cam, cfg = _scene(n=4000, seed=2, scale_range=(-5.5, -4.0))
    out = render_3dgs(prepared, cam, _bucket_cfg(cfg, caps=(128, 128, 128, 128)))
    big = render_3dgs(prepared, cam, _bucket_cfg(cfg, caps=(512, 128, 128, 128)))
    assert bool(out.overflow)
    assert not bool(big.overflow)


def test_bucket_merge_path_matches_pairs():
    """Caps in the balanced OEM merge-tree shape (fine = 4*mid, mid ==
    coarse) replace the in-kernel bitonic sort with the ~38-stage odd-even
    merge over the presorted bucket runs; the blend must still match the
    pair path. Mixed scales exercise fine + mid + coarse runs together."""
    prepared, cam, cfg = _scene(n=300, seed=2, scale_range=(-5.0, 0.5))
    ref = render_3dgs(prepared, cam, cfg, max_pairs=1 << 17)
    out = render_3dgs(prepared, cam,
                      _bucket_cfg(cfg, caps=(1024, 256, 256, 256)))
    assert not bool(out.overflow)
    d = np.abs(np.asarray(out.image) - np.asarray(ref.image))
    assert d.max() < 2e-2
    assert (d > 1e-3).mean() < 0.01


def test_bucket_merge_path_gradients():
    """The merge path's backward (record exchanges, reverse replay) must
    reproduce the pair path's parameter gradients."""
    prepared, cam, cfg = _scene(n=200, w=64, h=48, seed=13,
                                scale_range=(-4.5, -0.5))

    def loss(pp, c):
        out = render_3dgs(pp, cam, c, max_pairs=1 << 16)
        return jnp.sum(out.image ** 2) + jnp.sum(out.transmittance ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(prepared)
    g_bkt = jax.grad(lambda p: loss(
        p, _bucket_cfg(cfg, caps=(512, 128, 128, 128))))(prepared)
    for name in ("means", "cov3d", "color"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_bkt, name))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-5,
                                   err_msg=name)


def test_bucket_empty_scene():
    prepared, cam, cfg = _scene(n=64)
    # camera looking away: everything culled
    cam_away = look_at([0, 0, -6], [0, 0, -12], [0, 1, 0], cfg.width,
                       cfg.height, fov_y_rad=0.9)
    out = render_3dgs(prepared, cam_away, _bucket_cfg(cfg))
    np.testing.assert_allclose(np.asarray(out.transmittance), 1.0, atol=1e-6)
    assert int(out.num_pairs) == 0


def test_bucket_gradients_match_pairs():
    """The bucket backward (re-sort + forward-order sweep + un-sort) must
    produce the same parameter gradients as the pair path's custom VJP."""
    prepared, cam, cfg = _scene(n=250, w=64, h=48, seed=11)

    def loss(pp, c):
        out = render_3dgs(pp, cam, c, max_pairs=1 << 16)
        return jnp.sum(out.image ** 2) + jnp.sum(out.transmittance ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(prepared)
    g_bkt = jax.grad(lambda p: loss(p, _bucket_cfg(cfg)))(prepared)
    for name in ("means", "cov3d", "color"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_bkt, name))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-5,
                                   err_msg=name)


def test_bucket_gradients_match_pairs_gut():
    prepared, cam, cfg = _scene(n=150, w=64, h=48, seed=12)
    from vk_gaussian_splatting_tpu.render.pipelines import render_3dgut

    def loss(pp, c):
        return jnp.sum(render_3dgut(pp, cam, c, max_pairs=1 << 16).image ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(prepared)
    g_bkt = jax.grad(lambda p: loss(p, _bucket_cfg(cfg)))(prepared)
    for name in ("means", "quats", "scales_log", "color"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_bkt, name))
        scale = np.abs(a).max() + 1e-12
        # rect-clip difference (see the forward gut test) also perturbs a few
        # splats' gradients; compare the bulk
        rel = np.abs(b - a) / scale
        assert np.median(rel) < 1e-5, name
        assert (rel > 1e-3).mean() < 0.02, name


def test_span_lengths_match_counts():
    prepared, cam, cfg = _scene(n=500, seed=9)
    from vk_gaussian_splatting_tpu.ops.projection import project_splats
    from vk_gaussian_splatting_tpu.render.pipelines import gs_attr_rows
    proj = jax.jit(lambda p, c: project_splats(p, c, cfg))(prepared, cam)
    rows = gs_attr_rows(proj)
    bins = bucket_splats(proj, rows, tiles_x=cfg.width // 16,
                         tiles_y=cfg.height // 16)
    spec = BucketGridSpec.build(cfg.width // 16, cfg.height // 16)
    lens = np.asarray(span_lengths(bins.bucket_starts, spec))
    assert lens.min() >= 0
    n_valid = int(bins.num_valid)
    counts = np.asarray(bins.bucket_starts)
    assert counts[-1] >= n_valid


def test_required_caps_fit_no_overflow():
    """The bench's cap auto-derivation (VERDICT r03 next #1): the histogram
    measurement matches the sorted-binning requirement exactly, fit_caps
    gives pow2 caps with >=25% headroom, and rendering at those caps never
    overflows."""
    from vk_gaussian_splatting_tpu.ops.bucket_grid import (
        fit_caps,
        measure_required_caps,
        required_window_caps,
    )
    from vk_gaussian_splatting_tpu.ops.projection import project_splats
    from vk_gaussian_splatting_tpu.render.pipelines import gs_attr_rows

    prepared, cam, cfg = _scene(n=4000, seed=2, scale_range=(-5.5, -4.0))
    proj = jax.jit(lambda p, c: project_splats(p, c, cfg))(prepared, cam)
    spec = BucketGridSpec.build(cfg.width // 16, cfg.height // 16)
    req = np.asarray(jax.jit(
        lambda pr: measure_required_caps(pr, spec))(proj))

    rows = jax.jit(gs_attr_rows)(proj)
    bins = bucket_splats(proj, rows, tiles_x=spec.tiles_x,
                         tiles_y=spec.tiles_y, caps=(128, 128, 128, 128))
    req_sorted = np.asarray(required_window_caps(bins.bucket_starts, spec))
    np.testing.assert_array_equal(req, req_sorted)

    caps = fit_caps(req)
    assert all(c >= 128 and c % 128 == 0
               and bin(c // 128).count("1") <= 2 for c in caps)
    assert all(c >= r * 1.25 for c, r in zip(caps, req))
    out = render_3dgs(prepared, cam, _bucket_cfg(cfg, caps=caps))
    assert not bool(out.overflow)


def test_bucket_nonpow2_caps_merge_path():
    """Non-pow2 x128 caps (384 = 256+128 etc.) run the odd-even merge tree
    over the pow2 RUN DECOMPOSITION of each span (raster_bucket._decompose)
    and must match the pair path exactly; mixed scales exercise fine + mid
    + coarse + global runs together."""
    from vk_gaussian_splatting_tpu.ops.raster_bucket import (
        _merge_caps_ok,
        _span_runs,
    )

    caps = (384, 256, 384, 128)
    assert _merge_caps_ok(caps)
    assert _span_runs(caps) == [
        (0, 0, 256), (0, 256, 128), (1, 0, 256), (2, 0, 256),
        (3, 0, 256), (3, 256, 128), (4, 0, 256), (4, 256, 128),
        (5, 0, 128)]
    prepared, cam, cfg = _scene(n=300, seed=2, scale_range=(-5.0, 0.5))
    ref = render_3dgs(prepared, cam, cfg, max_pairs=1 << 17)
    out = render_3dgs(prepared, cam, _bucket_cfg(cfg, caps=caps))
    assert not bool(out.overflow)
    d = np.abs(np.asarray(out.image) - np.asarray(ref.image))
    assert d.max() < 2e-2
    assert (d > 1e-3).mean() < 0.01


def test_bucket_nonpow2_caps_gradients():
    """Kernel backward (record/replay un-sort) across the run-decomposed
    merge tree and the per-run RMW accumulation."""
    prepared, cam, cfg = _scene(n=150, w=64, h=48, seed=12)
    caps = (384, 128, 128, 128)

    def loss(pp, c):
        return jnp.sum(render_3dgs(pp, cam, c, max_pairs=1 << 16).image ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(prepared)
    g_bkt = jax.grad(lambda p: loss(p, _bucket_cfg(cfg, caps=caps)))(prepared)
    for name in ("means", "cov3d", "color"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_bkt, name))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-5,
                                   err_msg=name)
