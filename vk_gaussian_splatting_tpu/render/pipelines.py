"""Rendering pipelines as pure functions of (splats, camera, config).

The TPU-native counterpart of the reference's frame graph
(GaussianSplatting::onRender -> renderHybridPipeline / renderPureRaytracing,
gaussian_splatting.cpp:335-521): each reference pipeline becomes one jittable
function; pipeline/config switches select the traced program (the reference's
shader-macro recompile, SURVEY.md §3.1).

3DGS raster frame = project -> bin(sort) -> tile blend, matching the
dist+sort+raster stages of gaussian_splatting.cpp:1298-1464.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from vk_gaussian_splatting_tpu.config import Pipeline, RenderConfig, tiles_x, tiles_y
from vk_gaussian_splatting_tpu.ops.binning import TileBins, bin_splats
from vk_gaussian_splatting_tpu.ops.projection import (
    ProjectedSplats,
    project_splats,
    ut_project_splats,
)
from vk_gaussian_splatting_tpu.ops import response as R
from vk_gaussian_splatting_tpu.ops.rasterize_pallas import (
    ATTR_B,
    ATTR_CA,
    ATTR_DEPTH,
    ATTR_OPACITY,
    ATTR_R,
    ATTR_X,
    NUM_ATTRS,
    RasterStatics,
    assemble_image,
    rasterize_tiles,
)
from vk_gaussian_splatting_tpu.scene.cameras import Camera
from vk_gaussian_splatting_tpu.scene.splat_set import PreparedSplats


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderOutput:
    image: jax.Array          # (H, W, 3)
    transmittance: jax.Array  # (H, W)
    depth: jax.Array          # (H, W) picked depth at T < depth_iso (0 = none)
    splat_id: jax.Array       # (H, W) i32 picked splat id (-1 = none)
    num_pairs: jax.Array      # () i32 — pairs generated (pre-truncation)
    overflow: jax.Array       # () bool — pair budget exceeded


def build_pair_attrs(proj: ProjectedSplats, bins: TileBins) -> jax.Array:
    """Gather projected splat attributes into sorted pair order: (16, P) f32.

    One big XLA gather turns the tile kernel's reads into contiguous DMA —
    the TPU answer to the reference's per-thread random buffer fetches
    (threedgs_particle_buffers.h.slang).
    """
    ps = bins.pair_splat
    p = ps.shape[0]
    rows = [
        proj.xy[ps, 0],
        proj.xy[ps, 1],
        proj.conic[ps, 0],
        proj.conic[ps, 1],
        proj.conic[ps, 2],
        proj.alpha[ps],
        proj.color[ps, 0],
        proj.color[ps, 1],
        proj.color[ps, 2],
        proj.depth[ps],
        ps.astype(jnp.float32),  # global splat id for picking / materials
    ]
    attrs = jnp.stack(rows, axis=0)
    return jnp.concatenate(
        [attrs, jnp.zeros((NUM_ATTRS - len(rows), p), jnp.float32)], axis=0
    )


def raster_statics(cfg: RenderConfig, interpret: bool | None = None) -> RasterStatics:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from vk_gaussian_splatting_tpu.config import StochasticMode
    return RasterStatics(
        tiles_x=tiles_x(cfg),
        tiles_y=tiles_y(cfg),
        chunk=cfg.raster.chunk,
        alpha_min=cfg.raster.alpha_min,
        alpha_clamp=cfg.raster.alpha_clamp,
        qmax=cfg.raster.alpha_cull_qmax,
        depth_iso=cfg.raster.depth_iso_threshold,
        stochastic=cfg.stochastic == StochasticMode.SPLAT,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("cfg", "max_pairs", "interpret"))
def render_3dgs(
    prepared: PreparedSplats,
    cam: Camera,
    cfg: RenderConfig,
    max_pairs: int,
    interpret: bool | None = None,
    host_order: jax.Array | None = None,
) -> RenderOutput:
    """3DGS raster pipeline (PIPELINE_VERT / PIPELINE_MESH).

    host_order: optional (N,) i32 presorted splat permutation from the CPU
    sorting path (io.async_loader.AsyncHostSorter) — replaces the on-device
    depth sort keys with the host rank (SortMethod.HOST parity; the order may
    be one camera-move stale, exactly like the reference's lazy CPU sort)."""
    if cfg.raster.tile_size != 16:
        raise ValueError("pallas raster path requires tile_size == 16")
    proj = project_splats(prepared, cam, cfg)
    depth_override = None
    if host_order is not None:
        n = host_order.shape[0]
        rank = jnp.zeros((n,), jnp.float32).at[host_order].set(
            jnp.arange(n, dtype=jnp.float32))
        depth_override = rank
    bins = bin_splats(
        proj,
        tile_size=cfg.raster.tile_size,
        tiles_x=tiles_x(cfg),
        tiles_y=tiles_y(cfg),
        max_pairs=max_pairs,
        chunk=cfg.raster.chunk,
        front_to_back=True,
        depth_override=depth_override,
    )
    attrs = build_pair_attrs(proj, bins)
    st = raster_statics(cfg, interpret)
    samples = max(cfg.temporal_samples, 1) if st.stochastic else 1
    accum = None
    for sample in range(samples):
        seed = jnp.full((1,), sample * 7919 + 1, jnp.int32)
        out = rasterize_tiles(attrs, bins.chunk_tile, bins.chunk_rank,
                              bins.chunk_last, bins.seg_counts, None, seed, st)
        res = assemble_image(out, bins.seg_counts, st.tiles_x, st.tiles_y,
                             cfg.width, cfg.height, cfg.background,
                             with_aux=True)
        accum = res if accum is None else tuple(
            a + b for a, b in zip(accum, res[:2])) + res[2:]
    img, trans, depth, splat_id = accum
    return RenderOutput(
        image=img / samples if samples > 1 else img,
        transmittance=trans / samples if samples > 1 else trans,
        depth=depth,
        splat_id=splat_id,
        num_pairs=bins.num_pairs,
        overflow=bins.overflow,
    )


def build_gut_pair_attrs(prepared: PreparedSplats, proj: ProjectedSplats,
                         bins: TileBins, cfg: RenderConfig) -> jax.Array:
    """(16, P) pair attributes in the gut3d row layout (ops/response.py)."""
    ps = bins.pair_splat
    p = ps.shape[0]
    quats = prepared.quats / jnp.linalg.norm(
        prepared.quats, axis=-1, keepdims=True).clip(1e-12)
    scl = jnp.exp(prepared.scales_log) * cfg.splat_scale
    rows = [
        prepared.means[ps, 0], prepared.means[ps, 1], prepared.means[ps, 2],
        scl[ps, 0], scl[ps, 1], scl[ps, 2],
        proj.color[ps, 0], proj.color[ps, 1], proj.color[ps, 2],
        quats[ps, 0], quats[ps, 1], quats[ps, 2], quats[ps, 3],
        proj.alpha[ps],
        proj.depth[ps],
        ps.astype(jnp.float32),  # global splat id
    ]
    attrs = jnp.stack(rows, axis=0)
    return jnp.concatenate(
        [attrs, jnp.zeros((NUM_ATTRS - len(rows), p), jnp.float32)], axis=0
    )


def _blend_samples(attrs, bins, cam, cfg, st):
    """Run the blender over temporal samples (DoF / stochastic) and average
    image+transmittance (post.comp.slang temporal accumulation); aux picks
    come from the first sample."""
    from vk_gaussian_splatting_tpu.render.rays import build_tile_rays

    samples = max(cfg.temporal_samples, 1)
    img_acc = trans_acc = None
    depth = splat_id = None
    for sample in range(samples):
        pix_ctx = build_tile_rays(cam, cfg, sample_id=sample)
        seed = jnp.full((1,), sample * 7919 + 1, jnp.int32)
        out = rasterize_tiles(attrs, bins.chunk_tile, bins.chunk_rank,
                              bins.chunk_last, bins.seg_counts, pix_ctx,
                              seed, st)
        img, trans, d, sid = assemble_image(
            out, bins.seg_counts, st.tiles_x, st.tiles_y,
            cfg.width, cfg.height, cfg.background, with_aux=True)
        img_acc = img if img_acc is None else img_acc + img
        trans_acc = trans if trans_acc is None else trans_acc + trans
        if depth is None:
            depth, splat_id = d, sid
    return img_acc / samples, trans_acc / samples, depth, splat_id


@partial(jax.jit, static_argnames=("cfg", "max_pairs", "interpret"))
def render_3dgut(
    prepared: PreparedSplats,
    cam: Camera,
    cfg: RenderConfig,
    max_pairs: int,
    interpret: bool | None = None,
) -> RenderOutput:
    """3DGUT raster pipeline (PIPELINE_MESH_3DGUT): unscented-transform
    projection for binning + exact per-pixel 3D ray response in the blender,
    with thin-lens DoF and temporal-sample averaging (post.comp.slang)."""
    from vk_gaussian_splatting_tpu.render.rays import build_tile_rays

    if cfg.raster.tile_size != 16:
        raise ValueError("pallas raster path requires tile_size == 16")
    proj = ut_project_splats(prepared, cam, cfg)
    bins = bin_splats(
        proj,
        tile_size=cfg.raster.tile_size,
        tiles_x=tiles_x(cfg),
        tiles_y=tiles_y(cfg),
        max_pairs=max_pairs,
        chunk=cfg.raster.chunk,
        front_to_back=True,
    )
    attrs = build_gut_pair_attrs(prepared, proj, bins, cfg)
    st = dataclasses.replace(
        raster_statics(cfg, interpret),
        model="gut3d",
        kernel_degree=cfg.rt.kernel_degree,
        kernel_min_response=0.0113,
    )

    acc = _blend_samples(attrs, bins, cam, cfg, st)
    return RenderOutput(
        image=acc[0], transmittance=acc[1], depth=acc[2], splat_id=acc[3],
        num_pairs=bins.num_pairs, overflow=bins.overflow,
    )


@partial(jax.jit, static_argnames=("cfg", "max_pairs", "interpret"))
def render_3dgrt(
    prepared: PreparedSplats,
    cam: Camera,
    cfg: RenderConfig,
    max_pairs: int,
    interpret: bool | None = None,
) -> RenderOutput:
    """3DGRT ray tracing, primary rays (PIPELINE_RTX).

    The reference marches BVH hits through a K=18 sorted k-buffer per pass
    (threedgrt_raytrace.rgen.slang:615-818) purely to recover *per-ray
    front-to-back order* on hardware that cannot sort globally. On TPU we get
    that order directly: for rays sharing one origin, sorting candidates by
    euclidean distance to the origin orders them exactly as their per-ray hit
    parameters t (t = |p-o| cos(theta), theta constant along a ray), so the
    tile blender composes the same integral particleIntegrate accumulates
    (threedgrt.h.slang:226-235) — no BVH, no k-buffer, one sort. Also correct
    for fisheye (where raster view-z ordering is only approximate).

    Secondary bounces / shadows build on the same blender with per-bundle ray
    contexts (future work; hybrid pipelines dispatch here for now).
    """
    from vk_gaussian_splatting_tpu.render.rays import build_tile_rays

    if cfg.raster.tile_size != 16:
        raise ValueError("pallas raster path requires tile_size == 16")
    proj = ut_project_splats(prepared, cam, cfg)
    radial = jnp.linalg.norm(prepared.means - cam.position, axis=-1)
    proj = dataclasses.replace(proj, depth=radial)
    bins = bin_splats(
        proj,
        tile_size=cfg.raster.tile_size,
        tiles_x=tiles_x(cfg),
        tiles_y=tiles_y(cfg),
        max_pairs=max_pairs,
        chunk=cfg.raster.chunk,
        front_to_back=True,
    )
    attrs = build_gut_pair_attrs(prepared, proj, bins, cfg)
    st = dataclasses.replace(
        raster_statics(cfg, interpret),
        model="gut3d",
        kernel_degree=cfg.rt.kernel_degree,
        kernel_min_response=0.0113,
        alpha_clamp=cfg.rt.alpha_clamp,
        min_transmittance=cfg.rt.min_transmittance,
    )

    acc = _blend_samples(attrs, bins, cam, cfg, st)
    return RenderOutput(
        image=acc[0], transmittance=acc[1], depth=acc[2], splat_id=acc[3],
        num_pairs=bins.num_pairs, overflow=bins.overflow,
    )


def render(prepared: PreparedSplats, cam: Camera, cfg: RenderConfig,
           max_pairs: int, **kw) -> RenderOutput:
    """Pipeline dispatch (shaderio.h:61-66 pipeline ids)."""
    if cfg.pipeline in (Pipeline.VERT, Pipeline.MESH):
        return render_3dgs(prepared, cam, cfg, max_pairs, **kw)
    if cfg.pipeline == Pipeline.MESH_3DGUT:
        return render_3dgut(prepared, cam, cfg, max_pairs, **kw)
    if cfg.pipeline == Pipeline.RTX:
        return render_3dgrt(prepared, cam, cfg, max_pairs, **kw)
    if cfg.pipeline in (Pipeline.HYBRID, Pipeline.HYBRID_3DGUT):
        return render_hybrid(prepared, cam, cfg, max_pairs, **kw)[0]
    raise NotImplementedError(f"pipeline {cfg.pipeline} not yet implemented")


@partial(jax.jit, static_argnames=("cfg", "max_pairs", "material", "interpret"))
def render_3dgs_lit(
    prepared: PreparedSplats,
    cam: Camera,
    cfg: RenderConfig,
    max_pairs: int,
    lights: tuple = (),
    material=None,
    interpret: bool | None = None,
):
    """3DGS raster + surface reconstruction + deferred Phong shading
    (the raster-with-lighting frame of gaussian_splatting.cpp:888-908 + S11).

    Returns (RenderOutput, shaded_image, normal_image).
    """
    from vk_gaussian_splatting_tpu.render.deferred import (
        DeferredMaterial,
        deferred_shade,
        render_normal_buffer,
    )

    if material is None:
        material = DeferredMaterial()
    proj = project_splats(prepared, cam, cfg)
    bins = bin_splats(
        proj, tile_size=cfg.raster.tile_size, tiles_x=tiles_x(cfg),
        tiles_y=tiles_y(cfg), max_pairs=max_pairs, chunk=cfg.raster.chunk)
    attrs = build_pair_attrs(proj, bins)
    st = raster_statics(cfg, interpret)
    out = rasterize_tiles(attrs, bins.chunk_tile, bins.chunk_rank,
                          bins.chunk_last, bins.seg_counts, None, None, st)
    img, trans, depth, splat_id = assemble_image(
        out, bins.seg_counts, st.tiles_x, st.tiles_y,
        cfg.width, cfg.height, cfg.background, with_aux=True)
    normal_img = render_normal_buffer(prepared, proj, bins, cam, cfg, st)
    shaded = deferred_shade(img, trans, normal_img, depth, cam, cfg,
                            list(lights), material)
    render_out = RenderOutput(image=img, transmittance=trans, depth=depth,
                              splat_id=splat_id, num_pairs=bins.num_pairs,
                              overflow=bins.overflow)
    return render_out, shaded, normal_img


@partial(jax.jit, static_argnames=("cfg", "max_pairs", "interpret"))
def render_3dgs_composed(
    prepared: PreparedSplats,
    cam: Camera,
    cfg: RenderConfig,
    max_pairs: int,
    mesh,
    lights: tuple = (),
    interpret: bool | None = None,
) -> RenderOutput:
    """3DGS raster composited with an opaque triangle mesh (the FTB
    mesh-composited frame, gaussian_splatting.cpp:705-850): mesh depth
    prepass -> splat FTB pass clipped by mesh depth -> mesh color under the
    remaining transmittance."""
    from vk_gaussian_splatting_tpu.render.mesh_raster import (
        depth_limit_pix_ctx,
        render_mesh,
    )

    mesh_img, mesh_trans, mesh_depth, _ = render_mesh(
        mesh, cam, cfg, max_pairs, lights, interpret)

    proj = project_splats(prepared, cam, cfg)
    bins = bin_splats(
        proj, tile_size=cfg.raster.tile_size, tiles_x=tiles_x(cfg),
        tiles_y=tiles_y(cfg), max_pairs=max_pairs, chunk=cfg.raster.chunk)
    attrs = build_pair_attrs(proj, bins)
    st = dataclasses.replace(raster_statics(cfg, interpret), model="gs2d_clip")
    pix_ctx = depth_limit_pix_ctx(mesh_depth, cfg)
    out = rasterize_tiles(attrs, bins.chunk_tile, bins.chunk_rank,
                          bins.chunk_last, bins.seg_counts, pix_ctx, None, st)
    img, trans, depth, splat_id = assemble_image(
        out, bins.seg_counts, st.tiles_x, st.tiles_y, cfg.width, cfg.height,
        (0.0, 0.0, 0.0), with_aux=True)

    final = img + trans[..., None] * mesh_img
    covered_mesh = mesh_trans < 0.5
    combined_depth = jnp.where((depth == 0) & covered_mesh, mesh_depth, depth)
    return RenderOutput(
        image=final,
        transmittance=trans * mesh_trans,
        depth=combined_depth,
        splat_id=splat_id,
        num_pairs=bins.num_pairs,
        overflow=bins.overflow,
    )


@partial(jax.jit, static_argnames=("cfg", "max_pairs", "material",
                                  "shadow_res", "interpret"))
def render_hybrid(
    prepared: PreparedSplats,
    cam: Camera,
    cfg: RenderConfig,
    max_pairs: int,
    lights: tuple = (),
    material=None,
    shadow_res: int = 512,
    interpret: bool | None = None,
):
    """Hybrid pipeline (PIPELINE_HYBRID / PIPELINE_HYBRID_3DGUT): raster
    primary visibility + ray-effect secondary stage.

    The reference's hybrid mode ingests the raster color/transmittance/depth
    as bounce-0 state and continues with RTX shadows/reflections
    (rgen:343-460, 1261-1464). Here the secondary stage is the deferred
    lighting pass with per-light deep-shadow-map transmittance
    (render/shadows.py) — splat-on-splat shadows without per-pixel ray
    marching; mesh reflections/refractions are future work.

    Returns (RenderOutput, shaded image, normal image).
    """
    from vk_gaussian_splatting_tpu.render.deferred import (
        DeferredMaterial,
        deferred_shade,
        render_normal_buffer,
    )
    from vk_gaussian_splatting_tpu.render.shadows import make_shadow_fn

    if material is None:
        material = DeferredMaterial()
    use_gut = cfg.pipeline == Pipeline.HYBRID_3DGUT

    if use_gut:
        proj = ut_project_splats(prepared, cam, cfg)
    else:
        proj = project_splats(prepared, cam, cfg)
    bins = bin_splats(
        proj, tile_size=cfg.raster.tile_size, tiles_x=tiles_x(cfg),
        tiles_y=tiles_y(cfg), max_pairs=max_pairs, chunk=cfg.raster.chunk)
    st = raster_statics(cfg, interpret)
    if use_gut:
        from vk_gaussian_splatting_tpu.render.rays import build_tile_rays
        attrs = build_gut_pair_attrs(prepared, proj, bins, cfg)
        st = dataclasses.replace(st, model="gut3d",
                                 kernel_degree=cfg.rt.kernel_degree)
        pix_ctx = build_tile_rays(cam, cfg, sample_id=0)
    else:
        attrs = build_pair_attrs(proj, bins)
        pix_ctx = None
    out = rasterize_tiles(attrs, bins.chunk_tile, bins.chunk_rank,
                          bins.chunk_last, bins.seg_counts, pix_ctx, None, st)
    img, trans, depth, splat_id = assemble_image(
        out, bins.seg_counts, st.tiles_x, st.tiles_y, cfg.width, cfg.height,
        cfg.background, with_aux=True)

    normal_img = render_normal_buffer(prepared, proj, bins, cam, cfg, st,
                                      pix_ctx)
    shadow_fn = (make_shadow_fn(prepared, tuple(lights), cfg, shadow_res,
                                interpret)
                 if lights else None)
    shaded = deferred_shade(img, trans, normal_img, depth, cam, cfg,
                            list(lights), material, shadow_fn=shadow_fn)
    render_out = RenderOutput(image=img, transmittance=trans, depth=depth,
                              splat_id=splat_id, num_pairs=bins.num_pairs,
                              overflow=bins.overflow)
    return render_out, shaded, normal_img
