"""Static render configuration.

The reference specializes device code by regenerating ~30 shader ``#define``s and
recompiling Slang on any parameter change (gaussian_splatting.cpp:1651-1715,
``updateSlangMacros``).  The TPU-native equivalent is a frozen, hashable
dataclass passed as a static argument to ``jax.jit`` — each distinct config
traces and compiles its own XLA program, cached by the config value exactly like
the reference's shader-macro recompile cache.

Parameter groups mirror the reference's global parameter structs
(parameters.h:82-240: prmFrame / prmRender / prmRaster / prmRtx / prmData).
"""

from __future__ import annotations

import dataclasses
import enum


class Pipeline(enum.IntEnum):
    """The six rendering pipelines (shaderio.h:61-66)."""

    VERT = 0          # raster 3DGS (vertex-shader path in reference; one raster path here)
    MESH = 1          # raster 3DGS (default)
    RTX = 2           # 3DGRT ray tracing
    HYBRID = 3        # 3DGS raster primary + 3DGRT secondary
    MESH_3DGUT = 4    # raster 3DGUT (unscented transform)
    HYBRID_3DGUT = 5  # 3DGUT raster primary + 3DGRT secondary


class ShFormat(enum.IntEnum):
    """SH coefficient storage format (shaderio.h data-format macros; splat_set_vk.cpp:396-447)."""

    FLOAT32 = 0
    FLOAT16 = 1
    UINT8 = 2


class CameraType(enum.IntEnum):
    PINHOLE = 0
    FISHEYE = 1


class ShutterType(enum.IntEnum):
    """Rolling-shutter scan direction (threedgut_camera_models.h.slang:52-57).

    Non-global shutters interpolate the camera pose between Camera.viewmat
    (shutter start) and Camera.viewmat_end (shutter end) per pixel row or
    column, with the reference's 5-iteration fixed-point projection."""

    ROLLING_TOP_TO_BOTTOM = 0
    ROLLING_LEFT_TO_RIGHT = 1
    ROLLING_BOTTOM_TO_TOP = 2
    ROLLING_RIGHT_TO_LEFT = 3
    GLOBAL = 4


class SortMethod(enum.IntEnum):
    """GPU vs CPU sorting (reference: vrdx radix sort vs SplatSorterAsync)."""

    DEVICE = 0  # on-device sort (lax.sort / Pallas radix) — reference "GPU sort"
    HOST = 1    # numpy argsort on host, indices shipped to device — reference "CPU sort"


# NOTE: the reference's BACK_TO_FRONT blend mode (gaussian_splatting.cpp:
# 705-850) is a GPU blending-equation equivalence — "over" accumulation in
# reverse order produces the identical image as the front-to-back "under"
# accumulation the sorted tile loop performs. It is intentionally NOT a
# config flag here: the deterministic FTB tile loop is the only order.


class StochasticMode(enum.IntEnum):
    """Stochastic transparency variants (shaderio.h:95-105; doc/stochastic_transparency.md)."""

    NONE = 0
    SPLAT = 1  # per-fragment stochastic accept in raster (threedgs_raster.frag.slang:265-290)
    PASS = 2   # Monte-Carlo pass termination in RT (rgen:765-800)
    ANYHIT = 3 # single-trace stochastic any-hit (rgen:821-961)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Tile rasterizer parameters (prmRaster, parameters.h:180-214)."""

    tile_size: int = 16
    chunk: int = 128             # pairs blended per tile-loop iteration (VMEM chunk)
    bucket_chunk: int = 384      # bucket-kernel blend chunk. The blend is
                                 # the frame's dominant term (139 of 209 ms
                                 # at 1080p/1M) and its cost scales with
                                 # the WINDOW lanes processed: finer chunks
                                 # quantize each tile's live window
                                 # tighter, against a per-region fixed
                                 # cost. r5 sweep on the driver scene:
                                 # 128 -> 189.7, 256 -> 173.5,
                                 # 384 -> 171.1 (min, default),
                                 # 768 -> 209 ms; a partial x128 tail
                                 # chunk covers any cap total
                                 # (_chunk_bounds)
    slots_k: int = 16            # max tiles per splat in slot expansion
    expansion: str = "slots"     # "slots" (fast, capped) | "exact" (searchsorted)
    # binning architecture: "bucket" sorts N splats once into shifted
    # class-pyramid buckets and lets the tile kernel merge its 2x2-cell
    # windows in VMEM (ops/bucket_grid.py — the fast path); "pairs"
    # materializes (splat, tile) pairs and sorts P rows (ops/binning.py —
    # the differentiable path until the bucket backward lands)
    method: str = "pairs"
    # per-class window-span capacities (fine, mid pair, coarse pair, global)
    # for the bucket kernel's static VMEM budget; multiples of 128 (all
    # powers of two => the kernel's odd-even merge tree applies). The
    # default sums to a 2304-lane candidate buffer (fine + 2 mid + 2 coarse
    # + global spans), sized for trained-scene screen statistics at 1080p/1M
    # (scripts/profile_binning.py measures per-class span occupancy)
    bucket_caps: tuple = (512, 256, 512, 256)
    extent_sigma: float = 2.8284271247461903  # sqrt(8) std-devs (threedgs.h.slang stdDev)
    max_basis_px: float = 2048.0  # extent clamp (threedgs.h.slang:117-118)
    dilation: float = 0.3         # low-pass dilation (threedgs.h.slang:69-70)
    alpha_min: float = 1.0 / 255.0
    alpha_clamp: float = 0.999
    alpha_cull_qmax: float = 8.0  # discard A=dot(fragPos,fragPos) > 8 (frag.slang:236-255)
    ms_antialiasing: bool = False  # Mip-Splatting alpha compensation (threedgs.h.slang:63-76)
    point_cloud_mode: bool = False  # fixed 0.2 eigenvalues (threedgs.h.slang:108-110)
    # DEVICE: on-device depth sort inside binning; HOST: the caller runs
    # io/async_loader.AsyncHostSorter and passes its (possibly one-move
    # stale) permutation as render_3dgs(host_order=...) — the benchmark
    # sequencer drives this (bench/sequencer.py)
    sort_method: SortMethod = SortMethod.DEVICE
    frustum_dilation: float = 0.2  # NDC cull margin (FrameInfo.frustumDilation default)
    depth_iso_threshold: float = 0.7  # depth picking T threshold (parameters.h:200)
    size_culling: bool = False
    size_culling_min_px: float = 1.0
    # pair-attribute precision through the binning sorts (the analog of the
    # reference's fp32/fp16 shformat tiers): "f32" = full precision +
    # differentiable; "packed" = bf16-pair + fixed-point-xy words, ~half the
    # sort payloads — forward/rendering only (bit packing has no gradient)
    pair_format: str = "f32"
    # mesh compositing pass: "smooth" = per-vertex Gouraud shading +
    # perspective-correct interpolated depth (threedmesh_raster.vert.slang);
    # "flat" = per-face color + centroid depth (round-1 behavior)
    mesh_shading: str = "smooth"


@dataclasses.dataclass(frozen=True)
class RtConfig:
    """3DGRT ray-tracing parameters (prmRtx, parameters.h:216-240)."""

    kernel_degree: int = 2        # generalized gaussian degree, default quadratic (parameters.h:215)
    # secondary-ray ordering (ops/raytrace.trace_splats): "radial" composes
    # in shared-origin radial order (exact for clustered-origin batches);
    # "windowed" marches max_passes global t-slabs for per-ray-exact order
    # (the tMin-advance of rgen:676-762); "auto" picks by origin spread
    order: str = "auto"
    max_passes: int = 32          # t-slab count of the windowed exact order
    min_transmittance: float = 0.001
    alpha_clamp: float = 0.999
    alpha_min: float = 0.01       # hit response cull (threedgrt.h.slang:149-160)
    # degree-0 kernel support radius in canonical units: the response is
    # culled beyond it, reproducing the reference's deg-0 proxy scale
    # (splat_set_vk.cpp kernelScale; 3.0 = where the linear kernel reaches
    # the default min-response cutoff)
    kernel_scale_deg0: float = 3.0
    max_bounces: int = 3          # wavefront bounce cap (FrameInfo.rtxMaxBounces, shaderio.h:273)
    # splat shadow transmittance in the hybrid/deferred path: "map" = deep
    # shadow maps (fast, 5-level staircase, render/shadows.py); "ray" =
    # per-shade-point ray trace toward each light (exact and continuous —
    # the reference's per-pixel shadow rays, rgen:1261-1464)
    shadows: str = "map"
    # colored-shadow controls (FrameInfo, shaderio.h:305-307). The
    # reference defaults its threshold to 0.8 — a hard black cutoff for
    # T <= 0.8 (rgen:1446-1452); we default 0.0 (continuous raw T) and
    # keep the reference behavior one config away. strength in
    # [0 = mono, 1 = fully colored] tints by the shadow ray's accumulated
    # particle radiance (rgen:1455-1460).
    shadow_offset: float = 0.2
    shadow_transmittance_threshold: float = 0.0
    shadow_color_strength: float = 0.0
    # NOTE: the reference's k_buffer (PARTICLES_SPP sorted hits per pass,
    # gaussian_splatting.cpp:1693) and use_aabbs (AS proxy shape) have no
    # TPU analog — there is no BVH payload or acceleration structure; the
    # windowed t-slab march is the ordering mechanism instead.


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Top-level frame parameters (prmFrame/prmRender, parameters.h:82-178)."""

    pipeline: Pipeline = Pipeline.MESH
    width: int = 800
    height: int = 600
    sh_degree: int = 3            # requested max SH degree (clamped to data degree)
    sh_format: ShFormat = ShFormat.FLOAT32
    camera_type: CameraType = CameraType.PINHOLE
    shutter: ShutterType = ShutterType.GLOBAL  # 3DGUT rolling shutter (S6)
    splat_scale: float = 1.0      # global splat scale multiplier (FrameInfo.splatScale)
    stochastic: StochasticMode = StochasticMode.NONE
    temporal_samples: int = 1     # temporal accumulation frames (post.comp.slang)
    # guided spatial denoiser for stochastic/DoF frames: "atrous" runs the
    # edge-aware a-trous filter (ops/denoise.py) over the renderer's own
    # guide buffers after temporal accumulation — the capability slot of
    # the reference's DLSS-RR (dlss_wrapper.cpp; NGX itself is vendor-
    # locked). "none" = plain temporal averaging only.
    denoise: str = "none"
    opacity_gain: float = 1.0
    show_sh_only: bool = False    # visualize SH radiance without base color (FrameInfo.showShOnly)
    raster: RasterConfig = RasterConfig()
    rt: RtConfig = RtConfig()
    # blend a constant background under the splats (reference clears to black)
    background: tuple[float, float, float] = (0.0, 0.0, 0.0)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def tiles_x(cfg: RenderConfig) -> int:
    return -(-cfg.width // cfg.raster.tile_size)


def tiles_y(cfg: RenderConfig) -> int:
    return -(-cfg.height // cfg.raster.tile_size)
