"""Image comparison metrics: MSE / PSNR / FLIP.

Re-implements the reference's GPU metric passes (S15,
image_compare_metric.comp.slang; ImageCompare H15) as vectorized jnp:

- MSE / PSNR over linear RGB.
- FLIP in both reference flavours:
  - "approx": single-scale Sobel-based edge/point feature difference combined
    with a YCxCz color difference (the shader's fast path).
  - "full": the reference Gaussian-pyramid FLIP is approximated here with the
    same spatial prefiltering applied via separable Gaussian convolution at
    the viewing-condition-derived sigma; identical perceptibility calibration
    (<0.03 imperceptible, 0.03-0.10 barely, >0.10 visible —
    image_compare_metric.comp.slang:60-66).

All differentiable; usable as training losses too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a - b) ** 2)


def psnr(a: jax.Array, b: jax.Array, peak: float = 1.0) -> jax.Array:
    m = mse(a, b)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(m, 1e-12))


# ---------------------------------------------------------------------------
# FLIP (Andersson et al. 2020), following the reference shader's structure.
# ---------------------------------------------------------------------------

_SRGB2XYZ = jnp.asarray([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
], jnp.float32)


def _linear_to_ycxcz(rgb: jax.Array) -> jax.Array:
    """Linear RGB -> YCxCz (the FLIP opponent space)."""
    xyz = rgb @ _SRGB2XYZ.T
    ref = jnp.asarray([0.950428545, 1.0, 1.088900371], jnp.float32)
    xyz = xyz / ref
    y = 116.0 * xyz[..., 1] - 16.0
    cx = 500.0 * (xyz[..., 0] - xyz[..., 1])
    cz = 200.0 * (xyz[..., 1] - xyz[..., 2])
    return jnp.stack([y, cx, cz], -1)


def _hunt(y: jax.Array, c: jax.Array) -> jax.Array:
    return 0.01 * y * c


def _hyab(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hunt-adjusted L*a*b*-ish difference used by FLIP."""
    ya, cxa, cza = a[..., 0], a[..., 1], a[..., 2]
    yb, cxb, czb = b[..., 0], b[..., 1], b[..., 2]
    dl = jnp.abs(ya - yb)
    dab = jnp.sqrt((_hunt(ya, cxa) - _hunt(yb, cxb)) ** 2
                   + (_hunt(ya, cza) - _hunt(yb, czb)) ** 2)
    return dl + dab


def _gauss_kernel1d(sigma: float, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _sep_filter(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2D convolution with reflect padding, channels last."""
    r = (k.shape[0] - 1) // 2
    pad = jnp.pad(img, ((r, r), (0, 0), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for i in range(k.shape[0]):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(pad, i, img.shape[0], 0)
    pad = jnp.pad(out, ((0, 0), (r, r), (0, 0)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i in range(k.shape[0]):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(pad, i, img.shape[1], 1)
    return out2


def _sobel(img: jax.Array):
    """Per-channel Sobel gradients; img (H,W,C) -> (gx, gy)."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = img.shape[:2]
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            sl = p[dy:dy + h, dx:dx + w]
            gx = gx + kx[dy, dx] * sl
            gy = gy + kx[dx, dy] * sl
    return gx, gy


def flip(reference: jax.Array, test: jax.Array,
         pixels_per_degree: float = 67.0, approx: bool = False) -> jax.Array:
    """Per-pixel FLIP error map in [0,1].

    reference/test: (H,W,3) linear RGB in [0,1].
    pixels_per_degree: viewing condition (reference default display setup).
    approx=True matches the shader's single-scale Sobel fast path.
    """
    reference = jnp.clip(reference, 0.0, 1.0)
    test = jnp.clip(test, 0.0, 1.0)

    if not approx:
        # spatial prefiltering of the opponent channels (CSF approximation)
        sigma = 0.0047 * pixels_per_degree * 4.0
        radius = max(int(3 * sigma), 1)
        k = _gauss_kernel1d(sigma, radius)
        ref_f = _sep_filter(reference, k)
        test_f = _sep_filter(test, k)
    else:
        ref_f, test_f = reference, test

    a = _linear_to_ycxcz(ref_f)
    b = _linear_to_ycxcz(test_f)

    # color difference, normalized by the max HyAB of pure green vs blue
    huge = _hyab(_linear_to_ycxcz(jnp.asarray([[[0.0, 1.0, 0.0]]])),
                 _linear_to_ycxcz(jnp.asarray([[[0.0, 0.0, 1.0]]])))[0, 0]
    qc, pc = 0.7, 0.4
    d = _hyab(a, b)
    d = jnp.where(
        d < pc * huge,
        (pc / huge) * d / pc,
        pc + ((d - pc * huge) / (huge * (1.0 - pc))) * (1.0 - pc),
    )
    color_err = d ** qc

    # feature (edge/point) difference on the achromatic channel
    ya = (a[..., 0:1] + 16.0) / 116.0
    yb = (b[..., 0:1] + 16.0) / 116.0
    gxa, gya = _sobel(ya)
    gxb, gyb = _sobel(yb)
    ea = jnp.sqrt(gxa ** 2 + gya ** 2)[..., 0]
    eb = jnp.sqrt(gxb ** 2 + gyb ** 2)[..., 0]
    qf = 0.5
    feature_err = jnp.clip(jnp.abs(ea - eb) * 4.0, 0.0, 1.0) ** qf

    return jnp.clip(color_err * (1.0 - feature_err) + feature_err, 0.0, 1.0)


def flip_mean(reference: jax.Array, test: jax.Array, **kw) -> jax.Array:
    return jnp.mean(flip(reference, test, **kw))
