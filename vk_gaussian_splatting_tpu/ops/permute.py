"""Exact block permutation via byte-plane one-hot matmuls (radix groundwork).

Building block for the planned Pallas counting sort (docs/radix_sort_design
.md): Mosaic has no vectorized dynamic addressing, but a permutation WITHIN a
block can ride the MXU as a one-hot matmul — and stays BIT-EXACT even on the
bf16-grade TPU matmul path if the payload is decomposed into byte planes
(integers <= 255 are exactly representable in bf16, and every output element
of a one-hot product is a sum with exactly one nonzero term).

This module is the XLA-level reference implementation + exactness contract;
the in-kernel version reuses the same decomposition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def f32_to_byte_planes(rows: jax.Array) -> jax.Array:
    """(R, C) f32 (any bit patterns incl. NaN/Inf/packed words) ->
    (4R, C) f32 byte planes with integer values in [0, 255]."""
    bits = jax.lax.bitcast_convert_type(rows, jnp.uint32)
    planes = [((bits >> (8 * b)) & 0xFF).astype(jnp.float32)
              for b in range(4)]
    return jnp.concatenate(planes, axis=0)


def byte_planes_to_f32(planes: jax.Array) -> jax.Array:
    """Inverse of f32_to_byte_planes."""
    r4 = planes.shape[0]
    r = r4 // 4
    bits = jnp.zeros((r, planes.shape[1]), jnp.uint32)
    for b in range(4):
        p = planes[b * r:(b + 1) * r].astype(jnp.uint32)
        bits = bits | (p << (8 * b))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def permute_block(rows: jax.Array, src: jax.Array) -> jax.Array:
    """out[:, j] = rows[:, src[j]] — bit-exact for arbitrary f32 patterns.

    rows (R, C), src (C,) i32 with C <= 256 (the byte-plane exactness bound
    for the one-hot contraction on a bf16-grade MXU). The one-hot matrix is
    built from an iota comparison; the contraction is the only data movement.
    """
    c = rows.shape[1]
    assert c <= 256, "byte-plane exactness holds for blocks <= 256"
    onehot = (src[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
              ).astype(jnp.float32)                     # (C_out, C_in)
    planes = f32_to_byte_planes(rows)                   # (4R, C)
    permuted = jax.lax.dot_general(
        planes, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (4R, C_out)
    return byte_planes_to_f32(permuted)
