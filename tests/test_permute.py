"""Bit-exactness contract of the byte-plane block permutation
(ops/permute.py — groundwork for the Pallas counting sort)."""

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.ops.permute import (
    byte_planes_to_f32,
    f32_to_byte_planes,
    permute_block,
)


def _weird_block(rng, r, c):
    """f32 block with adversarial bit patterns: NaN/Inf/denormals/packed
    integer words — everything the pair-attr rows can contain."""
    bits = rng.integers(0, 2 ** 32, size=(r, c), dtype=np.uint32)
    return jnp.asarray(bits).view(jnp.float32) if hasattr(
        jnp.asarray(bits), "view") else jax.lax.bitcast_convert_type(
        jnp.asarray(bits), jnp.float32)


def test_byte_plane_roundtrip_bit_exact():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2 ** 32, size=(14, 256), dtype=np.uint32)
    rows = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.float32)
    back = byte_planes_to_f32(f32_to_byte_planes(rows))
    b0 = np.asarray(jax.lax.bitcast_convert_type(rows, jnp.uint32))
    b1 = np.asarray(jax.lax.bitcast_convert_type(back, jnp.uint32))
    np.testing.assert_array_equal(b0, b1)


def test_permute_block_bit_exact():
    rng = np.random.default_rng(1)
    for c in (32, 128, 256):
        bits = rng.integers(0, 2 ** 32, size=(7, c), dtype=np.uint32)
        rows = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.float32)
        src = jnp.asarray(rng.permutation(c).astype(np.int32))
        out = permute_block(rows, src)
        expect = np.asarray(bits)[:, np.asarray(src)]
        got = np.asarray(jax.lax.bitcast_convert_type(out, jnp.uint32))
        np.testing.assert_array_equal(got, expect)


def test_permute_block_gather_semantics():
    """src may repeat/drop columns (counting-sort runs do both at chunk
    boundaries)."""
    rows = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    src = jnp.asarray([2, 2, 0, 1], jnp.int32)
    out = np.asarray(permute_block(rows, src))
    np.testing.assert_array_equal(out, np.asarray(rows)[:, [2, 2, 0, 1]])
