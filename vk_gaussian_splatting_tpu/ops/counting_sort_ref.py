"""Reference counting sort: the index math of the planned Pallas kernel.

docs/radix_sort_design.md splits the tile-grouping sort into (1) per-chunk
histograms + in-chunk ranks, (2) a tiny host-side exclusive scan, (3)
structured data movement. This module implements the exact index arithmetic
in pure jnp (with one scatter that the kernel replaces by run-DMAs), so the
fiddly part — stable destination computation — is locked down by tests
against `lax.sort` long before any Mosaic code exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunk_histograms(keys: jax.Array, n_buckets: int, chunk: int):
    """(P,) i32 keys -> (n_chunks, n_buckets) i32 histograms."""
    p = keys.shape[0]
    assert p % chunk == 0
    ck = keys.reshape(p // chunk, chunk)
    onehot = ck[:, :, None] == jnp.arange(n_buckets, dtype=keys.dtype)
    return jnp.sum(onehot.astype(jnp.int32), axis=1)


def stable_destinations(keys: jax.Array, n_buckets: int, chunk: int):
    """Per-element stable output position for a counting sort by key.

    dest[c, i] = bucket_start[k] + chunk_bucket_offset[c, k] + rank_in_chunk
    where rank_in_chunk is the prefix count of key k inside chunk c — the
    decomposition the kernel computes with one-hot matmuls (exact for
    chunk <= 256, ops/permute.py).
    """
    p = keys.shape[0]
    nc = p // chunk
    ck = keys.reshape(nc, chunk)
    hist = chunk_histograms(keys, n_buckets, chunk)     # (nc, B)

    total = jnp.sum(hist, axis=0)                        # (B,)
    bucket_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(total)[:-1].astype(jnp.int32)])
    chunk_off = jnp.concatenate(
        [jnp.zeros((1, n_buckets), jnp.int32),
         jnp.cumsum(hist, axis=0)[:-1].astype(jnp.int32)], axis=0)  # (nc, B)

    onehot = (ck[:, :, None] ==
              jnp.arange(n_buckets, dtype=keys.dtype)).astype(jnp.int32)
    rank = jnp.cumsum(onehot, axis=1) - onehot           # exclusive, (nc,C,B)
    rank_in_chunk = jnp.sum(rank * onehot, axis=2)       # (nc, C)

    dest = (bucket_start[ck] + jnp.take_along_axis(
        chunk_off, ck, axis=1) + rank_in_chunk)
    return dest.reshape(p)


def counting_sort_ref(keys: jax.Array, rows: jax.Array, n_buckets: int,
                      chunk: int = 256):
    """Stable counting sort of (R, P) rows by (P,) keys in [0, n_buckets).

    The scatter below is the step the kernel replaces with per-(chunk,
    bucket) contiguous-run DMAs; everything before it is the kernel's own
    arithmetic."""
    dest = stable_destinations(keys, n_buckets, chunk)
    p = keys.shape[0]
    out_keys = jnp.zeros_like(keys).at[dest].set(keys)
    out_rows = jnp.zeros_like(rows).at[:, dest].set(rows)
    return out_keys, out_rows
