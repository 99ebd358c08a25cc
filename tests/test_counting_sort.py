"""Counting-sort index math vs lax.sort (ops/counting_sort_ref.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vk_gaussian_splatting_tpu.ops.counting_sort_ref import (
    counting_sort_ref,
    stable_destinations,
)


def test_counting_sort_matches_stable_lax_sort():
    rng = np.random.default_rng(0)
    p, b, chunk = 4096, 97, 256
    keys = jnp.asarray(rng.integers(0, b, size=p).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(5, p)).astype(np.float32))
    ok, orows = counting_sort_ref(keys, rows, b, chunk)

    ref = jax.lax.sort((keys,) + tuple(rows), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref[0]))
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(orows[i]),
                                      np.asarray(ref[1 + i]))


def test_destinations_are_a_permutation():
    rng = np.random.default_rng(1)
    p = 2048
    keys = jnp.asarray(rng.integers(0, 13, size=p).astype(np.int32))
    dest = np.asarray(stable_destinations(keys, 13, 256))
    assert sorted(dest.tolist()) == list(range(p))
