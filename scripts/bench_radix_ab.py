"""A/B data for the device-radix-sort decision (VERDICT r4 next #4).

Measures, on the real chip, the three quantities that decide whether a
Pallas counting/radix sort can beat XLA's comparison sort on the binning
workload (docs/radix_sort_design.md):

1. the PRODUCTION binning sort stage — `_key_sort((bucket, depth), 16 attr
   payload rows)` over the 4N slot rows — at 1M / 4M / 16M rows;
2. the run-length structure of the same keys: how many contiguous
   (chunk, coarse-digit) runs pass B of the counting sort would DMA, per
   chunk size and digit width;
3. a Pallas DMA microbenchmark: per-async-copy overhead for HBM->HBM run
   copies of 1 / 4 / 16 / 64 x128-lane blocks, 16 f32 rows each — the cost
   model term that shelved the design in round 3.

Projected pass-B cost = n_runs * per_copy_overhead + bytes / 819 GB/s; the
decision table in docs/radix_sort_design.md cites this script's output.

Usage (chip): PYTHONPATH="/root/repo:$PYTHONPATH" python
scripts/bench_radix_ab.py [rows_millions ...]  (default 1 4 16)
Launch in background, never under `timeout` (device-wedge rule).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vk_gaussian_splatting_tpu.ops.binning import _key_sort  # noqa: E402

R_PAYLOAD = 16  # attr rows carried by the binning sort


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def t_best(fn, *a, n=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*a))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def make_keys(n_rows, n_buckets=13000, seed=0):
    """Synthetic binning keys with the bench scene's occupancy shape:
    ~75% of rows in fine buckets (~8160), rest mid/coarse/global —
    uniform within class (a pessimistic run-length model; real fine
    buckets correlate spatially, giving LONGER runs)."""
    k1, k2 = jax.random.split(jax.random.key(seed))
    fine = jax.random.randint(k1, (n_rows,), 0, 8160)
    rest = jax.random.randint(k2, (n_rows,), 8160, n_buckets)
    pick = jax.random.uniform(jax.random.key(seed + 1), (n_rows,)) < 0.75
    bucket = jnp.where(pick, fine, rest).astype(jnp.int32)
    depth = jax.random.uniform(jax.random.key(seed + 2), (n_rows,))
    return bucket, depth


@jax.jit
def sort_stage(bucket, depth, rows):
    (b_s, _), rows_s = _key_sort((bucket, depth),
                                 tuple(rows[i] for i in range(R_PAYLOAD)),
                                 is_stable=False)
    return b_s, rows_s[0]


def run_stats(bucket, chunk, digit_shift):
    """(n_runs, mean_len) of contiguous same-coarse-digit runs within each
    LOCALLY-GROUPED chunk — pass A sorts each chunk in VMEM, pass B DMAs
    one copy per run, so this is the pass-B DMA count for a given
    (chunk, digit) choice."""
    b = np.sort(np.asarray(bucket).reshape(-1, chunk) >> digit_shift, axis=1)
    changes = (b[:, 1:] != b[:, :-1]).sum() + b.shape[0]
    return int(changes), bucket.shape[0] / max(int(changes), 1)


# ---- DMA microbenchmark ----------------------------------------------------

def _dma_kernel(n_copies, blocks_per_copy):
    def kernel(src_ref, out_ref, buf, sems):
        j = pl.program_id(0)
        for i in range(n_copies):
            # distinct dynamic source offsets so copies cannot coalesce
            off = (j * n_copies + i) % 1024
            pltpu.make_async_copy(
                src_ref.at[pl.ds(off, blocks_per_copy)],
                buf.at[pl.ds((i % 8) * blocks_per_copy, blocks_per_copy)],
                sems.at[i % 8]).start()
            if i >= 7:
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(0, blocks_per_copy)],
                    buf.at[pl.ds(((i - 7) % 8) * blocks_per_copy,
                                 blocks_per_copy)],
                    sems.at[(i - 7) % 8]).wait()
        for i in range(max(n_copies - 7, 0), n_copies):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(0, blocks_per_copy)],
                buf.at[pl.ds((i % 8) * blocks_per_copy, blocks_per_copy)],
                sems.at[i % 8]).wait()
        out_ref[0] = buf[0]
    return kernel


@functools.lru_cache(maxsize=16)
def dma_bench_call(n_steps, n_copies, blocks_per_copy):
    return pl.pallas_call(
        _dma_kernel(n_copies, blocks_per_copy),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((8 * blocks_per_copy, R_PAYLOAD, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        out_shape=jax.ShapeDtypeStruct((1, R_PAYLOAD, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def dma_microbench():
    src = jnp.zeros((2048, R_PAYLOAD, 128), jnp.float32)  # blocked layout
    print("# DMA microbench: 8-deep pipelined HBM->VMEM copies of "
          f"W x ({R_PAYLOAD},128) f32 blocks", flush=True)
    out = {}
    for w in (1, 4, 16, 64):
        n_steps, n_copies = 256, 64
        fn = jax.jit(lambda s, w=w: dma_bench_call(n_steps, n_copies, w)(s))
        ms = t_best(fn, src)
        per = ms * 1e6 / (n_steps * n_copies)
        bw = n_steps * n_copies * w * R_PAYLOAD * 128 * 4 / (ms * 1e-3) / 1e9
        out[w] = per
        print(f"W={w:3d} blocks ({w * R_PAYLOAD * 128 * 4 // 1024:5d} KB): "
              f"{per:7.1f} ns/copy  ({bw:6.1f} GB/s effective)", flush=True)
    return out


def main():
    sizes_m = [float(s) for s in sys.argv[1:]] or [1, 4, 16]
    per_copy = dma_microbench()
    print(f"\n# sort A/B ({R_PAYLOAD} payload rows, 2 keys)", flush=True)
    for m in sizes_m:
        n = int(m * 1e6) // 4096 * 4096
        bucket, depth = make_keys(n)
        rows = jnp.zeros((R_PAYLOAD, n), jnp.float32)
        ms = t_best(sort_stage, bucket, depth, rows,
                    n=3 if m >= 8 else 5)
        print(f"\nN = {m:g}M rows: XLA sort stage = {ms:.1f} ms", flush=True)
        b_np = np.asarray(bucket)
        for chunk, shift in ((4096, 7), (4096, 0), (16384, 7)):
            runs, mean_len = run_stats(b_np[:n], chunk, shift)
            # pass B projected: runs * per-copy latency (nearest W) + BW term
            w_near = min((1, 4, 16, 64),
                         key=lambda w: abs(w * 128 - mean_len))
            lat = runs * per_copy[w_near] * 1e-6
            bw_ms = n * R_PAYLOAD * 4 * 2 / 819e9 * 1e3
            print(f"  passB(chunk={chunk}, digit>>{shift}): {runs} runs, "
                  f"mean {mean_len:.1f} rows -> projected "
                  f">= {lat:.1f} ms latency + {bw_ms:.1f} ms BW "
                  f"(x2 passes for full order)", flush=True)


if __name__ == "__main__":
    main()
