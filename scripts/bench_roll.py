"""Microbenchmark: bitonic-stage cost on (R, C) VMEM buffers (dev tool)."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(sys.argv[1]) if len(sys.argv) > 1 else 16
C = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
STAGES = 66
REPS = 200  # grid steps, each running STAGES stages


def stage(work, key_row, c_sort, k, j):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_sort), 1)
    x = work[:, :]
    up = pltpu.roll(x, c_sort - j, axis=1)
    dn = pltpu.roll(x, j, axis=1)
    is_lo = (lane & j) == 0
    partner = jnp.where(is_lo, up, dn)
    key_self = x[key_row:key_row + 1, :]
    key_part = partner[key_row:key_row + 1, :]
    asc = (lane & k) == 0
    want_min = is_lo == asc
    take = ((want_min & (key_part < key_self))
            | (~want_min & (key_part > key_self)))
    work[:, :] = jnp.where(take, partner, x)


def kernel(x_ref, o_ref, work):
    jj = pl.program_id(0)

    @pl.when(jj == 0)
    def _():
        work[:, :] = x_ref[:, :]

    k = 2
    while k <= C:
        j = k // 2
        while j >= 1:
            stage(work, 0, C, k, j)
            j //= 2
        k *= 2

    @pl.when(jj == REPS - 1)
    def _():
        o_ref[:, :] = work[:, :]


f = pl.pallas_call(
    kernel,
    grid=(REPS,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((R, C), jnp.float32)],
    out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)

x = jax.random.uniform(jax.random.key(0), (R, C))
jf = jax.jit(f)
r = jf(x)
float(jnp.sum(r))
t0 = time.perf_counter()
for _ in range(3):
    float(jnp.sum(jf(x)))
dt = (time.perf_counter() - t0) / 3
per_sort = dt / REPS
print(f"R={R} C={C}: {per_sort*1e6:.2f} us per {STAGES}-stage sort; "
      f"{per_sort/66*1e9:.1f} ns/stage; "
      f"8160 tiles -> {per_sort*8160*1e3:.1f} ms")
