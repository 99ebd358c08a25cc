"""Microbench: in-kernel sort-stage cost across layouts/mask styles (dev tool).

Variants (per compare-exchange stage, key-by-depth, full-row payload move):
  lane-iota    current production stage: payload (R, C) in lanes, masks from
               runtime iota math (ops/raster_bucket._bitonic_stage)
  lane-const   same layout, participation/direction masks passed as a
               precomputed (2S, C) f32 input resident in VMEM
  sub8         transposed layout: elements as (8, C//128) sublane x lane
               blocks -> every roll is a single-vreg sublane/lane roll;
               XOR partners never cross the 128-lane boundary
Usage: bench_sort_stage.py [variant] [rows] [stages] [tpt]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "lane-iota"
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_STAGES = int(sys.argv[3]) if len(sys.argv) > 3 else 55
TPT = int(sys.argv[4]) if len(sys.argv) > 4 else 2
C = 1024
KEY_ROW = ROWS - 1
STEPS = 4096


def full_schedule(c):
    sched = []
    k = 2
    while k <= c:
        j = k // 2
        while j >= 1:
            sched.append((k, j))
            j //= 2
        k *= 2
    return sched


SCHED = full_schedule(C)[:N_STAGES]
if len(SCHED) < N_STAGES:
    SCHED = (SCHED * ((N_STAGES // len(SCHED)) + 1))[:N_STAGES]


def np_masks():
    """(2S, C) f32: rows 2s = is_lo, 2s+1 = want_min."""
    rows = []
    lane = np.arange(C)
    for (k, j) in SCHED:
        is_lo = (lane & j) == 0
        asc = (lane & k) == 0
        want_min = is_lo == asc
        rows.append(is_lo.astype(np.float32))
        rows.append(want_min.astype(np.float32))
    return np.stack(rows, axis=0)


def stage_lane_iota(work, m_ref, s, k, j):
    del m_ref, s
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    x = work[:, :]
    up = pltpu.roll(x, C - j, axis=1)
    dn = pltpu.roll(x, j, axis=1)
    is_lo = (lane & j) == 0
    partner = jnp.where(is_lo, up, dn)
    key_self = x[KEY_ROW:KEY_ROW + 1, :]
    key_part = partner[KEY_ROW:KEY_ROW + 1, :]
    asc = (lane & k) == 0
    want_min = is_lo == asc
    take = ((want_min & (key_part < key_self))
            | (~want_min & (key_part > key_self)))
    work[:, :] = jnp.where(take, partner, x)


def stage_lane_const(work, m_ref, s, k, j):
    del k
    is_lo = m_ref[2 * s:2 * s + 1, :] > 0.5
    want_min = m_ref[2 * s + 1:2 * s + 2, :] > 0.5
    x = work[:, :]
    up = pltpu.roll(x, C - j, axis=1)
    dn = pltpu.roll(x, j, axis=1)
    partner = jnp.where(is_lo, up, dn)
    key_self = x[KEY_ROW:KEY_ROW + 1, :]
    key_part = partner[KEY_ROW:KEY_ROW + 1, :]
    take = ((want_min & (key_part < key_self))
            | (~want_min & (key_part > key_self)))
    work[:, :] = jnp.where(take, partner, x)


def stage_sub8(work, m_ref, s, k, j):
    # element index e = sublane*128 + lane; partner = e ^ j stays within one
    # axis: lane roll for j<128, sublane roll for j>=128
    del k
    is_lo = m_ref[2 * s:2 * s + 1] > 0.5
    want_min = m_ref[2 * s + 1:2 * s + 2] > 0.5
    x = work[:, :, :]
    if j < 128:
        up = pltpu.roll(x, 128 - j, axis=2)
        dn = pltpu.roll(x, j, axis=2)
    else:
        sj = j // 128
        up = pltpu.roll(x, 8 - sj, axis=1)
        dn = pltpu.roll(x, sj, axis=1)
    partner = jnp.where(is_lo, up, dn)
    key_self = x[KEY_ROW:KEY_ROW + 1]
    key_part = partner[KEY_ROW:KEY_ROW + 1]
    take = ((want_min & (key_part < key_self))
            | (~want_min & (key_part > key_self)))
    work[:, :, :] = jnp.where(take, partner, x)


def make_call(variant):
    three_d = variant == "sub8"
    shape = (TPT, ROWS, 8, 128) if three_d else (TPT, ROWS, C)
    mshape = (2 * N_STAGES, 8, 128) if three_d else (2 * N_STAGES, C)
    stage = {"lane-iota": stage_lane_iota, "lane-const": stage_lane_const,
             "sub8": stage_sub8}[variant]

    def kernel(x_ref, m_ref, o_ref, work):
        for t in range(TPT):
            work[t] = x_ref[t]
        for s, (k, j) in enumerate(SCHED):
            for t in range(TPT):
                stage(work.at[t], m_ref, s, k, j)
        for t in range(TPT):
            o_ref[t] = work[t]

    nm = len(mshape)
    return pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec(shape, lambda i: (0,) * len(shape)),
                  pl.BlockSpec(mshape, lambda i: (0,) * nm)],
        out_specs=pl.BlockSpec(shape, lambda i: (0,) * len(shape)),
        scratch_shapes=[pltpu.VMEM(shape, jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    x = jax.random.normal(jax.random.key(0),
                          (TPT, ROWS, 8, 128) if VARIANT == "sub8"
                          else (TPT, ROWS, C))
    m = np_masks()
    if VARIANT == "sub8":
        m = m.reshape(2 * N_STAGES, 8, 128)
    m = jnp.asarray(m)
    call = jax.jit(make_call(VARIANT))

    def sync(v):
        return float(jnp.sum(v))

    sync(call(x, m))
    t0 = time.perf_counter()
    for _ in range(3):
        sync(call(x, m))
    dt = (time.perf_counter() - t0) / 3
    per_stage_ns = dt / STEPS / N_STAGES / TPT * 1e9
    print(f"{VARIANT} rows={ROWS} stages={N_STAGES} tpt={TPT}: "
          f"{dt * 1e3:.2f} ms total, {per_stage_ns:.1f} ns/stage/tile",
          flush=True)


if __name__ == "__main__":
    main()
