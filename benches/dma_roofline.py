#!/usr/bin/env python
"""Chunk-DMA roofline measurement (VERDICT r3 ask #8 close-out).

Times a Pallas kernel that reproduces the fused mega-kernel's chunk-DMA
pattern WITHOUT the compute: per sequential grid step, one combined
[m, npc*fr_p, LANES] bf16 copy from an HBM-resident chunk buffer into a
rotating VMEM landing slot, `depth` slots deep, issued depth-1 steps
ahead (ops/fused.py steps 1). A trivial per-step reduction of one landed
row feeds the output so the pipeline is real (the DMA wait is on the
consume path), matching the kernel's dependency structure.

Also measures the UPPER BOUND: one gigantic contiguous copy per grid
step (all bytes in a single descriptor), which is the hardware's
best-case streaming bandwidth through the same machinery.

Timing per bench.py methodology: lax.scan over blocks in one jit with a
scalar readback, differential over two in-jit repetition counts.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rodio_tpu.utils.platform import select_platform

select_platform(os.environ.get("RODIO_TPU_PLATFORM", "axon"))

LANES = 1024


def _dma_kernel(c0_ref, chunks_ref, out_ref, xraw, acc, sems, *, m: int,
                rows: int, depth: int):
    t_idx = pl.program_id(0)
    n_t = pl.num_programs(0)
    slot = jax.lax.rem(t_idx, depth)
    c0 = c0_ref[0]  # carry-derived (always 0): defeats loop hoisting

    def _start(t, s):
        pltpu.make_async_copy(
            chunks_ref.at[pl.ds(c0 + t * m, m)], xraw.at[s], sems.at[s]
        ).start()

    @pl.when(t_idx == 0)
    def _warm():
        for j in range(min(depth - 1, n_t)):
            _start(t_idx + j, jax.lax.rem(t_idx + j, depth))

    @pl.when(t_idx + (depth - 1) < n_t)
    def _prefetch():
        _start(t_idx + (depth - 1),
               jax.lax.rem(t_idx + (depth - 1), depth))

    pltpu.make_async_copy(
        chunks_ref.at[pl.ds(c0 + t_idx * m, m)], xraw.at[slot],
        sems.at[slot]
    ).wait()

    @pl.when(t_idx == 0)
    def _z():
        acc[...] = jnp.zeros((8, 128), jnp.float32)

    # consume one landed row per chunk so the wait is on the value path
    a = acc[...]
    for k in range(m):
        a = a + xraw[slot, k, 0].astype(jnp.float32).reshape(8, 128)
    acc[...] = a

    @pl.when(t_idx == n_t - 1)
    def _store():
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("m", "rows", "depth", "n_t"))
def dma_pass(chunks, c0, *, m: int, rows: int, depth: int, n_t: int):
    return pl.pallas_call(
        functools.partial(_dma_kernel, m=m, rows=rows, depth=depth),
        grid=(n_t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, m, rows, LANES), jnp.bfloat16),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )(jnp.asarray(c0, jnp.int32).reshape(1), chunks)


def time_config(chunks, *, m, rows, depth, n_t, n_blocks=400, r1=1, r2=6,
                reps=4):
    def run_for(repeat):
        def body(s, _):
            # the chunk offset derives from the carry (always 0), so
            # XLA can neither hoist the kernel out of the scan nor DCE
            # it (the summed output is the live result)
            c0 = (s * 0.0).astype(jnp.int32)
            out = dma_pass(chunks, c0, m=m, rows=rows, depth=depth,
                           n_t=n_t)
            return s + jnp.sum(out) * 1e-30, None

        @jax.jit
        def run(s0):
            def outer(_, acc):
                s, _ = jax.lax.scan(body, acc, None, length=n_blocks)
                return s

            return jax.lax.fori_loop(0, repeat, outer, s0)

        return run

    ra = run_for(r1)
    rb = run_for(r2)
    float(ra(jnp.float32(0.0)))
    float(rb(jnp.float32(0.0)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(ra(jnp.float32(0.0)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rb(jnp.float32(0.0)))
        tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / ((r2 - r1) * n_blocks))
    bytes_per_block = n_t * m * rows * LANES * 2
    return best, bytes_per_block / best / 1e9


def main():
    fr_p = 160
    results = []
    # the record config's exact shape: int2 (npc=2), m=3, 10 grid steps
    # (T=4800 at to=160 -> K=30, n_t=10), plus neighbors
    # (10, 2, 2, 3): the near-upper-bound case — one 6.55 MB descriptor
    # per grid step, 2 slots = 13.1 MB VMEM (the 16 MB scoped limit caps
    # anything larger)
    for m, npc, depth, n_t in [(3, 2, 3, 10), (2, 2, 4, 15),
                               (2, 3, 4, 15), (3, 2, 4, 10),
                               (2, 2, 3, 15), (6, 2, 3, 5),
                               (10, 2, 2, 3)]:
        rows = npc * fr_p
        chunks = jnp.asarray(
            np.random.default_rng(0).integers(
                -100, 100, (n_t * m, rows, LANES)
            ).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        per, gbs = time_config(chunks, m=m, rows=rows, depth=depth,
                               n_t=n_t)
        results.append({
            "config": f"m={m} npc={npc} depth={depth} n_t={n_t}",
            "us_per_block": round(per * 1e6, 2),
            "GB_s": round(gbs, 1),
        })
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
