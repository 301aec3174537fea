"""Pallas per-row DMA-gather rate probe (round 3, SpMM design).

XLA's random row gather caps at ~144 Mrows/s (k=256, f32; see
gather_probe.py) -> ~74 GF SpMM bound.  Question: can a Pallas kernel
issuing per-row DMAs from HBM beat that?  The limit is the scalar
core's DMA issue rate; this probe measures it with a 16-deep
double-buffered pipeline.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_000
K = 256
S = 65_536          # gathered rows per kernel call
G = 16              # DMAs per grid step
ITERS = 20
REPS = 3


def _kernel(idx_ref, off_ref, b_hbm, out_ref, buf, sems):
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    off = off_ref[0]

    def start(slot, step):
        base = step * G
        for i in range(G):
            j = (idx_ref[base + i] + off) % N
            # flat layout: row j at [j*K, (j+1)*K) — 128-aligned offset
            o = pl.multiple_of(j * K, 128)
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(o, K)], buf.at[slot, i], sems.at[slot, i]
            ).start()

    def wait(slot):
        for i in range(G):
            # matching descriptor for wait bookkeeping
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(0, K)], buf.at[slot, i], sems.at[slot, i]
            ).wait()

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        start(0, 0)

    slot = jax.lax.rem(k, 2)

    @pl.when(k + 1 < nk)
    def _():
        start(1 - slot, k + 1)

    wait(slot)
    out_ref[...] = out_ref[...] + buf[slot].reshape(G, K).sum(
        0, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def dma_gather(idx, off, b):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # idx, off
        grid=(S // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
    )(idx, off, b)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, S), jnp.int32)
    b = jnp.ones((N * K,), jnp.float32)

    @jax.jit
    def chain(idx, b):
        def body(i, acc):
            return acc + dma_gather(idx, jnp.asarray([i], jnp.int32), b)[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((K,)))

    jax.block_until_ready(chain(idx, b))
    best = float("inf")
    for r in range(REPS):
        br = b + r * 1e-3
        jax.block_until_ready(br)
        t0 = time.perf_counter()
        out = chain(idx, br)
        jax.block_until_ready(out)
        float(out[0])
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS
    print(f"DMA gather: {dt*1e3:.3f} ms for {S} rows -> "
          f"{S/dt/1e6:.1f} Mrows/s, {S*K*4/dt/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
