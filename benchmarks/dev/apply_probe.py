"""Pane-streaming SpMM apply-cost probe (round 3).

Design under test: B panes stream through VMEM sequentially (~650 GB/s
— beats XLA's 148 GB/s random row gather), C panel VMEM-resident, and
a scalar-driven per-entry apply:

    C[i, :] += v * Bpane[j, :]

Probe A: per-entry fori_loop, scalars from SMEM prefetch, 4 dynamic
(1, K) slice ops per entry.  Probe B: 8-entry groups targeting one
8-row C window (distinct sublanes), ~13 ops per group.
Also: can make_async_copy write SMEM scratch (HBM -> SMEM index ring)?
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q = 4096            # B pane rows
P = 4096            # C panel rows
K = 256
E = 32_768          # entries per call
ITERS = 20
REPS = 3


def time_call(fn, *args):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for r in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


# ------------------------------------------------------------------ #
# Probe A: per-entry scalar loop
# ------------------------------------------------------------------ #

def _apply_kernel(packed_ref, off_ref, pane_ref, val_ref, out_ref):
    it = pl.program_id(0)
    off = off_ref[0] + it  # vary addressing per grid step (anti-CSE)

    @pl.when(it == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(e, _):
        p = packed_ref[e]
        j = (p & 0xFFF) + off & 0xFFF
        i = (p >> 12) & 0x1FFF
        vrow = val_ref[pl.ds(e, 1), :]      # (1, K) broadcast of v
        out_ref[pl.ds(i, 1), :] = (out_ref[pl.ds(i, 1), :]
                                   + vrow * pane_ref[pl.ds(j, 1), :])
        return 0

    jax.lax.fori_loop(0, E, body, 0)


@jax.jit
def apply_loop(packed, off, pane, val):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec((Q, K), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, K), lambda k, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _apply_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, K), jnp.float32),
    )(packed, off, pane, val)


# ------------------------------------------------------------------ #
# Probe B: 8-entry window groups
# ------------------------------------------------------------------ #

NG = E // 8


def _group_kernel(jidx_ref, wbase_ref, off_ref, pane_ref, gval_ref,
                  out_ref, scratch):  # gval unused (see probe note)
    it = pl.program_id(0)
    off = off_ref[0] + it

    @pl.when(it == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(g, _):
        base = g * 8
        for s in range(8):
            j = (jidx_ref[base + s] + off) & 0xFFF
            scratch[pl.ds(s, 1), :] = pane_ref[pl.ds(j, 1), :]
        w = wbase_ref[g] * 8
        tile = scratch[...] * 1.0009765625
        out_ref[pl.ds(w, 8), :] = out_ref[pl.ds(w, 8), :] + tile
        return 0

    jax.lax.fori_loop(0, NG, body, 0)


@jax.jit
def apply_group(jidx, wbase, off, pane, gval):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec((Q, K), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, K), lambda k, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, K), jnp.float32)],
    )
    return pl.pallas_call(
        _group_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, K), jnp.float32),
    )(jidx, wbase, off, pane, gval)


# ------------------------------------------------------------------ #
# Probe C: HBM -> SMEM DMA support
# ------------------------------------------------------------------ #

def _smem_dma_kernel(src_hbm, out_ref, smem, sem):
    cp = pltpu.make_async_copy(src_hbm.at[pl.ds(0, 128)], smem, sem)
    cp.start()
    cp.wait()
    acc = 0
    for i in range(8):
        acc = acc + smem[i]
    out_ref[0, 0] = acc


@jax.jit
def smem_dma(src):
    return pl.pallas_call(
        _smem_dma_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((128,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(src)


def main():
    rng = np.random.default_rng(0)
    j = rng.integers(0, Q, E).astype(np.int32)
    i = rng.integers(0, P, E).astype(np.int32)
    packed = jnp.asarray(j | (i << 12), jnp.int32)
    pane = jnp.ones((Q, K), jnp.float32)
    val = jnp.ones((E, 1), jnp.float32)
    off = jnp.asarray([0], jnp.int32)

    dt = time_call(apply_loop, packed, off, pane, val)
    print(f"A per-entry loop : {dt*1e3:8.3f} ms/call "
          f"{dt/E*1e9:6.2f} ns/entry -> SpMM {2*K/ (dt/E)/1e9:6.1f} GF",
          flush=True)

    wbase = jnp.asarray(rng.integers(0, P // 8, NG), jnp.int32)
    dt = time_call(apply_group, jnp.asarray(j), wbase, off, pane, val)
    print(f"B 8-entry groups : {dt*1e3:8.3f} ms/call "
          f"{dt/E*1e9:6.2f} ns/entry -> SpMM {2*K/(dt/E)/1e9:6.1f} GF",
          flush=True)

    try:
        out = smem_dma(jnp.arange(1024, dtype=jnp.int32))
        print(f"C HBM->SMEM DMA  : OK, sum={int(out[0,0])} (expect 28)",
              flush=True)
    except Exception as e:  # noqa
        print(f"C HBM->SMEM DMA  : UNSUPPORTED ({type(e).__name__}: "
              f"{str(e)[:200]})", flush=True)


if __name__ == "__main__":
    main()
