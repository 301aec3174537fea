"""Pallas BSR kernels: block-sparse × dense on the MXU.

The reference's SpMM is a scalar loop (multiply_impl.hpp:66-92) and its
accelerated path is vendor-opaque; on TPU the right formulation is block
sparsity: each stored block is a dense (bh, bw) tile, so SpMM becomes a
stream of MXU contractions with **zero index traffic inside blocks**.

Kernel shape (per the Pallas TPU guide):
  grid = (mb,)  — one program per block row
  block_rowptr / block_colind ride in as scalar-prefetch operands so the
  kernel can issue data-dependent DMAs;
  A blocks and B row-panels are double-buffered HBM→VMEM while the MXU
  consumes the previous pair (loop bound = this row's block count, so
  padding blocks cost nothing);
  the (bh, k) output tile accumulates in VMEM and is written once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.formats.bsr import BSR
from spblas_tpu.types import on_tpu as _on_tpu, no_x64




def _bsr_spmm_kernel(rowptr_ref, colind_ref, values_ref, b_ref, out_ref,
                     a_buf, b_buf, a_sem, b_sem, *, bh, bw, k):
    i = pl.program_id(0)
    lo = rowptr_ref[i]
    hi = rowptr_ref[i + 1]
    nblk = hi - lo

    def get_dmas(slot, e):
        j = colind_ref[e]
        a_dma = pltpu.make_async_copy(values_ref.at[e], a_buf.at[slot],
                                      a_sem.at[slot])
        b_dma = pltpu.make_async_copy(b_ref.at[pl.ds(j * bw, bw), :],
                                      b_buf.at[slot], b_sem.at[slot])
        return a_dma, b_dma

    @pl.when(nblk > 0)
    def _():
        a_dma, b_dma = get_dmas(0, lo)
        a_dma.start()
        b_dma.start()

    out_ref[...] = jnp.zeros((bh, k), dtype=out_ref.dtype)

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        e = lo + t

        @pl.when(t + 1 < nblk)
        def _():
            a_dma, b_dma = get_dmas(1 - slot, e + 1)
            a_dma.start()
            b_dma.start()

        a_dma, b_dma = get_dmas(slot, e)
        a_dma.wait()
        b_dma.wait()
        out_ref[...] += jnp.dot(a_buf[slot], b_buf[slot],
                                preferred_element_type=out_ref.dtype,
                                precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)


@no_x64
@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_spmm(a: BSR, b: jax.Array, interpret: bool | None = None
             ) -> jax.Array:
    """C = A @ B with BSR A and dense row-major B of shape (n, k).

    k should be a multiple of 128 (lane width); bh a multiple of 8 and
    bw a multiple of 128 for f32 tiling.
    """
    m, n = a.shape
    bh, bw = a.block_shape
    if b.shape[0] != n:
        raise ValueError(f"bsr_spmm: A is {a.shape}, B is {b.shape}")
    k = b.shape[1]
    mb = m // bh
    if interpret is None:
        interpret = not _on_tpu()
    out_dtype = jnp.result_type(a.dtype, b.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # block_rowptr, block_colind
        grid=(mb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # values (cap, bh, bw)
            pl.BlockSpec(memory_space=pl.ANY),   # b (n, k)
        ],
        out_specs=pl.BlockSpec((bh, k), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bh, bw), out_dtype),
            pltpu.VMEM((2, bw, k), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bsr_spmm_kernel, bh=bh, bw=bw, k=k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, k), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * int(a.capacity) * bh * bw * k,
            bytes_accessed=int(a.capacity) * (bh * bw + bw * k) * 4
            + m * k * 4,
            transcendentals=0,
        ),
    )(a.block_rowptr.astype(jnp.int32), a.block_colind.astype(jnp.int32),
      a.values.astype(out_dtype), b.astype(out_dtype))


def _bsr_spmv_kernel(rowptr_ref, colind_ref, values_ref, x_ref, out_ref,
                     a_buf, a_sem, *, bh, bw):
    # out_ref is the whole (mb, bh) array (bh < 128 lanes, so per-program
    # output blocking would violate lane tiling); the TPU grid runs
    # sequentially on the core, so each program owns row i exclusively.
    i = pl.program_id(0)
    lo = rowptr_ref[i]
    hi = rowptr_ref[i + 1]
    nblk = hi - lo

    def get_dma(slot, e):
        return pltpu.make_async_copy(values_ref.at[e], a_buf.at[slot],
                                     a_sem.at[slot])

    @pl.when(nblk > 0)
    def _():
        get_dma(0, lo).start()

    def body(t, acc):
        slot = jax.lax.rem(t, 2)
        e = lo + t

        @pl.when(t + 1 < nblk)
        def _():
            get_dma(1 - slot, e + 1).start()

        get_dma(slot, e).wait()
        j = colind_ref[e]
        xj = x_ref[0, pl.ds(j * bw, bw)]            # (bw,) from VMEM
        # (1, bw) · (bh, bw)^T on the MXU → (1, bh)
        return acc + jax.lax.dot_general(
            xj[None, :], a_buf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=acc.dtype,
            precision=jax.lax.Precision.HIGHEST)

    acc = jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((1, bh), dtype=out_ref.dtype))
    out_ref[i, :] = acc[0]


@no_x64
@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_spmv(a: BSR, x: jax.Array, interpret: bool | None = None
             ) -> jax.Array:
    """y = A @ x with BSR A; x resides fully in VMEM (n*4 bytes must fit).

    Output is laid out (mb, bh) and reshaped to (m,).
    """
    m, n = a.shape
    bh, bw = a.block_shape
    if x.shape[0] != n:
        raise ValueError(f"bsr_spmv: A is {a.shape}, x is {x.shape}")
    mb = m // bh
    if interpret is None:
        interpret = not _on_tpu()
    out_dtype = jnp.result_type(a.dtype, x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(mb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # values
            pl.BlockSpec((1, n), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # x (1, n)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # whole (mb, bh)
        scratch_shapes=[
            pltpu.VMEM((2, bh, bw), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bsr_spmv_kernel, bh=bh, bw=bw)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mb, bh), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(a.block_rowptr.astype(jnp.int32), a.block_colind.astype(jnp.int32),
      a.values.astype(out_dtype), x.astype(out_dtype)[None, :])
    return y.reshape(m)
