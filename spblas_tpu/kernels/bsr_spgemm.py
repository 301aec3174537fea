"""Block-sparse SpGEMM on the MXU: C = A @ B with BSR operands.

The scalar SpGEMM's numeric phase is gather/scatter-bound on TPU
(PERF_NOTES.md); with block structure, the product becomes a stream of
dense (bh, bk) @ (bk, bw) MXU contractions — the same two-phase
inspector-executor protocol, but the symbolic phase works on the *block*
graph (tiny — host C++ Gustavson via spblas_tpu.native) and the numeric
phase is a Pallas kernel with scalar-prefetched pair lists and
double-buffered block DMA.

Layout contract: A is BSR with blocks (bh, bk); B is BSR with blocks
(bk, bw); C comes out BSR with blocks (bh, bw).  bk and bw should be
128-multiples, bh an 8-multiple.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu import types as _t
from spblas_tpu.formats.bsr import BSR
from spblas_tpu.types import on_tpu as _on_tpu, no_x64


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsrSpgemmPlan:
    """Numeric plan from the block-symbolic phase.

    pair_ptr (nnzb_c + 1,): contraction-pair range per C block;
    pair_a / pair_b: A / B block indices per pair;
    c_rowptr / c_colind: C's block structure.
    """

    pair_ptr: jax.Array
    pair_a: jax.Array
    pair_b: jax.Array
    c_rowptr: jax.Array
    c_colind: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    block_shape: Tuple[int, int] = dataclasses.field(
        metadata=dict(static=True))

    @property
    def nnzb_c(self) -> int:
        return int(self.pair_ptr.shape[0]) - 1


def bsr_spgemm_compute(a: BSR, b: BSR) -> BsrSpgemmPlan:
    """Block-symbolic phase (host): structure of C and the contraction
    pair list per C block.  Costs O(block flops) on the tiny block graph."""
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"bsr_spgemm: A is {a.shape}, B is {b.shape}")
    bh, bk = a.block_shape
    bk2, bw = b.block_shape
    if bk != bk2:
        raise ValueError(
            f"block mismatch: A blocks {a.block_shape}, "
            f"B blocks {b.block_shape}")
    na = int(a.nnz_blocks)
    nb = int(b.nnz_blocks)
    a_rp = np.asarray(a.block_rowptr).astype(np.int64)
    a_ci = np.asarray(a.block_colind)[:na]
    a_rows = np.repeat(np.arange(len(a_rp) - 1),
                       np.minimum(a_rp[1:], na) - np.minimum(a_rp[:-1], na))
    b_rp = np.asarray(b.block_rowptr).astype(np.int64)
    b_ci = np.asarray(b.block_colind)[:nb]

    # expansion over the block graph (small): every A block (i, kk)
    # pairs with every B block in block-row kk
    b_len = np.minimum(b_rp[1:], nb) - np.minimum(b_rp[:-1], nb)
    counts = b_len[a_ci]
    e_total = int(counts.sum())
    src_a = np.repeat(np.arange(na), counts)
    local = np.arange(e_total) - np.repeat(np.cumsum(counts) - counts,
                                           counts)
    src_b = np.repeat(np.minimum(b_rp[:-1], nb)[a_ci], counts) + local
    rows_e = np.repeat(a_rows, counts)
    cols_e = b_ci[src_b]
    order = np.lexsort((cols_e, rows_e))
    rows_s, cols_s = rows_e[order], cols_e[order]
    heads = np.concatenate([[True], (rows_s[1:] != rows_s[:-1]) |
                            (cols_s[1:] != cols_s[:-1])]) \
        if e_total else np.zeros(0, bool)
    nnzb_c = int(heads.sum())
    pair_ptr = np.concatenate([np.flatnonzero(heads), [e_total]]) \
        if e_total else np.zeros(1, np.int64)
    c_colind = cols_s[heads] if e_total else np.zeros(0, np.int64)
    c_rows = rows_s[heads] if e_total else np.zeros(0, np.int64)
    mb = len(a_rp) - 1
    c_rowptr = np.zeros(mb + 1, np.int64)
    np.add.at(c_rowptr[1:], c_rows, 1)
    pa = src_a[order] if e_total else np.zeros(1, np.int64)
    pb = src_b[order] if e_total else np.zeros(1, np.int64)
    return BsrSpgemmPlan(
        pair_ptr=jnp.asarray(pair_ptr, jnp.int32),
        pair_a=jnp.asarray(pa, jnp.int32),
        pair_b=jnp.asarray(pb, jnp.int32),
        c_rowptr=jnp.asarray(np.cumsum(c_rowptr), _t.offset_dtype),
        c_colind=jnp.asarray(c_colind, _t.index_dtype),
        shape=(m, n), block_shape=(bh, bw))


def _numeric_kernel(pair_ptr_ref, pair_a_ref, pair_b_ref, a_ref, b_ref,
                    out_ref, a_buf, b_buf, a_sem, b_sem, *, bh, bk, bw):
    e = pl.program_id(0)
    lo = pair_ptr_ref[e]
    hi = pair_ptr_ref[e + 1]
    npair = hi - lo

    def get_dmas(slot, t):
        a_dma = pltpu.make_async_copy(a_ref.at[pair_a_ref[t]],
                                      a_buf.at[slot], a_sem.at[slot])
        b_dma = pltpu.make_async_copy(b_ref.at[pair_b_ref[t]],
                                      b_buf.at[slot], b_sem.at[slot])
        return a_dma, b_dma

    @pl.when(npair > 0)
    def _():
        for d in get_dmas(0, lo):
            d.start()

    out_ref[0] = jnp.zeros((bh, bw), dtype=out_ref.dtype)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < npair)
        def _():
            for d in get_dmas(1 - slot, lo + t + 1):
                d.start()

        a_dma, b_dma = get_dmas(slot, lo + t)
        a_dma.wait()
        b_dma.wait()
        out_ref[0] += jnp.dot(a_buf[slot], b_buf[slot],
                              preferred_element_type=out_ref.dtype,
                              precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(0, npair, body, 0)




@no_x64
def bsr_spgemm_numeric(plan: BsrSpgemmPlan, a: BSR, b: BSR,
                       interpret: bool | None = None) -> BSR:
    """Numeric phase: one grid program per C block, contraction pairs
    streamed with double-buffered DMA onto the MXU.  Re-runnable with
    new values over unchanged block sparsity."""
    bh, bk = a.block_shape
    bw = b.block_shape[1]
    nnzb_c = plan.nnzb_c
    if interpret is None:
        interpret = not _on_tpu()
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if nnzb_c == 0:
        mb = plan.c_rowptr.shape[0] - 1
        return BSR(values=jnp.zeros((1, bh, bw), out_dtype),
                   block_rowptr=plan.c_rowptr,
                   block_colind=jnp.zeros((1,), _t.index_dtype),
                   nnz_blocks=jnp.asarray(0, jnp.int32),
                   shape=plan.shape, block_shape=plan.block_shape)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # pair_ptr, pair_a, pair_b
        grid=(max(nnzb_c, 1),),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # A blocks
            pl.BlockSpec(memory_space=pl.ANY),   # B blocks
        ],
        out_specs=pl.BlockSpec((1, bh, bw), lambda e, *_: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bh, bk), out_dtype),
            pltpu.VMEM((2, bk, bw), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_numeric_kernel, bh=bh, bk=bk, bw=bw)
    c_blocks = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((max(nnzb_c, 1), bh, bw),
                                       out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(plan.pair_ptr, plan.pair_a, plan.pair_b,
      a.values.astype(out_dtype), b.values.astype(out_dtype))

    cap = _t.quantize_capacity(max(nnzb_c, 1))
    pad = cap - nnzb_c
    values = jnp.concatenate(
        [c_blocks[:nnzb_c],
         jnp.zeros((pad, bh, bw), out_dtype)]) if pad else \
        c_blocks[:nnzb_c]
    colind = jnp.concatenate(
        [plan.c_colind, jnp.zeros((cap - nnzb_c,), _t.index_dtype)]) \
        if pad else plan.c_colind
    return BSR(values=values, block_rowptr=plan.c_rowptr,
               block_colind=colind,
               nnz_blocks=jnp.asarray(nnzb_c, jnp.int32),
               shape=plan.shape, block_shape=plan.block_shape)


def bsr_spgemm(a: BSR, b: BSR, interpret: bool | None = None) -> BSR:
    """One-shot block SpGEMM (compute + numeric)."""
    plan = bsr_spgemm_compute(a, b)
    return bsr_spgemm_numeric(plan, a, b, interpret=interpret)
