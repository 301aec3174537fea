"""SpADD: C = A + B, dense/vector and sparse two-phase forms.

Re-design of the reference add (include/spblas/algorithms/add_impl.hpp):
vector add (:10-21), dense lookupable add (:23-38), CSR per-row SPA union +
csr_builder (:40-77), symbolic ``add_inspect`` (:79-108) and
``add_compute(info, ...)`` (:110-113).  The CSR path uses the same
expand-free merge engine as SpGEMM: concatenate both entry streams, stable
lexicographic sort by (row, col), coalesce duplicates.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spblas_tpu import types as _t
from spblas_tpu import views as _v
from spblas_tpu.backend import engine
from spblas_tpu.formats.csr import CSR
from spblas_tpu.formats.csc import CSC
from spblas_tpu.formats.coo import COO
from spblas_tpu.formats.convert import to_csr
from spblas_tpu.info import OperationInfo
from spblas_tpu.utils.logging import traced


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AddPlan:
    """Sorted merge maps for numeric re-runs with unchanged sparsity."""
    src: jax.Array      # entry index into A.values or B.values
    is_b: jax.Array     # stream flag
    valid: jax.Array
    slot: jax.Array     # output slot (== capacity → dropped)
    c_rowptr: jax.Array
    c_colind: jax.Array
    c_nnz: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def c_capacity(self) -> int:
        return int(self.c_colind.shape[0])


@partial(jax.jit, static_argnames=("m",))
def _merge_sort(a_rowptr, a_colind, a_mask, b_rowptr, b_colind, b_mask, m):
    a_cap = a_colind.shape[0]
    b_cap = b_colind.shape[0]
    a_rows = engine.segment_ids_from_ptr(a_rowptr, a_cap)
    b_rows = engine.segment_ids_from_ptr(b_rowptr, b_cap)
    rows = jnp.concatenate([jnp.where(a_mask, a_rows, m),
                            jnp.where(b_mask, b_rows, m)]).astype(
        _t.index_dtype)
    cols = jnp.concatenate([jnp.where(a_mask, a_colind, 0),
                            jnp.where(b_mask, b_colind, 0)]).astype(
        _t.index_dtype)
    src = jnp.concatenate([jnp.arange(a_cap, dtype=_t.offset_dtype),
                           jnp.arange(b_cap, dtype=_t.offset_dtype)])
    is_b = jnp.concatenate([jnp.zeros((a_cap,), jnp.bool_),
                            jnp.ones((b_cap,), jnp.bool_)])
    valid = jnp.concatenate([a_mask, b_mask])
    rows_s, cols_s, src_s, is_b_s, valid_s = engine.lexsort_coo(
        rows, cols, src, is_b, valid)
    heads, slots, nnz, rowptr = engine.coalesce_sorted(
        rows_s, cols_s, valid_s, m)
    return rows_s, cols_s, src_s, is_b_s, valid_s, heads, slots, rowptr, nnz


@jax.jit
def _add_numeric(plan: AddPlan, a_values, b_values, alpha_a, alpha_b):
    v = jnp.where(plan.is_b,
                  alpha_b * b_values[plan.src % b_values.shape[0]],
                  alpha_a * a_values[plan.src % a_values.shape[0]])
    v = jnp.where(plan.valid, v, 0)
    return jnp.zeros((plan.c_capacity,), dtype=v.dtype).at[plan.slot].add(
        v, mode="drop")


@traced
def add_inspect(a_view, b_view,
                c_capacity: Optional[int] = None) -> OperationInfo:
    """Symbolic union of the two sparsity patterns (add_impl.hpp:79-108).
    One host sync reads result_nnz."""
    a = to_csr(_v.get_ultimate_base(a_view))
    b = to_csr(_v.get_ultimate_base(b_view))
    if a.shape != b.shape:
        raise ValueError(f"add shape mismatch: {a.shape} vs {b.shape}")
    m, n = a.shape
    (rows_s, cols_s, src_s, is_b_s, valid_s, heads, slots, c_rowptr,
     nnz_dev) = _merge_sort(a.rowptr, a.colind, a.entry_mask(),
                            b.rowptr, b.colind, b.entry_mask(), m)
    nnz = int(nnz_dev)
    if c_capacity is None:
        c_capacity = _t.quantize_capacity(max(nnz, 1))
    if nnz > c_capacity:
        raise RuntimeError("add: result capacity too small "
                           "(csr_builder overflow analogue)")
    from spblas_tpu.ops.spgemm import _structure_fill
    c_colind, slot_all = _structure_fill(cols_s, heads, slots, valid_s,
                                         int(c_capacity))
    plan = AddPlan(src=src_s, is_b=is_b_s, valid=valid_s, slot=slot_all,
                   c_rowptr=c_rowptr, c_colind=c_colind, c_nnz=nnz_dev,
                   shape=(m, n))
    return OperationInfo(result_shape=(m, n), result_nnz=nnz,
                         result_capacity=int(c_capacity), plan=plan)


@traced
def add_compute(info: OperationInfo, a_view, b_view,
                c: Optional[CSR] = None) -> CSR:
    """Numeric fill into the union structure (add_impl.hpp:110-113).

    ``c`` supplies user-owned capacity (the allocate-then-fill
    handshake); it must fit result_nnz."""
    plan: AddPlan = info.plan
    a_base, alpha_a, conj_a = _v.fold(a_view)
    b_base, alpha_b, conj_b = _v.fold(b_view)
    a = to_csr(a_base)
    b = to_csr(b_base)
    a_values = jnp.conj(a.values) if conj_a else a.values
    b_values = jnp.conj(b.values) if conj_b else b.values
    c_values = _add_numeric(plan, a_values, b_values, alpha_a, alpha_b)
    out = CSR(values=c_values, rowptr=plan.c_rowptr,
              colind=plan.c_colind, nnz=plan.c_nnz, shape=plan.shape)
    if c is not None:
        if c.capacity < info.result_nnz:
            raise RuntimeError(
                f"add_compute: user capacity {c.capacity} < result_nnz "
                f"{info.result_nnz} (csr_builder overflow analogue)")
        out = out.with_capacity(c.capacity)
    return out


@traced
def add(a_view, b_view, c_capacity: Optional[int] = None):
    """C = A + B.

    Dense/dense, vector/vector → elementwise (add_impl.hpp:10-38);
    sparse/sparse → two-phase union add.
    """
    from spblas_tpu.formats.bsr import BSR
    from spblas_tpu.formats.dcsr import DCSR

    a_base = _v.get_ultimate_base(a_view)
    b_base = _v.get_ultimate_base(b_view)
    sparse_types = (CSR, CSC, COO, BSR, DCSR)
    a_sparse = isinstance(a_base, sparse_types)
    b_sparse = isinstance(b_base, sparse_types)
    if not a_sparse and not b_sparse:
        a, alpha_a, conj_a = _v.fold(a_view)
        b, alpha_b, conj_b = _v.fold(b_view)
        if conj_a:
            a = jnp.conj(a)
        if conj_b:
            b = jnp.conj(b)
        if a.shape != b.shape:
            raise ValueError(f"add shape mismatch: {a.shape} vs {b.shape}")
        return alpha_a * a + alpha_b * b
    if a_sparse and b_sparse:
        info = add_inspect(a_view, b_view, c_capacity=c_capacity)
        return add_compute(info, a_view, b_view)
    # sparse + dense → dense (dense lookupable path, add_impl.hpp:23-38)
    if a_sparse:
        a, alpha_a, conj_a = _v.fold(a_view)
        dense = add(b_view, jnp.zeros(a.shape, dtype=a.dtype))
        sp = jnp.conj(a.todense()) if conj_a else a.todense()
        return alpha_a * sp + dense
    return add(b_view, a_view)
