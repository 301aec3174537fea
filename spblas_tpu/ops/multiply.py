"""multiply — the polymorphic product entry point + two-phase protocol.

Re-design of the reference's algorithm-API layer
(include/spblas/algorithms/multiply.hpp:9-56, multiply_impl.hpp:105-147).
The reference steers SpMV / SpMM / SpGEMM through C++ overload resolution on
operand iterability; here dispatch is plain Python type inspection over the
folded view chain (SURVEY.md §7: singledispatch-style, not tag_invoke
emulation).

Two-phase contract:
  multiply_inspect(a, b)        — cheap plan hook (no-op for SpMV/SpMM,
                                  multiply_impl.hpp:105-116)
  multiply_compute(a, b, ...)   — symbolic phase; for SpGEMM returns the
                                  info carrying result_nnz/result_shape
  multiply_fill(info, a, b, c)  — numeric phase into user-sized output
"""

from __future__ import annotations

from typing import Optional

import os

from spblas_tpu import views as _v
from spblas_tpu.utils.logging import traced
from spblas_tpu.formats.csr import CSR
from spblas_tpu.formats.csc import CSC
from spblas_tpu.formats.coo import COO
from spblas_tpu.info import OperationInfo
from spblas_tpu.ops import spgemm as _spgemm
from spblas_tpu.ops.spmv import spmv
from spblas_tpu.ops.spmm import spmm


def _kind(a_view, b_view):
    a = _v.get_ultimate_base(a_view)
    b = _v.get_ultimate_base(b_view)
    a_sp = _v.is_sparse(a)
    b_sp = _v.is_sparse(b)
    b_vec = getattr(b, "ndim", 2) == 1 and not b_sp
    if a_sp and b_vec:
        return "spmv"
    if a_sp and b_sp:
        return "spgemm"
    if not a_sp and b_sp:
        return "dense_sparse"   # C = A · B == (Bᵀ · Aᵀ)ᵀ
    return "spmm"  # sparse*dense, dense*dense both handled by spmm


def _debug_validate(*tensors):
    """SPBLAS_DEBUG=1 → host-side structural checks before dispatch
    (the sanitizer-mode analogue, SURVEY.md §5.2)."""
    if os.environ.get("SPBLAS_DEBUG") != "1":
        return
    for t in tensors:
        base = _v.get_ultimate_base(t)
        if hasattr(base, "validate"):
            base.validate()


@traced
def multiply(a, b, c_capacity: Optional[int] = None):
    """c = a @ b with views folded; result type follows operand types
    (dense vector / dense matrix / CSR)."""
    _debug_validate(a, b)
    kind = _kind(a, b)
    if kind == "spmv":
        return spmv(a, b)
    if kind == "spgemm":
        return _spgemm.spgemm(a, b, c_capacity=c_capacity)
    if kind == "dense_sparse":
        # dense A · sparse B via the transpose identity (the reference's
        # generic layer reaches this case through mdspan row iteration).
        # The lazy flip only exists for CSR/CSC; other sparse formats
        # canonicalize first (round-4 review: transposed(COO) raised and
        # BSR/DCSR fell into the dense swapaxes)
        import jax.numpy as jnp
        from spblas_tpu.formats.convert import to_csr
        from spblas_tpu.views import conjugated, scaled, transposed
        b_base, alpha_b, conj_b = _v.fold(b)
        if not isinstance(b_base, (CSR, CSC)):
            # rebuild as alpha * conj(csr): conj applies BELOW the
            # scale so the already-folded alpha is not re-conjugated
            bc = to_csr(b_base)
            b_view = scaled(alpha_b, conjugated(bc) if conj_b else bc)
        else:
            b_view = b
        at = transposed(a)
        return jnp.swapaxes(spmm(transposed(b_view), at), -1, -2)
    return spmm(a, b)


def multiply_inspect(a, b) -> OperationInfo:
    """Plan hook; returns an (empty) info for SpMV/SpMM like the reference
    (multiply_impl.hpp:105-116).  Heavy planning belongs to
    ``views.matrix_opt`` / kernels plans."""
    a_base = _v.get_ultimate_base(a)
    m = a_base.shape[0]
    b_base = _v.get_ultimate_base(b)
    if _kind(a, b) == "spmv" or getattr(b_base, "ndim", 2) == 1:
        # matrix (sparse OR dense) times vector -> vector result
        # (_kind only tags sparse-A products as spmv)
        return OperationInfo(result_shape=(m,), result_nnz=0)
    n_out = b_base.shape[1]
    return OperationInfo(result_shape=(m, n_out), result_nnz=0)


@traced
def multiply_compute(a, b, c_capacity: Optional[int] = None
                     ) -> OperationInfo:
    """Symbolic phase.  For SpGEMM this runs the sort-based structure pass
    and syncs result_nnz to host; for SpMV/SpMM it is the inspect no-op."""
    if _kind(a, b) == "spgemm":
        return _spgemm.spgemm_compute(a, b, c_capacity=c_capacity)
    return multiply_inspect(a, b)


@traced
def multiply_fill(info: OperationInfo, a, b, c=None):
    """Numeric phase (multiply_impl.hpp:143-147: fill == numeric multiply)."""
    if _kind(a, b) == "spgemm":
        return _spgemm.spgemm_fill(info, a, b, c=c)
    return multiply(a, b)
