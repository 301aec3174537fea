"""Interop with jax.experimental.sparse (BCOO) and scipy.sparse.

Bridges let users move between ecosystem formats and this framework's
capacity-padded containers without hand-rolling index plumbing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spblas_tpu import types as _t
from spblas_tpu.formats.coo import COO
from spblas_tpu.formats.csr import CSR
from spblas_tpu.formats.convert import to_coo, to_csr


def from_bcoo(b, capacity=None) -> CSR:
    """jax.experimental.sparse.BCOO (n_batch=0, n_dense=0) → CSR."""
    if b.indices.shape[-1] != 2 or b.data.ndim != 1:
        raise ValueError("only plain rank-2 BCOO (no batch/dense dims)")
    rows = np.asarray(b.indices[:, 0])
    cols = np.asarray(b.indices[:, 1])
    vals = np.asarray(b.data)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    m, n = b.shape
    rowptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(rowptr[1:], rows, 1)
    return CSR.from_arrays(vals, np.cumsum(rowptr), cols, (m, n),
                           nnz=len(vals), capacity=capacity)


def to_bcoo(a):
    """Any container → jax.experimental.sparse.BCOO (live entries only)."""
    from jax.experimental import sparse as jsparse

    coo = to_coo(a)
    nnz = int(coo.nnz)
    indices = jnp.stack([coo.rowind[:nnz].astype(jnp.int32),
                         coo.colind[:nnz].astype(jnp.int32)], axis=1)
    return jsparse.BCOO((coo.values[:nnz], indices), shape=coo.shape)


def from_scipy(a, capacity=None) -> CSR:
    """scipy.sparse matrix → CSR container."""
    a = a.tocsr()
    return CSR.from_arrays(a.data, a.indptr, a.indices, a.shape,
                           nnz=a.nnz, capacity=capacity)


def to_scipy(a):
    """Any container → scipy.sparse.csr_matrix."""
    import scipy.sparse as sps

    a = to_csr(a)
    nnz = int(a.nnz)
    m, n = a.shape
    return sps.csr_matrix(
        (np.asarray(a.values)[:nnz], np.asarray(a.colind)[:nnz],
         np.asarray(a.rowptr)[: m + 1]), shape=(m, n))
