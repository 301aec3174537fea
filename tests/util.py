"""Shared test utilities: independent numpy oracles + tolerance model.

The oracles re-compute expected results with plain numpy loops/BLAS from the
*raw arrays* — independent of the library's own todense/ops — exactly the
reference's oracle style (test/gtest/spmv_test.cpp:23-30 etc.).  The
tolerance model mirrors EXPECT_EQ_ (test/gtest/util.hpp:7-23): relative
error <= factor * eps * (|t| + |u|) with an absolute floor.
"""

from __future__ import annotations

import numpy as np

# the reference's dims grid: (m, n, nnz) triples (test/gtest/util.hpp:27-33)
DIMS = [(1000, 100, 100), (100, 1000, 10000), (40, 40, 1000)]
SQUARE_DIMS = [(100, 100, 100), (40, 40, 1000)]


def dense_from_csr(a) -> np.ndarray:
    """Independent CSR → dense expansion from raw arrays."""
    m, n = a.shape
    rowptr = np.asarray(a.rowptr)
    colind = np.asarray(a.colind)
    values = np.asarray(a.values)
    nnz = int(a.nnz)
    out = np.zeros((m, n), dtype=values.dtype)
    for i in range(m):
        for e in range(rowptr[i], min(rowptr[i + 1], nnz)):
            out[i, colind[e]] += values[e]
    return out


def dense_from_csc(a) -> np.ndarray:
    m, n = a.shape
    colptr = np.asarray(a.colptr)
    rowind = np.asarray(a.rowind)
    values = np.asarray(a.values)
    nnz = int(a.nnz)
    out = np.zeros((m, n), dtype=values.dtype)
    for j in range(n):
        for e in range(colptr[j], min(colptr[j + 1], nnz)):
            out[rowind[e], j] += values[e]
    return out


def csr_entries(c) -> dict:
    """Materialize a CSR result as {(i, j): value} tolerating duplicate
    column indices within rows (spgemm_test.cpp:44-68 oracle style)."""
    m, n = c.shape
    rowptr = np.asarray(c.rowptr)
    colind = np.asarray(c.colind)
    values = np.asarray(c.values)
    nnz = int(c.nnz)
    out = {}
    for i in range(m):
        for e in range(rowptr[i], min(rowptr[i + 1], nnz)):
            key = (i, int(colind[e]))
            out[key] = out.get(key, 0) + values[e]
    return out


def assert_close(t, u, factor=64, abs_floor=None, err_msg=""):
    """EXPECT_EQ_ analogue: |t - u| <= factor*eps*(|t|+|u|) + floor."""
    t = np.asarray(t)
    u = np.asarray(u)
    assert t.shape == u.shape, f"shape mismatch {t.shape} vs {u.shape}"
    if np.issubdtype(t.dtype, np.integer) and np.issubdtype(
            u.dtype, np.integer):
        np.testing.assert_array_equal(t, u, err_msg=err_msg)
        return
    dt = np.result_type(t.dtype, u.dtype)
    eps = np.finfo(dt).eps
    if abs_floor is None:
        abs_floor = factor * eps
    bound = factor * eps * (np.abs(t) + np.abs(u)) + abs_floor
    err = np.abs(t - u)
    bad = err > bound
    assert not bad.any(), (
        f"{err_msg} max err {err.max()} at {np.argwhere(bad)[:5]}, "
        f"bound {bound[bad].min()}")
