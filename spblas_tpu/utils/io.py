"""Matrix IO: Matrix Market / SuiteSparse loading.

The reference has no IO layer (its fixtures are seeded generators); the
benchmark targets (BASELINE.json: SuiteSparse matrices) need one.  The
parse runs in the native host runtime (spblas_tpu.native.mm_read, C++),
with duplicate coalescing via the COO container's canonical build.
"""

from __future__ import annotations

import numpy as np

from spblas_tpu import native
from spblas_tpu.formats.csr import CSR
from spblas_tpu.formats.coo import COO


def load_matrix_market(path: str, dtype=np.float32) -> CSR:
    """Read a Matrix Market coordinate file into a CSR.

    Symmetric/skew storage is expanded, duplicates are summed (the
    Matrix Market convention), rows arrive sorted by (row, col).
    ``.mtx.gz`` files are decompressed transparently (the checked-in
    benchmark matrices under data/ ship gzipped).
    """
    if path.endswith(".gz"):
        import gzip
        import os
        import shutil
        import tempfile
        fd, tmp = tempfile.mkstemp(suffix=".mtx")
        try:
            with gzip.open(path, "rb") as src, os.fdopen(fd, "wb") as dst:
                shutil.copyfileobj(src, dst)
            return load_matrix_market(tmp, dtype=dtype)
        finally:
            os.unlink(tmp)
    try:
        rows, cols, vals, (m, n) = native.mm_read(path)
    except ValueError as e:
        if "complex" not in str(e):
            raise
        # complex files: the native reader is real-only; the python
        # fallback parses the (re, im) value columns (round-4 review —
        # the framework's containers support complex64)
        rows, cols, vals, (m, n) = native._mm_read_py(path, complex_ok=True)
        if not np.issubdtype(np.dtype(dtype), np.complexfloating):
            dtype = np.complex64
    if np.iscomplexobj(vals):
        # coo_to_csr permutes f64 values natively; carry complex via a
        # two-plane pass through the same sort order
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        rowptr = np.zeros(m + 1, np.int64)
        np.add.at(rowptr[1:], rows, 1)
        rowptr = np.cumsum(rowptr)
        acc_dtype = np.complex128
    else:
        rows, cols, vals, rowptr = native.coo_to_csr(m, rows, cols, vals)
        acc_dtype = np.float64
    # coalesce duplicates (summing) on the sorted stream
    if len(rows):
        key_head = np.concatenate(
            [[True], (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])])
        group = np.cumsum(key_head) - 1
        out_vals = np.zeros(group[-1] + 1, dtype=acc_dtype)
        np.add.at(out_vals, group, vals)
        u_rows = rows[key_head]
        u_cols = cols[key_head]
        rowptr = np.zeros(m + 1, dtype=np.int64)
        np.add.at(rowptr[1:], u_rows, 1)
        rowptr = np.cumsum(rowptr)
    else:
        out_vals = vals
        u_cols = cols
    return CSR.from_arrays(out_vals.astype(dtype), rowptr, u_cols, (m, n),
                           nnz=len(out_vals))


def save_matrix_market(path: str, a) -> None:
    """Write a CSR/COO to Matrix Market coordinate general format
    (``complex general`` for complex-valued containers — the old
    writer crashed formatting complex scalars, round-4 review)."""
    from spblas_tpu.formats.convert import to_coo
    coo = to_coo(a)
    nnz = int(coo.nnz)
    rows = np.asarray(coo.rowind)[:nnz]
    cols = np.asarray(coo.colind)[:nnz]
    vals = np.asarray(coo.values)[:nnz]
    m, n = coo.shape
    is_cx = np.iscomplexobj(vals)
    field = "complex" if is_cx else "real"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        f.write(f"{m} {n} {nnz}\n")
        if is_cx:
            for i, j, v in zip(rows, cols, vals):
                f.write(f"{i + 1} {j + 1} "
                        f"{v.real:.17g} {v.imag:.17g}\n")
        else:
            for i, j, v in zip(rows, cols, vals):
                f.write(f"{i + 1} {j + 1} {v:.17g}\n")
