"""DCSR container — doubly-compressed sparse row (hypersparse).

The reference ships DCSR only as a test fixture (generate_dcsr,
include/spblas/backend/generate.hpp:140-168); here it is a first-class
container because hypersparse row distributions (most rows empty) occur
naturally in distributed SpGEMM outputs.  Only non-empty rows are stored:
``rowind`` lists them, ``rowptr`` compresses offsets over that list.

Ops consume DCSR by expansion to per-entry row ids (the same canonical
padding contract as CSR), so every CSR kernel works unchanged after
``to_csr`` or via ``row_ids()``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spblas_tpu import types as _t


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DCSR:
    """values (cap,); colind (cap,); rowind (rcap,) non-empty row ids;
    rowptr (rcap + 1,) offsets into values per stored row; nrows () —
    live count of stored rows; nnz ()."""

    values: jax.Array
    colind: jax.Array
    rowind: jax.Array
    rowptr: jax.Array
    nrows: jax.Array
    nnz: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return int(self.values.shape[0])

    @property
    def row_capacity(self) -> int:
        return int(self.rowind.shape[0])

    @property
    def dtype(self):
        return self.values.dtype

    @classmethod
    def from_csr(cls, a, row_capacity=None) -> "DCSR":
        from spblas_tpu.formats.csr import CSR
        assert isinstance(a, CSR)
        m, n = a.shape
        rowptr = np.asarray(a.rowptr).astype(np.int64)
        nnz = int(a.nnz)
        lo = np.minimum(rowptr[:-1], nnz)
        hi = np.minimum(rowptr[1:], nnz)
        nonempty = np.nonzero(hi > lo)[0]
        r = len(nonempty)
        rcap = row_capacity or max(_t.quantize_capacity(max(r, 1)), 1)
        rowind = np.zeros(rcap, dtype=np.int64)
        rowind[:r] = nonempty
        # CSR entries are row-major, so the stored rows' entry runs are
        # contiguous and the compressed rowptr is their length cumsum
        c_rowptr = np.zeros(rcap + 1, dtype=np.int64)
        c_rowptr[1: r + 1] = np.cumsum(hi[nonempty] - lo[nonempty])
        c_rowptr[r + 1:] = c_rowptr[r]
        return cls(values=a.values, colind=a.colind,
                   rowind=jnp.asarray(rowind, dtype=_t.index_dtype),
                   rowptr=jnp.asarray(c_rowptr, dtype=_t.offset_dtype),
                   nrows=jnp.asarray(r, dtype=jnp.int32),
                   nnz=a.nnz, shape=(m, n))

    def row_ids(self) -> jax.Array:
        """Per-entry *global* row id (sentinel m for padding) — the bridge
        to every CSR-style kernel."""
        e = jnp.arange(self.capacity, dtype=self.rowptr.dtype)
        stored = jnp.searchsorted(self.rowptr[1:], e, side="right")
        stored = jnp.minimum(stored, self.row_capacity - 1)
        live = e < self.nnz
        return jnp.where(live, self.rowind[stored],
                         self.shape[0]).astype(_t.index_dtype)

    def to_csr(self):
        from spblas_tpu.formats.csr import CSR
        m, n = self.shape
        rows = self.row_ids()
        counts = jnp.zeros((m,), dtype=_t.offset_dtype).at[rows].add(
            1, mode="drop")
        rowptr = jnp.concatenate(
            [jnp.zeros((1,), _t.offset_dtype),
             jnp.cumsum(counts).astype(_t.offset_dtype)])
        return CSR(values=self.values, rowptr=rowptr, colind=self.colind,
                   nnz=self.nnz, shape=self.shape)

    def todense(self) -> jax.Array:
        m, n = self.shape
        return jnp.zeros((m, n), dtype=self.dtype).at[
            self.row_ids(), self.colind].add(self.values, mode="drop")

    def __repr__(self):
        return (f"DCSR(shape={self.shape}, capacity={self.capacity}, "
                f"row_capacity={self.row_capacity}, dtype={self.dtype})")
