"""COO container — coordinate-format triples, sorted row-major.

The reference only generates COO as a staging format
(include/spblas/backend/generate.hpp:49-89); here it is a first-class
container because row-major-sorted COO is the natural intermediate for the
sort-based SpGEMM/SpADD/transpose engines (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spblas_tpu import types as _t
from spblas_tpu.formats.csr import CSR, _pad_to
from spblas_tpu.formats.csc import CSC


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class COO:
    """Coordinate matrix with padded static capacity.

    Invariant: live entries are sorted by row (columns within a row may
    be in any order — CSR rows are not required to be column-sorted,
    matching the reference's unsorted-rows contract); padded entries have
    values == 0 and rowind == colind == 0 — a padded (0, 0) entry with
    value 0 is numerically harmless everywhere.
    """

    values: jax.Array
    rowind: jax.Array
    colind: jax.Array
    nnz: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_arrays(cls, values, rowind, colind, shape, nnz=None,
                    capacity=None) -> "COO":
        _t.check_values_dtype(values, "COO.from_arrays")
        values = jnp.asarray(values)
        rowind = jnp.asarray(rowind, dtype=_t.index_dtype)
        colind = jnp.asarray(colind, dtype=_t.index_dtype)
        if nnz is None:
            nnz = int(values.shape[0])
        nnz_i = int(nnz)
        if capacity is None:
            capacity = max(_t.quantize_capacity(nnz_i), int(values.shape[0]))
        capacity = int(capacity)
        if int(values.shape[0]) > nnz_i:
            # caller-supplied oversized buffers (the reference's
            # user-allocates-bigger handshake) may carry stale tail
            # entries; COO numerics have no mask, so enforce the
            # canonical zero padding here (round-4 review)
            live = jnp.arange(int(values.shape[0]),
                              dtype=jnp.int32) < nnz_i
            values = jnp.where(live, values, 0)
            rowind = jnp.where(live, rowind, 0)
            colind = jnp.where(live, colind, 0)
        return cls(values=_pad_to(values, capacity),
                   rowind=_pad_to(rowind, capacity),
                   colind=_pad_to(colind, capacity),
                   nnz=jnp.asarray(nnz_i, dtype=jnp.int32),
                   shape=(int(shape[0]), int(shape[1])))

    @property
    def capacity(self) -> int:
        return int(self.values.shape[0])

    @property
    def dtype(self):
        return self.values.dtype

    def entry_mask(self) -> jax.Array:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.nnz

    def todense(self) -> jax.Array:
        m, n = self.shape
        out = jnp.zeros((m, n), dtype=self.dtype)
        mask = self.entry_mask()
        vals = jnp.where(mask, self.values, 0)
        rows = jnp.where(mask, self.rowind, m)  # dropped when padded
        return out.at[rows, self.colind].add(vals, mode="drop")

    def to_csr(self) -> CSR:
        """Row-major-sorted COO → CSR (same entry order, build rowptr)."""
        m, _ = self.shape
        mask = self.entry_mask()
        rows = jnp.where(mask, self.rowind, m)
        counts = jnp.zeros((m,), dtype=_t.offset_dtype).at[rows].add(
            1, mode="drop")
        rowptr = jnp.concatenate(
            [jnp.zeros((1,), dtype=_t.offset_dtype),
             jnp.cumsum(counts).astype(_t.offset_dtype)])
        return CSR(values=self.values, rowptr=rowptr, colind=self.colind,
                   nnz=self.nnz, shape=self.shape)

    def validate(self) -> None:
        m, n = self.shape
        nnz = int(self.nnz)
        rowind = np.asarray(self.rowind)[:nnz]
        colind = np.asarray(self.colind)[:nnz]
        if nnz:
            if rowind.min() < 0 or rowind.max() >= m:
                raise ValueError("rowind out of range")
            if colind.min() < 0 or colind.max() >= n:
                raise ValueError("colind out of range")
            if np.any(np.diff(rowind) < 0):
                raise ValueError("COO entries not grouped by row")
        # canonical padding: COO numeric paths have no entry mask, so
        # a stale padded entry silently contributes (round-4 review)
        if np.asarray(self.values)[nnz:].any():
            raise ValueError("COO padding carries nonzero values")
        if (np.asarray(self.rowind)[nnz:].any()
                or np.asarray(self.colind)[nnz:].any()):
            raise ValueError("COO padding carries nonzero indices")

    def __repr__(self):
        return (f"COO(shape={self.shape}, capacity={self.capacity}, "
                f"dtype={self.dtype})")


def csr_to_coo(a: CSR) -> COO:
    # canonical padding: padded rowind must be 0 (class invariant), not
    # CSR.row_ids()'s sentinel m
    rows = jnp.where(a.entry_mask(), a.row_ids(), 0)
    return COO(values=a.values,
               rowind=rows.astype(a.row_ids().dtype),
               colind=a.colind, nnz=a.nnz, shape=a.shape)


def csc_to_coo(a: CSC) -> COO:
    """CSC → COO with the class invariants intact (row-major live
    entries, canonical zero padding).  The old direct reinterpretation
    returned column-major entries with sentinel padding — both
    invariant violations (round-4 review); delegate to the conversion
    layer's re-sort instead."""
    from spblas_tpu.formats.convert import to_coo
    return to_coo(a)
