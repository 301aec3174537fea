"""DIA (diagonal) plan: gather-free SpMV for banded matrices.

No reference counterpart — the reference delegates structure exploitation
to vendor handles; on TPU the banded case (BASELINE.json configs[0]:
10k x 10k banded) deserves its own plan because storing diagonals densely
removes ALL index traffic: y += diag_d * shift(x, d) is pure streaming at
4 bytes/nnz of matrix traffic versus CSR's ~12, i.e. the DIA plan can beat
the CSR HBM roofline by ~3x.

Plan construction (inspect) detects the populated diagonals on host;
execution is a jitted shift-multiply-accumulate scan over diagonals that
XLA fuses into one pass over x/y.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spblas_tpu.formats.csr import CSR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiaPlan:
    """Diagonals stored dense: diags[k, i] = A[i, i + offsets[k]]."""

    diags: jax.Array      # (ndiag, m)
    offsets: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))  # static → shifts unroll at trace time
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def ndiag(self) -> int:
        return int(self.diags.shape[0])


def _host_row_ids(a: CSR, nnz: int) -> np.ndarray:
    from spblas_tpu.formats.csr import host_row_ids
    return host_row_ids(a.rowptr, nnz, a.shape[0])


def dia_fill_fraction(a: CSR) -> float:
    """Fraction of DIA storage that would hold true nonzeros — the plan
    chooser's banded-ness test."""
    m, n = a.shape
    nnz = int(a.nnz)
    if nnz == 0:
        return 0.0
    colind = np.asarray(a.colind)[:nnz]
    rows = _host_row_ids(a, nnz)
    offs = np.unique(colind.astype(np.int64) - rows)
    return nnz / float(len(offs) * m)


def build_dia_plan(a: CSR) -> DiaPlan:
    m, n = a.shape
    nnz = int(a.nnz)
    colind = np.asarray(a.colind)[:nnz]
    rows = _host_row_ids(a, nnz)
    values = np.asarray(a.values)[:nnz]
    offs_arr = colind.astype(np.int64) - rows
    offsets = np.unique(offs_arr)
    diags = np.zeros((len(offsets), m), dtype=values.dtype)
    pos = np.searchsorted(offsets, offs_arr)
    diags[pos, rows] = values
    return DiaPlan(diags=jnp.asarray(diags),
                   offsets=tuple(int(o) for o in offsets), shape=(m, n))


@jax.jit
def dia_spmv(plan: DiaPlan, x: jax.Array) -> jax.Array:
    """y[i] = sum_k diags[k, i] * x[i + offsets[k]].

    x is zero-padded once so every diagonal's term is a full-length
    static slice multiply — a pure shift-mul-accumulate chain that XLA
    fuses into a single vectorized pass (no gather, no scatter, no
    variable-span update slices).  diags[k, i] is 0 wherever i + off
    falls outside the matrix, so padding contributes nothing.
    """
    m, n = plan.shape
    pad_lo = max(-min(plan.offsets, default=0), 0)
    pad_hi = max(max(plan.offsets, default=0) + m - n, 0)
    xp = jnp.pad(x, (pad_lo, pad_hi))
    y = jnp.zeros((m,), dtype=jnp.result_type(plan.diags.dtype, x.dtype))
    for k, off in enumerate(plan.offsets):
        y = y + plan.diags[k] * jax.lax.slice(
            xp, (pad_lo + off,), (pad_lo + off + m,))
    return y


@jax.jit
def dia_spmm(plan: DiaPlan, b: jax.Array) -> jax.Array:
    m, n = plan.shape
    pad_lo = max(-min(plan.offsets, default=0), 0)
    pad_hi = max(max(plan.offsets, default=0) + m - n, 0)
    bp = jnp.pad(b, ((pad_lo, pad_hi), (0, 0)))
    kdim = b.shape[1]
    c = jnp.zeros((m, kdim),
                  dtype=jnp.result_type(plan.diags.dtype, b.dtype))
    for k, off in enumerate(plan.offsets):
        c = c + plan.diags[k][:, None] * jax.lax.slice(
            bp, (pad_lo + off, 0), (pad_lo + off + m, kdim))
    return c
