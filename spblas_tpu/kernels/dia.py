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


def dia_fill_fraction(a: CSR) -> float:
    """Fraction of DIA storage that would hold true nonzeros — the plan
    chooser's banded-ness test."""
    m, n = a.shape
    nnz = int(a.nnz)
    if nnz == 0:
        return 0.0
    colind = np.asarray(a.colind)[:nnz]
    rows = np.asarray(a.row_ids())[:nnz]
    offs = np.unique(colind.astype(np.int64) - rows)
    return nnz / float(len(offs) * m)


def build_dia_plan(a: CSR) -> DiaPlan:
    m, n = a.shape
    nnz = int(a.nnz)
    colind = np.asarray(a.colind)[:nnz]
    rows = np.asarray(a.row_ids())[:nnz]
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
    """y[i] = sum_k diags[k, i] * x[i + offsets[k]] — shift-mul-accumulate.

    Offsets are static, so each term is a statically-sliced multiply that
    XLA fuses into a single vectorized pass (no gather, no scatter).
    """
    m, n = plan.shape
    y = jnp.zeros((m,), dtype=jnp.result_type(plan.diags.dtype, x.dtype))
    for k, off in enumerate(plan.offsets):
        d = plan.diags[k]
        if off >= 0:
            span = min(m, n - off)
            if span <= 0:
                continue
            y = y.at[:span].add(d[:span] * x[off:off + span])
        else:
            span = min(m + off, n)
            if span <= 0:
                continue
            y = y.at[-off:-off + span].add(d[-off:-off + span] * x[:span])
    return y


@jax.jit
def dia_spmm(plan: DiaPlan, b: jax.Array) -> jax.Array:
    m, n = plan.shape
    c = jnp.zeros((m, b.shape[1]),
                  dtype=jnp.result_type(plan.diags.dtype, b.dtype))
    for k, off in enumerate(plan.offsets):
        d = plan.diags[k][:, None]
        if off >= 0:
            span = min(m, n - off)
            if span <= 0:
                continue
            c = c.at[:span].add(d[:span] * b[off:off + span])
        else:
            span = min(m + off, n)
            if span <= 0:
                continue
            c = c.at[-off:-off + span].add(d[-off:-off + span] * b[:span])
    return c
