"""SpTRSV: solve op(A) x = b for triangular sparse A.

Re-design of the reference row-sweep substitution
(include/spblas/algorithms/triangular_solve_impl.hpp:44-93) whose rows are
strictly sequential.  The reference delegates parallelization to vendors
(``optimize_trsv`` hooks, vendor/onemkl_sycl/triangular_solve_impl.hpp:69-70);
here the **inspect phase performs level-set analysis of the dependency DAG**
— rows whose dependencies all live in earlier levels solve together — and
the execute phase is a jitted ``fori_loop`` over levels, each level a fully
vector-parallel batched row solve (SURVEY.md §7 step 6).

Triangle/diagonal semantics mirror detail/triangular_types.hpp:5-23:
``uplo`` in {"lower", "upper"}; ``diag`` in {"explicit", "unit"} (implicit
unit diagonal — diagonal entries are not read).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spblas_tpu import types as _t
from spblas_tpu import views as _v
from spblas_tpu.formats.convert import to_csr
from spblas_tpu.info import OperationInfo
from spblas_tpu.utils.logging import traced


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrsvPlan:
    """Level schedule: padded (levels, rows-per-level, entries-per-row)
    gather maps into A.values — serializable, reusable across numeric
    re-runs with unchanged sparsity (SURVEY.md §5.4)."""

    rows: jax.Array        # (L, R) int32, sentinel m for padding
    entry_idx: jax.Array   # (L, R, W) int32 into values (clamped)
    entry_valid: jax.Array  # (L, R, W) bool
    cols: jax.Array        # (L, R, W) int32 (clamped to [0, m))
    diag_idx: jax.Array    # (L, R) int32 into values; -1 → implicit unit
    uplo: str = dataclasses.field(metadata=dict(static=True))
    unit_diag: bool = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_levels(self) -> int:
        return int(self.rows.shape[0])


@traced
def triangular_solve_inspect(a_view, uplo: str = "lower",
                             diag: str = "explicit") -> OperationInfo:
    """Level-set analysis (host-side) — the work vendors hide inside
    ``optimize_trsv``.  Returns an info whose plan drives the solve."""
    a = to_csr(_v.get_ultimate_base(a_view))
    m, n = a.shape
    if m != n:
        raise ValueError(f"triangular_solve requires square A, got {a.shape}")
    lower = _check_uplo(uplo)
    unit = _check_diag(diag)
    rowptr = np.asarray(a.rowptr).astype(np.int64)
    colind = np.asarray(a.colind)
    nnz = int(a.nnz)

    # level-set analysis in the native inspector runtime (C++ via ctypes,
    # numpy fallback) — the work vendors bury in optimize_trsv
    from spblas_tpu import native
    levels, diag_pos, num_levels = native.level_schedule(
        m, nnz, rowptr, colind, lower, unit)

    # vectorized padded-schedule assembly from (levels, diag_pos)
    lo = np.minimum(rowptr[:-1], nnz)
    hi = np.minimum(rowptr[1:], nnz)
    row_of = np.repeat(np.arange(m), hi - lo)          # per live entry
    eidx_all = np.concatenate(
        [np.arange(a, b) for a, b in zip(lo, hi)]) if m else \
        np.zeros(0, np.int64)
    cols_all = colind[eidx_all] if nnz else np.zeros(0, colind.dtype)
    off = (cols_all < row_of) if lower else (cols_all > row_of)
    # rank of each off-diag entry within its row
    c = np.cumsum(off)
    base = np.concatenate([[0], c])[
        np.concatenate([[0], np.cumsum(hi - lo)])[:-1]]
    rank = (c - 1) - np.repeat(base, hi - lo)
    off_counts = np.zeros(m, np.int64)
    np.add.at(off_counts, row_of[off], 1)
    w_pad = max(int(off_counts.max()) if m else 0, 1)
    # position of each row within its level
    counts = np.bincount(levels, minlength=max(num_levels, 1)) if m else \
        np.zeros(1, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    order = np.argsort(levels, kind="stable")
    j_of = np.empty(m, np.int64)
    j_of[order] = np.arange(m) - np.repeat(starts, counts)
    r_pad = max(int(counts.max()) if m else 0, 1)
    num_levels = max(num_levels, 1)

    rows_arr = np.full((num_levels, r_pad), m, dtype=np.int32)
    eidx_arr = np.zeros((num_levels, r_pad, w_pad), dtype=np.int32)
    evalid_arr = np.zeros((num_levels, r_pad, w_pad), dtype=bool)
    cols_arr = np.zeros((num_levels, r_pad, w_pad), dtype=np.int32)
    dpos_arr = np.full((num_levels, r_pad), -1, dtype=np.int32)
    if m:
        rows_arr[levels, j_of] = np.arange(m, dtype=np.int32)
        dpos_arr[levels, j_of] = diag_pos.astype(np.int32)
        lv_e = levels[row_of[off]]
        j_e = j_of[row_of[off]]
        r_e = rank[off]
        eidx_arr[lv_e, j_e, r_e] = eidx_all[off].astype(np.int32)
        evalid_arr[lv_e, j_e, r_e] = True
        cols_arr[lv_e, j_e, r_e] = cols_all[off].astype(np.int32)

    plan = TrsvPlan(rows=jnp.asarray(rows_arr),
                    entry_idx=jnp.asarray(eidx_arr),
                    entry_valid=jnp.asarray(evalid_arr),
                    cols=jnp.asarray(cols_arr),
                    diag_idx=jnp.asarray(dpos_arr),
                    uplo="lower" if lower else "upper",
                    unit_diag=unit, m=m)
    return OperationInfo(result_shape=(m, 1), result_nnz=m, plan=plan)


@jax.jit
def _trsv_execute(plan: TrsvPlan, values, b, alpha):
    """Jitted level sweep: each level solves all its rows in parallel."""
    m = plan.m

    def body(lv, x):
        rows = plan.rows[lv]                       # (R,)
        eidx = plan.entry_idx[lv]                  # (R, W)
        ev = plan.entry_valid[lv]
        cols = plan.cols[lv]
        av = jnp.where(ev, values[eidx] * alpha, 0)
        dot = jnp.sum(av * x[cols], axis=-1)       # (R,)
        dpos = plan.diag_idx[lv]
        # implicit unit diagonal of alpha*A is alpha itself
        diag = jnp.where(dpos >= 0, values[jnp.maximum(dpos, 0)], 1) * alpha
        xi = (b[jnp.minimum(rows, m - 1)] - dot) / diag
        return x.at[rows].set(xi, mode="drop")

    x0 = jnp.zeros((m,), dtype=jnp.result_type(values.dtype, b.dtype,
                                               alpha.dtype))
    return jax.lax.fori_loop(0, plan.num_levels, body, x0)


@traced
def triangular_solve(a_view, b, uplo: str = "lower",
                     diag: str = "explicit",
                     info: Optional[OperationInfo] = None) -> jax.Array:
    """x = op(A)^{-1} b.  Pass ``info`` from
    :func:`triangular_solve_inspect` to amortize the level analysis
    (the inspector-executor split the reference reserves for vendors)."""
    base, alpha, conj = _v.fold(a_view)
    a = to_csr(base)
    if info is None:
        info = triangular_solve_inspect(a, uplo=uplo, diag=diag)
    plan: TrsvPlan = info.plan
    b = jnp.asarray(b)
    if b.shape[0] != plan.m:
        raise ValueError(
            f"triangular_solve: b length {b.shape[0]} != m {plan.m}")
    values = jnp.conj(a.values) if conj else a.values
    return _trsv_execute(plan, values, b, alpha)


def _check_uplo(uplo: str) -> bool:
    if uplo not in ("lower", "upper"):
        raise ValueError(f"uplo must be 'lower' or 'upper', got {uplo!r}")
    return uplo == "lower"


def _check_diag(diag: str) -> bool:
    if diag not in ("explicit", "unit"):
        raise ValueError(f"diag must be 'explicit' or 'unit', got {diag!r}")
    return diag == "unit"
