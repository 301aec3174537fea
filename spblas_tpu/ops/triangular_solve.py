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
    """Level schedule in *ragged* form: one flat off-diagonal entry
    stream sorted by (level, row) plus per-level offsets, and one flat
    row stream sorted by level.

    Memory is O(nnz + m + L) — a single dense row or one fat level only
    widens the per-level *slice caps* (``e_cap`` additive in entries,
    ``r_cap`` in rows), never a (levels x rows x width) product (the
    round-1 plan inflated multiplicatively; VERDICT.md round 1 weak #3).
    Serializable and reusable across numeric re-runs (SURVEY.md §5.4).
    """

    ent_idx: jax.Array     # (E_pad,) int32 into values
    ent_col: jax.Array     # (E_pad,) int32
    ent_slot: jax.Array    # (E_pad,) int32 row slot within its level
    lv_estart: jax.Array   # (L+1,) int32 entry-stream offsets
    row_ids: jax.Array     # (m_pad,) int32 rows sorted by level
    diag_idx: jax.Array    # (m_pad,) int32 aligned with row_ids; -1 unit
    lv_rstart: jax.Array   # (L+1,) int32 row-stream offsets
    e_cap: int = dataclasses.field(metadata=dict(static=True))
    r_cap: int = dataclasses.field(metadata=dict(static=True))
    uplo: str = dataclasses.field(metadata=dict(static=True))
    unit_diag: bool = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    # one-dispatch ROUTE2 substitution (kernels/route2.py
    # build_route2_solve_plan): values are BAKED as -a_ij/d_i.  When the
    # solve's values array IS the one inspected (route_vals_ref
    # identity) the baked tiles run as-is; otherwise the executor
    # re-bakes the coefficient tiles on device from the new values
    # (route.update_solve_values via route_dpe — the rocSPARSE
    # numeric-reuse contract) and only grad/vmap tracers drop to the
    # differentiable ragged sweep
    route: object = None
    route_diag: object = None      # (m,) int32 diag entry idx, or None
    route_vals_ref: object = None  # the values array the bake saw
    route_dpe: object = None       # (capacity,) int32 entry->diag idx
    # pane-blocked substitution for m past the one-dispatch VMEM
    # envelope (round 5, VERDICT r4 #8): a BlockTrsv of per-block
    # one-dispatch solves + off-diagonal strip SpMV plans
    blocked: object = None

    @property
    def num_levels(self) -> int:
        return int(self.lv_estart.shape[0]) - 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockTrsv:
    """Pane-blocked forward/backward substitution (round 5).

    Rows split into K contiguous blocks of ``bm``; block k solves
    x_k = (alpha*L_kk)^{-1} (b_k - alpha*S_k @ x_known) where L_kk is
    the diagonal block (its own one-dispatch ROUTE2 solve plan — each
    block fits the two-resident-pane VMEM envelope the whole matrix
    exceeded) and S_k the off-diagonal strip, applied through the
    matvec plan chooser (ROUTE/paned — the x side streams, so the
    strip is size-unbounded).  Lifts the m/128 <= 9000 cap the way
    vendor TRSV is size-unbounded
    (include/spblas/vendor/onemkl_sycl/triangular_solve_impl.hpp:37-160).
    """

    subs: tuple            # per block: TrsvPlan (diag block)
    sub_vals: tuple        # per block: (sub_nnz,) f32 values at inspect
    sub_eidx: tuple        # per block: (sub_nnz,) int32 global entry idx
    strip_plans: tuple     # per block: matvec plan or () when empty
    strip_eidx: tuple      # per block: (strip_nnz,) int32 or ()
    strip_kinds: tuple = dataclasses.field(metadata=dict(static=True))
    bm: int = dataclasses.field(default=0, metadata=dict(static=True))
    lower: bool = dataclasses.field(default=True,
                                    metadata=dict(static=True))


@traced
def triangular_solve_inspect(a_view, uplo: str = "lower",
                             diag: str = "explicit",
                             host_arrays=None) -> OperationInfo:
    """Level-set analysis (host-side) — the work vendors hide inside
    ``optimize_trsv``.  Returns an info whose plan drives the solve.

    ``host_arrays`` (optional): ``(rowptr, colind[, values])`` numpy
    copies of the container's arrays — large inspections through a
    tunneled runtime otherwise pay a multi-100-MB device->host pull
    (PERF_NOTES platform rules); callers that built the matrix from
    host arrays pass them through.
    """
    import time as _time
    from spblas_tpu.utils.profiling import record_phase
    a = to_csr(_v.get_ultimate_base(a_view))
    m, n = a.shape
    if m != n:
        raise ValueError(f"triangular_solve requires square A, got {a.shape}")
    lower = _check_uplo(uplo)
    unit = _check_diag(diag)
    _t0 = _time.perf_counter()
    values_h = None
    if host_arrays is not None:
        rowptr = np.asarray(host_arrays[0]).astype(np.int64)
        colind = np.asarray(host_arrays[1])
        if len(host_arrays) > 2:
            values_h = np.asarray(host_arrays[2])
    else:
        rowptr = np.asarray(a.rowptr).astype(np.int64)
        colind = np.asarray(a.colind)
    nnz = int(a.nnz)
    record_phase("trsv_inspect", "pull_s", _time.perf_counter() - _t0)

    # level-set analysis in the native inspector runtime (C++ via ctypes,
    # numpy fallback) — the work vendors bury in optimize_trsv
    _t0 = _time.perf_counter()
    from spblas_tpu import native
    levels, diag_pos, num_levels = native.level_schedule(
        m, nnz, rowptr, colind, lower, unit)
    record_phase("trsv_inspect", "schedule_s", _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()

    # ragged schedule assembly from (levels, diag_pos)
    lo = np.minimum(rowptr[:-1], nnz)
    hi = np.minimum(rowptr[1:], nnz)
    row_of = np.repeat(np.arange(m), hi - lo)          # per live entry
    eidx_all = np.arange(nnz, dtype=np.int64)
    cols_all = colind[:nnz].astype(np.int64) if nnz else \
        np.zeros(0, np.int64)
    off = (cols_all < row_of) if nnz else np.zeros(0, bool)
    if not lower:
        off = (cols_all > row_of) if nnz else off
    num_levels = max(num_levels, 1)

    # rows sorted by level
    counts = np.bincount(levels, minlength=num_levels) if m else \
        np.zeros(num_levels, np.int64)
    lv_rstart = np.concatenate([[0], np.cumsum(counts)])
    order = np.argsort(levels, kind="stable") if m else \
        np.zeros(0, np.int64)
    j_of = np.empty(max(m, 1), np.int64)
    j_of[order] = np.arange(m) - np.repeat(lv_rstart[:-1], counts)
    r_cap = max(int(counts.max()) if m else 0, 1)

    # off-diag entries sorted by (level, row)
    e_rows = row_of[off]
    e_lv = levels[e_rows] if m else np.zeros(0, np.int64)
    e_order = np.lexsort((e_rows, e_lv)) if len(e_rows) else \
        np.zeros(0, np.int64)
    e_counts = np.bincount(e_lv, minlength=num_levels) if len(e_rows) \
        else np.zeros(num_levels, np.int64)
    lv_estart = np.concatenate([[0], np.cumsum(e_counts)])
    e_cap = max(int(e_counts.max()), 1)

    ent_idx = eidx_all[off][e_order]
    ent_col = cols_all[off][e_order]
    ent_slot = j_of[e_rows][e_order]
    # pad tails so every dynamic slice of size e_cap / r_cap is in-bounds
    epad = np.zeros(e_cap, np.int64)
    ent_idx = np.concatenate([ent_idx, epad])
    ent_col = np.concatenate([ent_col, epad])
    ent_slot = np.concatenate([ent_slot, epad])
    row_ids = np.concatenate([np.arange(m, dtype=np.int64)[order],
                              np.full(r_cap, m, np.int64)])
    dpos = np.concatenate([diag_pos.astype(np.int64)[order] if m else
                           np.zeros(0, np.int64),
                           np.full(r_cap, -1, np.int64)])

    record_phase("trsv_inspect", "ragged_pack_s",
                 _time.perf_counter() - _t0)

    route = route_diag = vals_ref = None
    blocked = None
    if _route_solve_eligible(a, m, nnz, num_levels):
        _t0 = _time.perf_counter()
        from spblas_tpu.kernels.route2 import build_route2_solve_plan
        if values_h is None:
            values_h = np.asarray(a.values)
        route = build_route2_solve_plan(
            rowptr, colind, values_h, (m, m), nnz, levels,
            diag_pos, unit, lower)
        vals_ref = a.values
        record_phase("trsv_inspect", "route_pack_s",
                     _time.perf_counter() - _t0)
    elif _block_solve_eligible(a, m, nnz):
        _t0 = _time.perf_counter()
        if values_h is None:
            values_h = np.asarray(a.values)
        blocked = _build_block_solve(rowptr, colind, values_h, m, nnz,
                                     lower, unit, uplo, diag)
        vals_ref = a.values
        record_phase("trsv_inspect", "block_pack_s",
                     _time.perf_counter() - _t0)

    # ONE batched placement for every schedule array (separate
    # jnp.asarray calls each pay a dispatch round-trip — the round-2
    # inspection-latency cliff, VERDICT r2 next-1)
    # entry->diagonal-entry map for on-device coefficient re-baking
    # (values-refresh, VERDICT r2 next-6); padded entries map to 0
    dpe = np.zeros(int(a.capacity), np.int64)
    if route is not None and not unit and nnz:
        dpe[:nnz] = diag_pos.astype(np.int64)[row_of]

    _t0 = _time.perf_counter()
    from spblas_tpu.utils.placement import device_put_batch
    (ent_idx_d, ent_col_d, ent_slot_d, lv_estart_d, row_ids_d, dpos_d,
     lv_rstart_d, diag_pos_d, dpe_d) = device_put_batch(
        ent_idx.astype(np.int32), ent_col.astype(np.int32),
        ent_slot.astype(np.int32), lv_estart.astype(np.int32),
        row_ids.astype(np.int32), dpos.astype(np.int32),
        lv_rstart.astype(np.int32), diag_pos.astype(np.int32),
        dpe.astype(np.int32))
    # stream-ordered by default: the batched device_put is issued and
    # the first solve dispatch blocks on it inside XLA, so inspect
    # returns while the plan drains through the link.
    # SPBLAS_SYNC_UPLOAD=1 restores blocking for transfer accounting.
    import os
    if os.environ.get("SPBLAS_SYNC_UPLOAD") == "1":
        jax.block_until_ready(ent_idx_d)
        if route is not None:
            jax.block_until_ready(route.tile)
    record_phase("trsv_inspect", "upload_s", _time.perf_counter() - _t0)
    route_dpe = None
    if route is not None and not unit:
        route_diag = diag_pos_d
        route_dpe = dpe_d

    plan = TrsvPlan(
        ent_idx=ent_idx_d,
        ent_col=ent_col_d,
        ent_slot=ent_slot_d,
        lv_estart=lv_estart_d,
        row_ids=row_ids_d,
        diag_idx=dpos_d,
        lv_rstart=lv_rstart_d,
        e_cap=int(e_cap), r_cap=int(r_cap),
        uplo="lower" if lower else "upper",
        unit_diag=unit, m=m,
        route=route, route_diag=route_diag, route_vals_ref=vals_ref,
        route_dpe=route_dpe, blocked=blocked)
    return OperationInfo(result_shape=(m, 1), result_nnz=m, plan=plan)


def _route_solve_eligible(a, m, nnz, num_levels) -> bool:
    # one-dispatch substitution envelope: TPU (or forced), real f32
    # values, pane VMEM-resident.  Round 4 lifted the old 4096-level
    # gate: non-hub levels batch into one native pack call (level-
    # augmented cell keys) and the executor chains dispatches past the
    # SMEM chunk budget.  The residual level cap bounds plan memory
    # (>= 1 chunk/level at 8 KB each).
    import os
    from spblas_tpu.types import on_tpu
    if os.environ.get("SPBLAS_NO_ROUTE_TRSV") == "1":
        return False
    if not (on_tpu() or os.environ.get("SPBLAS_FORCE_ROUTE_TRSV")):
        return False
    if a.dtype != jnp.float32:
        return False
    # TWO panes of m//128 rows stay VMEM-resident (the y0 input pane
    # and the output pane, route2_solve), so the row budget is half the
    # single-pane ~18k cap; the nnz/level caps bound host pack time and
    # plan bytes (the plan streams from HBM, not VMEM)
    return (m // 128 <= _solve_pane_cap() and nnz <= 16_000_000
            and num_levels <= 200_000)


def _solve_pane_cap() -> int:
    """Two-resident-pane row budget (env-tunable so the pane-blocked
    path is testable at CPU sizes)."""
    import os
    return int(os.environ.get("SPBLAS_ROUTE_SOLVE_PANE_CAP", 9_000))


def _block_solve_eligible(a, m, nnz) -> bool:
    """Pane-blocked substitution envelope (round 5): beyond the
    one-dispatch pane cap but within host-inspect reach."""
    import os
    from spblas_tpu.types import on_tpu
    if os.environ.get("SPBLAS_NO_ROUTE_TRSV") == "1":
        return False
    if not (on_tpu() or os.environ.get("SPBLAS_FORCE_ROUTE_TRSV")):
        return False
    if a.dtype != jnp.float32:
        return False
    bm = _block_solve_rows()
    return (m // 128 > _solve_pane_cap() and -(-m // bm) <= 16
            and nnz <= 128_000_000)


def _block_solve_rows() -> int:
    import os
    return int(os.environ.get("SPBLAS_BLOCK_SOLVE_ROWS", 1 << 20))


def _build_block_solve(rowptr, colind, values_h, m, nnz, lower: bool,
                       unit: bool, uplo: str, diag: str):
    """Host build of the pane-blocked plan: per block, a diagonal-block
    sub-inspect (recurses into the ordinary inspector, whose own gates
    pick one-dispatch/ragged per block) plus a strip matvec plan
    through the chooser."""
    from spblas_tpu.formats.csr import CSR
    from spblas_tpu.kernels.plans import build_matvec_plan

    bm = _block_solve_rows()
    K = -(-m // bm)
    row_of = np.repeat(np.arange(m, dtype=np.int64),
                       np.diff(np.minimum(rowptr[: m + 1], nnz)))
    cols = colind[:nnz].astype(np.int64)
    eidx = np.arange(nnz, dtype=np.int64)

    subs, sub_vals, sub_eidx = [], [], []
    strip_kinds, strip_plans, strip_eidx = [], [], []
    for k in range(K):
        lo_r, hi_r = k * bm, min((k + 1) * bm, m)
        bk = hi_r - lo_r
        sel = (row_of >= lo_r) & (row_of < hi_r)
        in_diag = sel & (cols >= lo_r) & (cols < hi_r)
        if lower:
            in_strip = sel & (cols < lo_r)
        else:
            in_strip = sel & (cols >= hi_r)

        # diagonal block as its own CSR (host arrays through the
        # inspector's host_arrays shortcut — no tunnel round-trips)
        de = np.flatnonzero(in_diag)
        d_rows = row_of[de] - lo_r
        d_rp = np.zeros(bk + 1, np.int64)
        np.add.at(d_rp[1:], d_rows, 1)
        d_rp = np.cumsum(d_rp)
        d_ci = cols[de] - lo_r
        d_vv = values_h[de].astype(np.float32)
        sub_csr = CSR.from_arrays(d_vv, d_rp, d_ci.astype(np.int32),
                                  (bk, bk), nnz=len(de))
        sub_info = triangular_solve_inspect(
            sub_csr, uplo=uplo, diag=diag,
            host_arrays=(d_rp, d_ci.astype(np.int32), d_vv))
        subs.append(sub_info.plan)
        sub_vals.append(sub_csr.values)
        sub_eidx.append(jnp.asarray(de, dtype=jnp.int32))

        se = np.flatnonzero(in_strip)
        if len(se) == 0 or (lower and k == 0) or \
                (not lower and k == K - 1):
            strip_kinds.append("none")
            strip_plans.append(())
            strip_eidx.append(())
            continue
        s_rows = row_of[se] - lo_r
        s_rp = np.zeros(bk + 1, np.int64)
        np.add.at(s_rp[1:], s_rows, 1)
        s_rp = np.cumsum(s_rp)
        s_ci = cols[se] - (0 if lower else hi_r)
        s_n = lo_r if lower else m - hi_r
        strip_csr = CSR.from_arrays(
            values_h[se].astype(np.float32), s_rp,
            s_ci.astype(np.int32), (bk, s_n), nnz=len(se))
        kind, plan = build_matvec_plan(strip_csr)
        strip_kinds.append(kind)
        strip_plans.append(plan)
        strip_eidx.append(jnp.asarray(se, dtype=jnp.int32))
    return BlockTrsv(subs=tuple(subs), sub_vals=tuple(sub_vals),
                     sub_eidx=tuple(sub_eidx),
                     strip_plans=tuple(strip_plans),
                     strip_eidx=tuple(strip_eidx),
                     strip_kinds=tuple(strip_kinds),
                     bm=bm, lower=lower)


def _solve_one(plan: TrsvPlan, values, b, alpha):
    """The inner route-or-ragged dispatch shared by the top-level solve
    and the pane-blocked executor (values/b/alpha already vetted)."""
    if plan.route is not None:
        from spblas_tpu.kernels.route2_kernel import route2_solve
        route = plan.route
        if values is not plan.route_vals_ref:
            route = route.update_solve_values(values, plan.route_dpe)
        alpha_f = jnp.asarray(alpha, jnp.float32)
        if plan.route_diag is not None:
            y0 = b / (values[plan.route_diag] * alpha_f)
        else:
            y0 = b / alpha_f
        return route2_solve(route, y0)
    return _trsv_execute(plan, values, b, alpha)


def _blocked_solve(blk: BlockTrsv, values, vals_ref, b, alpha):
    """Execute the pane-blocked substitution: K chained block solves
    with strip SpMV updates between them."""
    from spblas_tpu.kernels.plans import plan_spmv

    refresh = values is not vals_ref
    K = len(blk.subs)
    m = b.shape[0]
    order = range(K) if blk.lower else range(K - 1, -1, -1)
    xs: dict = {}
    for k in order:
        lo_r = k * blk.bm
        hi_r = min((k + 1) * blk.bm, m)
        r_k = b[lo_r:hi_r].astype(jnp.float32)
        if blk.strip_kinds[k] != "none":
            plan_k = blk.strip_plans[k]
            if refresh:
                plan_k = plan_k.update_values(
                    values[blk.strip_eidx[k]])
            if blk.lower:
                xp = jnp.concatenate([xs[j] for j in range(k)])
            else:
                xp = jnp.concatenate([xs[j] for j in range(k + 1, K)])
            sy = plan_spmv((blk.strip_kinds[k], plan_k), xp)
            r_k = r_k - jnp.asarray(alpha, jnp.float32) * sy
        vk = values[blk.sub_eidx[k]] if refresh else blk.sub_vals[k]
        xs[k] = _solve_one(blk.subs[k], vk, r_k, alpha)
    return jnp.concatenate([xs[k] for k in range(K)])


@jax.jit
def _trsv_execute(plan: TrsvPlan, values, b, alpha):
    """Jitted level sweep over the ragged schedule: each level slices a
    fixed e_cap window of the entry stream (masked to the live count),
    segment-sums the off-diagonal dots per row slot, and solves its rows
    in parallel.

    The per-level cost on this platform is per-op dispatch, so the
    streams are interleaved into ONE (3, E) / (2, R) array each and
    sliced once per level (5 dynamic slices -> 2, round 5 — the
    ragged-floor lever VERDICT r4 #8 names; deeper level-merging needs
    a cross-level correction map and the one-dispatch/pane-blocked
    paths have made this the correctness fallback)."""
    m = plan.m
    e_cap, r_cap = plan.e_cap, plan.r_cap
    ent3 = jnp.stack([plan.ent_idx, plan.ent_col, plan.ent_slot])
    rows2 = jnp.stack([plan.row_ids, plan.diag_idx])

    def body(lv, x):
        es = plan.lv_estart[lv]
        en = plan.lv_estart[lv + 1] - es
        zero = jnp.zeros((), es.dtype)   # x64: match index dtypes
        sl = jax.lax.dynamic_slice(ent3, (zero, es), (3, e_cap))
        eidx, cols, slot = sl[0], sl[1], sl[2]
        ev = jnp.arange(e_cap) < en
        av = jnp.where(ev, values[eidx] * alpha * x[cols], 0)
        dot = jax.ops.segment_sum(av, jnp.where(ev, slot, r_cap - 1),
                                  num_segments=r_cap)

        rs = plan.lv_rstart[lv]
        rn = plan.lv_rstart[lv + 1] - rs
        rd = jax.lax.dynamic_slice(rows2, (zero, rs), (2, r_cap))
        rows, dpos = rd[0], rd[1]
        rv = jnp.arange(r_cap) < rn
        rows = jnp.where(rv, rows, m)
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
    # a supplied info must agree with the call's triangle/diag tags —
    # silently solving the OTHER triangle is worse than an error
    # (round-4 review; the reference static_asserts its tags,
    # triangular_solve_impl.hpp:46-47)
    if plan.uplo != ("lower" if _check_uplo(uplo) else "upper"):
        raise ValueError(
            f"triangular_solve: info was inspected with "
            f"uplo={plan.uplo!r} but called with uplo={uplo!r}")
    if plan.unit_diag != _check_diag(diag):
        plan_diag = "unit" if plan.unit_diag else "explicit"
        raise ValueError(
            f"triangular_solve: info was inspected with "
            f"diag={plan_diag!r} but called with diag={diag!r}")
    b = jnp.asarray(b)
    if b.shape[0] != plan.m:
        raise ValueError(
            f"triangular_solve: b length {b.shape[0]} != m {plan.m}")
    values = jnp.conj(a.values) if conj else a.values
    from spblas_tpu.kernels.plans import transform_safe
    alpha_ok = (transform_safe(alpha)
                and not jnp.issubdtype(jnp.result_type(alpha),
                                       jnp.complexfloating))
    fast_ok = (not conj and transform_safe(b) and transform_safe(values)
               and alpha_ok and b.dtype == jnp.float32
               and values.dtype == jnp.float32)
    # transform_safe on rhs, values AND alpha: the one-dispatch kernel
    # has no VJP, so grad/vmap through any input must take the
    # differentiable ragged sweep; complex alpha likewise (real-f32
    # kernels).  Numeric re-runs with new values re-bake on device
    # (_solve_one / the blocked refresh path) — the rocSPARSE
    # numeric-reuse contract (multiply_spgemm.hpp:178-214).
    if plan.route is not None and fast_ok:
        return _solve_one(plan, values, b, alpha)
    if plan.blocked is not None and fast_ok:
        blk: BlockTrsv = plan.blocked
        refresh = values is not plan.route_vals_ref
        strips_ok = all(
            k == "none" or hasattr(p, "update_values")
            for k, p in zip(blk.strip_kinds, blk.strip_plans)) \
            if refresh else True
        if strips_ok:
            return _blocked_solve(blk, values, plan.route_vals_ref, b,
                                  alpha).astype(
                jnp.result_type(values.dtype, b.dtype))
    return _trsv_execute(plan, values, b, alpha)


def _check_uplo(uplo: str) -> bool:
    if uplo not in ("lower", "upper"):
        raise ValueError(f"uplo must be 'lower' or 'upper', got {uplo!r}")
    return uplo == "lower"


def _check_diag(diag: str) -> bool:
    if diag not in ("explicit", "unit"):
        raise ValueError(f"diag must be 'explicit' or 'unit', got {diag!r}")
    return diag == "unit"
