"""ROUTE2 plan/kernel tests — dense oracle + numpy kernel-semantics
oracle (reference capability bar: vendor CSR SpMV,
include/spblas/vendor/cusparse/detail/spmv_impl.hpp:26-102)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spblas_tpu.kernels.route2 import (build_route2_plan,
                                       route2_spmv_numpy)
from spblas_tpu.kernels.route2_kernel import route2_spmv
from tests.util import assert_close


def _random_csr(m, n, nnz, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, nnz)
    if skew:
        rows[: nnz // 10] = rng.integers(0, max(m // 100, 1), nnz // 10)
        cols = (rng.zipf(1.5, nnz) - 1) % n
    else:
        cols = rng.integers(0, n, nnz)
    import scipy.sparse as sp
    v = rng.standard_normal(nnz).astype(np.float32)
    a = sp.coo_matrix((v, (rows, cols)), shape=(m, n)).tocsr()
    a.sum_duplicates()
    return a


CASES = [
    (300, 300, 3000, False),
    (2000, 1500, 20000, False),
    (1024, 1024, 30000, True),      # zipf columns + hub rows
    (5000, 9000, 40000, False),     # wide, g=16
    (100, 100, 60, False),          # nearly empty
]


@pytest.mark.parametrize("m,n,nnz,skew", CASES)
def test_route2_simulator_matches_dense(m, n, nnz, skew):
    a = _random_csr(m, n, nnz, seed=m + nnz, skew=skew)
    plan = build_route2_plan(a.indptr, a.indices, a.data, (m, n), a.nnz)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n).astype(np.float32)
    assert_close(route2_spmv_numpy(plan, x), a @ x)


@pytest.mark.parametrize("m,n,nnz,skew", CASES)
def test_route2_kernel_matches_dense(m, n, nnz, skew):
    a = _random_csr(m, n, nnz, seed=m + nnz, skew=skew)
    plan = build_route2_plan(a.indptr, a.indices, a.data, (m, n), a.nnz)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(route2_spmv(plan, jnp.asarray(x)))
    assert_close(y, a @ x)


@pytest.mark.parametrize("any_lane", [False, True])
def test_route2_any_lane_modes(any_lane):
    """Both packer modes (home-lane-only legacy layout vs any-lane
    B_LSRC carriers) must agree with the dense oracle through the
    simulator AND the kernel; the home-only plan must advertise
    any_lane=False so the kernel skips the lsrc gather (round-3 gate:
    home wins on dense cell grids, any-lane on starved ones)."""
    m, n, nnz = 2000, 1500, 20000
    a = _random_csr(m, n, nnz, seed=77)
    plan = build_route2_plan(a.indptr, a.indices, a.data, (m, n),
                             a.nnz, any_lane=any_lane)
    assert plan.any_lane == any_lane
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n).astype(np.float32)
    assert_close(route2_spmv_numpy(plan, x), a @ x)
    assert_close(np.asarray(route2_spmv(plan, jnp.asarray(x))), a @ x)


def test_route2_starved_cells_gate():
    """Round 4: starved cell grids auto-pick SUPERCELLS (home-lane,
    row_window_mult > 1) — they dominated any-lane on every measured
    shape (benchmarks/dev/supercell_ab.py: m=1M 5.67 vs 3.54 Gnnz/s).
    Dense grids stay classic; explicit any_lane=True still packs
    any-lane with W pinned to 1 (the lsrc bits are shared)."""
    a = _random_csr(2000, 1500, 20000, seed=78)      # dense cells
    plan = build_route2_plan(a.indptr, a.indices, a.data, (2000, 1500),
                             a.nnz)
    assert not plan.any_lane
    b = _random_csr(40000, 40000, 25000, seed=79)    # starved cells
    planb = build_route2_plan(b.indptr, b.indices, b.data,
                              (40000, 40000), b.nnz)
    assert planb.row_window_mult > 1 and not planb.any_lane
    x = np.random.default_rng(5).standard_normal(40000).astype(
        np.float32)
    assert_close(route2_spmv_numpy(planb, x), b @ x)
    assert_close(np.asarray(route2_spmv(planb, jnp.asarray(x))), b @ x)
    planc = build_route2_plan(b.indptr, b.indices, b.data,
                              (40000, 40000), b.nnz, any_lane=True)
    assert planc.any_lane and planc.row_window_mult == 1


def test_route2_supercell_oracle_with_hubs():
    """Supercell plans with hub rows (aux spill) against the dense
    oracle through BOTH the simulator and the interpret kernel — the
    wide publish must coexist with aux reduction chunks (whose tiles
    carry sub-window 0 and land at their own aux window)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(11)
    m = 30_000
    rows = rng.integers(0, m, 60_000)
    rows[:3000] = 17                  # a hub row (aux spill)
    cols = rng.integers(0, m, 60_000)
    vals = rng.standard_normal(60_000).astype(np.float32)
    a = sp.csr_matrix((vals, (rows, cols)), shape=(m, m))
    a.sum_duplicates()
    plan = build_route2_plan(a.indptr, a.indices, a.data, (m, m),
                             a.nnz, row_window_mult=8, any_lane=False)
    assert plan.row_window_mult == 8 and plan.n_aux_chunks > 0
    x = rng.standard_normal(m).astype(np.float32)
    want = a @ x
    floor = 1e-4 * float(np.abs(want).max() + 1)
    assert_close(route2_spmv_numpy(plan, x), want, abs_floor=floor)
    assert_close(np.asarray(route2_spmv(plan, jnp.asarray(x))), want,
                 abs_floor=floor)


def test_route2_update_values_reuse():
    a = _random_csr(500, 500, 4000, seed=9)
    plan = build_route2_plan(a.indptr, a.indices, a.data, a.shape,
                             a.nnz)
    rng = np.random.default_rng(3)
    new_vals = rng.standard_normal(a.nnz).astype(np.float32)
    plan2 = plan.update_values(jnp.asarray(new_vals))
    a2 = a.copy()
    a2.data = new_vals
    x = rng.standard_normal(500).astype(np.float32)
    assert_close(np.asarray(route2_spmv(plan2, jnp.asarray(x))), a2 @ x)


@pytest.mark.parametrize("hub_deg,ww", [(256, None), (256, 8)])
def test_route2_hub_split_oracle(hub_deg, ww):
    """Explicit hub-split plans (flag-2 identity-lane chunks that
    full-sum to one scalar, round 4) against the dense oracle through
    the simulator AND the interpret kernel — with the low-degree
    remainder on classic chunks, and coexisting with supercell
    publishes (ww=8).  CLAUDE.md: every numeric path needs a
    dense-oracle test; this one previously lived only in
    benchmarks/dev/rmat_hub_ab.py."""
    import scipy.sparse as sp
    rng = np.random.default_rng(13)
    m = n = 16_384
    # three genuinely dense rows (deg >> hub_deg) + sparse remainder
    hub_rows = np.repeat(np.array([5, 4000, 12_001]), 2000)
    hub_cols = np.concatenate([rng.permutation(n)[:2000]
                               for _ in range(3)])
    lo_rows = rng.integers(0, m, 30_000)
    lo_cols = rng.integers(0, n, 30_000)
    rows = np.concatenate([hub_rows, lo_rows])
    cols = np.concatenate([hub_cols, lo_cols])
    v = rng.standard_normal(len(rows)).astype(np.float32)
    a = sp.coo_matrix((v, (rows, cols)), shape=(m, n)).tocsr()
    a.sum_duplicates()
    plan = build_route2_plan(a.indptr, a.indices, a.data, (m, n),
                             a.nnz, hub_deg=hub_deg, row_window_mult=ww)
    assert plan.has_hub
    if ww is not None:
        assert plan.row_window_mult == ww
    x = rng.standard_normal(n).astype(np.float32)
    want = a @ x
    floor = 1e-4 * float(np.abs(want).max() + 1)
    assert_close(route2_spmv_numpy(plan, x), want, abs_floor=floor)
    assert_close(np.asarray(route2_spmv(plan, jnp.asarray(x))), want,
                 abs_floor=floor)
    # values refresh must preserve the hub/aux carrier slots too
    vals2 = rng.standard_normal(a.nnz).astype(np.float32)
    a2 = a.copy()
    a2.data = vals2
    want2 = a2 @ x
    floor2 = 1e-4 * float(np.abs(want2).max() + 1)
    plan2 = plan.update_values(jnp.asarray(vals2))
    assert_close(np.asarray(route2_spmv(plan2, jnp.asarray(x))), want2,
                 abs_floor=floor2)


def test_route2_update_values_preserves_aux_carriers():
    """values-refresh on an aux-bearing plan must keep the baked 1.0
    reduction multipliers (val_src = -1 slots).  The round-4 regression:
    ``update_values`` multiplied by ``val_src >= 0`` and zeroed every
    aux carrier, so a refresh with IDENTICAL values changed the
    answer."""
    import scipy.sparse as sp
    rng = np.random.default_rng(21)
    m = n = 2048
    rows = np.concatenate([np.zeros(1200, np.int64),
                           rng.integers(0, m, 2000)])
    cols = np.concatenate([rng.permutation(n)[:1200],
                           rng.integers(0, n, 2000)])
    v = rng.standard_normal(len(rows)).astype(np.float32)
    a = sp.coo_matrix((v, (rows, cols)), shape=(m, n)).tocsr()
    a.sum_duplicates()
    plan = build_route2_plan(a.indptr, a.indices, a.data, (m, n), a.nnz)
    assert plan.n_aux_chunks > 0, "fixture must exercise aux chunks"
    x = rng.standard_normal(n).astype(np.float32)
    same = plan.update_values(jnp.asarray(np.asarray(a.data)))
    assert_close(np.asarray(route2_spmv(same, jnp.asarray(x))), a @ x)
    new_vals = rng.standard_normal(a.nnz).astype(np.float32)
    a2 = a.copy()
    a2.data = new_vals
    fresh = plan.update_values(jnp.asarray(new_vals))
    assert_close(np.asarray(route2_spmv(fresh, jnp.asarray(x))), a2 @ x)


def test_route2_empty_and_single():
    import scipy.sparse as sp
    a = sp.csr_matrix((64, 64), dtype=np.float32)
    plan = build_route2_plan(a.indptr, a.indices, a.data, (64, 64), 0)
    x = np.ones(64, np.float32)
    assert np.abs(route2_spmv_numpy(plan, x)).max() == 0.0

    b = sp.csr_matrix(([2.5], ([3], [60])), shape=(64, 64),
                      dtype=np.float32)
    plan = build_route2_plan(b.indptr, b.indices, b.data, (64, 64), 1)
    y = route2_spmv_numpy(plan, x)
    assert y[3] == pytest.approx(2.5)
    assert np.abs(np.delete(y, 3)).max() == 0.0


def test_route2_hub_row_aux_spill():
    """One extreme hub row (degree >> cell chunk supply) exercises the
    aux spill + in-dispatch reduction path."""
    import scipy.sparse as sp
    rng = np.random.default_rng(4)
    m = n = 2048
    rows = np.concatenate([np.zeros(1500, np.int64),
                           rng.integers(0, m, 2000)])
    cols = np.concatenate([rng.permutation(n)[:1500],
                           rng.integers(0, n, 2000)])
    v = rng.standard_normal(len(rows)).astype(np.float32)
    a = sp.coo_matrix((v, (rows, cols)), shape=(m, n)).tocsr()
    a.sum_duplicates()
    plan = build_route2_plan(a.indptr, a.indices, a.data, (m, n), a.nnz)
    x = rng.standard_normal(n).astype(np.float32)
    assert_close(route2_spmv_numpy(plan, x), a @ x)
    assert_close(np.asarray(route2_spmv(plan, jnp.asarray(x))), a @ x)


def test_route2_solve_simulator_and_kernel():
    """One-dispatch solve plan: numpy kernel-semantics oracle and the
    Pallas kernel both match scipy triangular solves."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    from spblas_tpu import native
    from spblas_tpu.kernels.route2 import (build_route2_solve_plan,
                                           route2_solve_numpy)
    from spblas_tpu.kernels.route2_kernel import route2_solve
    from spblas_tpu.utils.generate import generate_triangular_csr

    for lower, unit in ((True, False), (False, False), (True, True)):
        L = generate_triangular_csr(1200, seed=21, lower=lower,
                                    unit_diag=unit)
        rp = np.asarray(L.rowptr)
        ci = np.asarray(L.colind)
        vv = np.asarray(L.values)
        nnz = int(L.nnz)
        levels, diag_pos, _ = native.level_schedule(
            1200, nnz, rp.astype(np.int64), ci, lower, unit)
        plan = build_route2_solve_plan(rp, ci, vv, (1200, 1200), nnz,
                                       levels, diag_pos, unit, lower)
        b = np.random.default_rng(2).standard_normal(1200).astype(
            np.float32)
        d = np.ones(1200) if unit else vv[diag_pos]
        y0 = (b / d).astype(np.float32)
        A = sp.csr_matrix((vv[:nnz], ci[:nnz], rp), shape=(1200, 1200))
        if unit:
            A = (A + sp.eye(1200)).tocsr()
        ref = spl.spsolve_triangular(A, b, lower=lower)
        # substitution amplifies errors with the solution magnitude
        # (f32 forward solve vs scipy's f64): floor scales with max|x|
        floor = 3e-5 * float(np.abs(ref).max())
        assert_close(route2_solve_numpy(plan, y0), ref, factor=256,
                     abs_floor=floor)
        assert_close(np.asarray(route2_solve(plan, jnp.asarray(y0))),
                     ref, factor=256, abs_floor=floor)


def test_route2_solve_multicell_slab_rounding():
    """m spanning multiple window cells with ceil(m/1024) not a multiple
    of g must round the output pane up to whole slab windows — the slab
    slice pl.ds(sb, SUBS*g) otherwise overruns the pane and the solve is
    silently wrong (advisor round-2 high finding: m=5000, deg-3 lower,
    g=4 gave slab_end 64 > pane 40 and ~67 max rel err)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    from spblas_tpu import native
    from spblas_tpu.kernels.route2 import (SUBS, build_route2_solve_plan,
                                           route2_solve_numpy)
    from spblas_tpu.kernels.route2_kernel import route2_solve

    rng = np.random.default_rng(0)
    m = 5000
    rows, cols = [], []
    for i in range(m):
        k = min(i, 3)
        if k:
            rows.extend([i] * k)
            cols.extend(rng.choice(i, size=k, replace=False))
        rows.append(i)
        cols.append(i)
    vals = rng.uniform(0.5, 1.5, len(rows)).astype(np.float32)
    A = sp.csr_matrix((vals, (np.array(rows), np.array(cols))),
                      shape=(m, m))
    rp, ci, vv = A.indptr, A.indices, A.data
    levels, diag_pos, _ = native.level_schedule(
        m, A.nnz, rp.astype(np.int64), ci, True, False)
    plan = build_route2_solve_plan(rp, ci, vv, (m, m), A.nnz, levels,
                                   diag_pos, False, True)
    # the pane itself must now be a whole number of slab windows
    assert plan.x_rows % (SUBS * plan.g) == 0
    assert plan.x_rows >= plan.pane_rows
    b = rng.uniform(-1, 1, m).astype(np.float32)
    y0 = (b / vv[diag_pos]).astype(np.float32)
    ref = spl.spsolve_triangular(A, b, lower=True)
    floor = 3e-4 * float(np.abs(ref).max())
    assert_close(route2_solve_numpy(plan, y0), ref, factor=256,
                 abs_floor=floor)
    assert_close(np.asarray(route2_solve(plan, jnp.asarray(y0))),
                 ref, factor=256, abs_floor=floor)


def test_route2_window_major_overflow_spill():
    """Lane-imbalanced high-degree patterns overflow the per-cell chunk
    budget; the overflow repacks window-major into aux-published chunks
    (native spill path) and must match the dense oracle in both the
    simulator and the kernel."""
    import scipy.sparse as sp
    from spblas_tpu.formats.csr import CSR

    rng = np.random.default_rng(0)
    m = n = 12_288
    rows_l, cols_l = [], []
    for r in range(m):
        deg = 90 if (r % 128) < 16 else 12
        rows_l.append(np.full(deg, r))
        cols_l.append(rng.integers(0, n, deg))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    v = rng.standard_normal(len(rows)).astype(np.float32)
    A = sp.coo_matrix((v, (rows, cols)), shape=(m, n)).tocsr()
    A.sum_duplicates()
    a = CSR.from_arrays(A.data, A.indptr, A.indices, (m, n), nnz=A.nnz)
    plan = build_route2_plan(np.asarray(a.rowptr), np.asarray(a.colind),
                             np.asarray(a.values), (m, n), int(a.nnz))
    x = rng.standard_normal(n).astype(np.float32)
    ref = A @ x
    floor = 3e-5 * float(np.abs(ref).max())
    assert_close(route2_spmv_numpy(plan, x), ref, factor=256,
                 abs_floor=floor)
    assert_close(np.asarray(route2_spmv(plan, jnp.asarray(x))), ref,
                 factor=256, abs_floor=floor)


def test_python_packer_fallback_matches_oracle(monkeypatch):
    """The no-toolchain path (numpy keys/argsort + python cell packer)
    goes through different branches of _pack_stream since the round-4
    native pipeline; it must still produce a numerically correct
    plan."""
    import numpy as np
    import spblas_tpu.native as native
    import spblas_tpu.kernels.route2 as r2
    from spblas_tpu.utils.generate import generate_csr_arrays

    monkeypatch.setattr(native, "get_lib", lambda: None)
    m = 6_000
    values, rowptr, colind = generate_csr_arrays(m, m, 8 * m, seed=3)
    nnz = int(rowptr[-1])
    plan = r2.build_route2_plan(rowptr, colind, values, (m, m), nnz,
                                any_lane=True, row_window_mult=1)
    x = np.random.default_rng(2).standard_normal(m).astype(np.float32)
    y = r2.route2_spmv_numpy(plan, x)
    rows = np.repeat(np.arange(m),
                     np.diff(np.minimum(np.asarray(rowptr), nnz)))
    y_ref = np.zeros(m, np.float64)
    np.add.at(y_ref, rows, np.asarray(values)[:nnz].astype(np.float64)
              * x[np.asarray(colind)[:nnz]].astype(np.float64))
    err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert err < 1e-5


def test_rotated_supercell_plan_oracle():
    """Per-chunk sublane publish rotations (round 5, VERDICT r4 #5):
    packed fill rises on starved supercell grids and the un-rotating
    kernel must still match the dense oracle; values-refresh and
    serialization keep the rho stream."""
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.kernels.route2 import build_route2_plan
    from spblas_tpu.kernels.route2_kernel import route2_spmv
    from spblas_tpu.utils.generate import generate_csr
    from tests.util import assert_close, dense_from_csr

    m, nnz = 20_000, 100_000
    a = generate_csr(m, m, nnz, seed=1)
    rp = np.asarray(a.rowptr)
    ci = np.asarray(a.colind)
    vv = np.asarray(a.values)
    plan = build_route2_plan(rp, ci, vv, (m, m), int(a.nnz),
                             row_window_mult=8, rotate=True)
    assert plan.rotated and plan.rho is not None
    plain = build_route2_plan(rp, ci, vv, (m, m), int(a.nnz),
                              row_window_mult=8, rotate=False)
    assert plan.nchunks <= plain.nchunks      # the fill win
    x = np.random.default_rng(2).standard_normal(m).astype(np.float32)
    y = np.asarray(route2_spmv(plan, jnp.asarray(x)))
    assert_close(y, dense_from_csr(a) @ x, abs_floor=1e-3)
    # values refresh keeps rho/tiles
    p2 = plan.update_values(jnp.asarray(2.0 * vv))
    y2 = np.asarray(route2_spmv(p2, jnp.asarray(x)))
    assert_close(y2, 2.0 * dense_from_csr(a) @ x, abs_floor=1e-3)
    # serialization round-trip
    import tempfile, os
    from spblas_tpu.utils.serialize import save_plan, load_plan
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rot.npz")
        save_plan(path, plan)
        back = load_plan(path)
        assert back.rotated
        y3 = np.asarray(route2_spmv(back, jnp.asarray(x)))
        assert_close(y3, dense_from_csr(a) @ x, abs_floor=1e-3)
