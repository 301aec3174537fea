"""Round-4 review regressions (ops/formats batch): dtype-gated plan
paths, capacity/flag validation, container padding invariants."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

import spblas_tpu as sp
from spblas_tpu.formats.coo import COO
from spblas_tpu.formats.csr import CSR
from spblas_tpu.kernels import plans as _plans
from spblas_tpu.utils import generate as gen
from tests.util import assert_close, dense_from_csr


@pytest.fixture
def fake_tpu(monkeypatch):
    monkeypatch.setattr(_plans, "_on_tpu", lambda: True)
    yield


@pytest.fixture
def x64():
    import jax
    with jax.enable_x64(True):
        yield


def test_optimized_spmv_complex_x_takes_base_path(fake_tpu):
    """A real-f32 matrix_opt plan (band/route computes in f32) must not
    truncate a complex operand — the gate reroutes to the base path."""
    a = gen.generate_csr(512, 512, 4000, seed=0)
    ao = sp.matrix_opt(a)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(512)
         + 1j * rng.standard_normal(512)).astype(np.complex64)
    y = np.asarray(sp.multiply(ao, jnp.asarray(x)))
    want = dense_from_csr(a).astype(np.complex64) @ x
    assert y.dtype == np.complex64
    assert_close(y, want, factor=256, abs_floor=1e-3)


def test_optimized_spmm_f64_b_takes_base_path(fake_tpu, x64):
    a = gen.generate_csr(300, 300, 2500, seed=2)
    ao = sp.matrix_opt(a)
    rng = np.random.default_rng(3)
    b = rng.standard_normal((300, 4))
    c = np.asarray(sp.multiply(ao, jnp.asarray(b)))
    assert c.dtype == np.float64
    assert_close(c, dense_from_csr(a).astype(np.float64) @ b, factor=256)


def test_spgemm_fill_complex_alpha_correct(monkeypatch):
    """fill with scaled(1j, a): the f32 route engine must be bypassed
    (it would drop the imaginary part), not silently truncate."""
    monkeypatch.setenv("SPBLAS_FORCE_ROUTE_SPGEMM", "1")
    a = gen.generate_csr(200, 200, 1500, seed=4)
    info = sp.multiply_compute(a, a)
    assert info.plan.route is not None, \
        "fixture must actually build the route engine"
    c = sp.multiply_fill(info, sp.scaled(1j, a), a)
    want = 1j * (dense_from_csr(a).astype(np.complex64)
                 @ dense_from_csr(a).astype(np.complex64))
    got = np.asarray(c.todense())
    assert got.dtype == np.complex64
    assert_close(got, want, factor=256, abs_floor=1e-2)


def test_spgemm_fill_with_capacity_operand_correct(monkeypatch):
    """A with_capacity'd operand (same sparsity, legal) must not run
    against the engine's baked pane geometry."""
    monkeypatch.setenv("SPBLAS_FORCE_ROUTE_SPGEMM", "1")
    a = gen.generate_csr(200, 200, 1500, seed=5)
    info = sp.multiply_compute(a, a)
    assert info.plan.route is not None, \
        "fixture must actually build the route engine"
    ref = np.asarray(sp.multiply_fill(info, a, a).todense())
    a2 = a.with_capacity(2 * a.capacity)
    got = np.asarray(sp.multiply_fill(info, a2, a).todense())
    assert_close(got, ref, factor=64)


def test_symbolic_fill_capacity_overflow_raises():
    a = gen.generate_csr(100, 100, 800, seed=6)
    state = sp.SpgemmState()
    info = state.symbolic_compute(a, a)
    small = CSR.from_arrays(
        np.zeros(4, np.float32), np.zeros(101, np.int64),
        np.zeros(4, np.int32), (100, 100), nnz=4)
    with pytest.raises(RuntimeError, match="capacity"):
        state.symbolic_fill(a, a, c=small)
    # the state must not have been corrupted by the failed call
    c = state.numeric(a, a)
    assert int(c.nnz) == info.result_nnz


def test_triangular_solve_info_flag_mismatch_raises():
    L = gen.generate_triangular_csr(150, seed=7, lower=True)
    info = sp.triangular_solve_inspect(L, uplo="lower")
    b = gen.generate_vector(150, seed=8)
    with pytest.raises(ValueError, match="uplo"):
        sp.triangular_solve(L, b, uplo="upper", info=info)
    with pytest.raises(ValueError, match="diag"):
        sp.triangular_solve(L, b, uplo="lower", diag="unit", info=info)


def test_multiply_dense_times_coo():
    a = np.random.default_rng(9).standard_normal((40, 50)).astype(
        np.float32)
    b_csr = gen.generate_csr(50, 30, 400, seed=10)
    from spblas_tpu.formats.convert import to_coo
    b = to_coo(b_csr)
    got = np.asarray(sp.multiply(jnp.asarray(a), b))
    want = a @ dense_from_csr(b_csr)
    assert_close(got, want, factor=256)


def test_multiply_inspect_dense_matrix_vector():
    info = sp.multiply_inspect(jnp.ones((4, 4)), jnp.ones(4))
    assert info.result_shape == (4,)


def test_coo_from_arrays_stale_tail_is_canonicalized():
    """Caller-supplied oversized buffers with stale tails must not
    contribute to COO numerics (no entry mask on the base path)."""
    rng = np.random.default_rng(11)
    m = 64
    vals = rng.standard_normal(16).astype(np.float32)
    rows = np.sort(rng.integers(0, m, 16)).astype(np.int32)
    cols = rng.integers(0, m, 16).astype(np.int32)
    # oversize the buffers and poison the tails
    vb = np.concatenate([vals, np.full(8, 99.0, np.float32)])
    rb = np.concatenate([rows, np.full(8, 3, np.int32)])
    cb = np.concatenate([cols, np.full(8, 5, np.int32)])
    a = COO.from_arrays(vb, rb, cb, (m, m), nnz=16)
    a.validate()
    x = rng.standard_normal(m).astype(np.float32)
    y = np.asarray(sp.multiply(a, jnp.asarray(x)))
    want = np.zeros(m, np.float32)
    np.add.at(want, rows, vals * x[cols])
    assert_close(y, want, factor=256)


def test_csc_to_coo_delegates_to_canonical_conversion():
    from spblas_tpu.formats.coo import csc_to_coo
    from spblas_tpu.formats.convert import to_csc
    a = gen.generate_csr(30, 40, 200, seed=12)
    coo = csc_to_coo(to_csc(a))
    coo.validate()
    np.testing.assert_allclose(np.asarray(coo.todense()),
                               dense_from_csr(a), rtol=1e-6)


def test_dia_pallas_wide_rectangular(fake_tpu):
    """Wide rectangular (n >> m) diagonal matrices crashed the fused
    Pallas DIA kernel with a negative pad (x sized by m, not n)."""
    from spblas_tpu.kernels.dia import build_dia_plan, _dia_spmv_pallas
    m, n = 128, 100_000
    vals = np.arange(1, m + 1, dtype=np.float32)
    a = CSR.from_arrays(vals, np.arange(m + 1, dtype=np.int64),
                        np.arange(m, dtype=np.int32), (m, n), nnz=m)
    plan = build_dia_plan(a)
    x = np.random.default_rng(13).standard_normal(n).astype(np.float32)
    y = np.asarray(_dia_spmv_pallas(plan, jnp.asarray(x)))
    assert_close(y, vals * x[:m], factor=64)


def test_solve_python_fallback_levels(monkeypatch):
    """Without the native packer the solve builder must batch levels
    conservatively: the python cell packer can aux-spill congested
    NON-hub segments, and a batched aux drain would land a row's
    partial sum after later levels' gathers."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spl
    from spblas_tpu import native
    from spblas_tpu.kernels.route2 import (build_route2_solve_plan,
                                           route2_solve_numpy)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    rng = np.random.default_rng(14)
    m = 1500
    # dense-ish lower triangle: many 3-8 entry rows in ONE cell, deep
    # level chains -> pool congestion on the python packer
    A = sps.random(m, m, density=0.01,
                   random_state=np.random.RandomState(7),
                   format="csr", dtype=np.float64)
    A = sps.tril(A, k=-1).tocsr()
    diag = np.abs(A).sum(axis=1).A1 + 1.0
    A = (A + sps.diags(diag)).tocsr()
    A.sum_duplicates()
    vals = A.data.astype(np.float32)
    rowptr = A.indptr.astype(np.int64)
    levels, diag_pos, nlev = native.level_schedule(
        m, A.nnz, rowptr, A.indices, True, False)
    plan = build_route2_solve_plan(rowptr, A.indices, vals, (m, m),
                                   A.nnz, levels, diag_pos, False, True)
    b = rng.standard_normal(m).astype(np.float32)
    y0 = (b / vals[diag_pos]).astype(np.float32)
    xs = route2_solve_numpy(plan, y0)[:m]
    want = spl.spsolve_triangular(A, b.astype(np.float64), lower=True)
    err = np.abs(xs - want).max() / (np.abs(want).max() + 1)
    assert err < 5e-3, err


def test_power_method_f64_and_complex(x64):
    from spblas_tpu.solvers import power_method
    a = gen.generate_csr(60, 60, 500, seed=15, dtype=np.float64)
    res = power_method(a, 60, iters=30)
    assert res.eigenvector.dtype == jnp.float64
    d = dense_from_csr(a).astype(np.float64)
    lam_ref = np.max(np.abs(np.linalg.eigvals(d)))
    assert abs(abs(float(res.eigenvalue)) - lam_ref) / lam_ref < 0.1


def test_route_plan_roundtrip_none_aux(tmp_path):
    from spblas_tpu.kernels.route_plan import build_route_plan
    from spblas_tpu.kernels.route_spmv import route_spmv
    from spblas_tpu.utils.serialize import load_plan, save_plan
    a = gen.generate_csr(400, 400, 1000, seed=16)
    plan = build_route_plan(np.asarray(a.rowptr), np.asarray(a.colind),
                            np.asarray(a.values), (400, 400),
                            int(a.nnz))
    assert plan.aux_plan is None, "fixture must hit the None field"
    p = str(tmp_path / "v1.npz")
    save_plan(p, plan)
    plan2 = load_plan(p)
    x = gen.generate_vector(400, seed=17)
    np.testing.assert_allclose(
        np.asarray(route_spmv(plan2, jnp.asarray(np.asarray(x)))),
        np.asarray(route_spmv(plan, jnp.asarray(np.asarray(x)))),
        rtol=1e-6)


def test_cx_plan_gate_rejects_complex128(x64):
    assert _plans.plan_dtype_safe(("route_cx", None), jnp.complex64)
    assert not _plans.plan_dtype_safe(("route_cx", None), jnp.complex128)
    assert not _plans.plan_dtype_safe(("band_cx", None), jnp.float64)
    assert _plans.plan_dtype_safe(("dia", None), jnp.complex128)


def test_matrix_market_complex_roundtrip(tmp_path):
    import dataclasses
    from spblas_tpu.utils.io import load_matrix_market, \
        save_matrix_market
    rng = np.random.default_rng(18)
    a = gen.generate_csr(40, 40, 300, seed=19)
    vi = rng.standard_normal(a.values.shape[0]).astype(np.float32)
    vi[int(a.nnz):] = 0.0
    ac = dataclasses.replace(a, values=jnp.asarray(
        (np.asarray(a.values) + 1j * vi).astype(np.complex64)))
    p = str(tmp_path / "cx.mtx")
    save_matrix_market(p, ac)
    back = load_matrix_market(p)
    assert np.issubdtype(back.dtype, np.complexfloating)
    np.testing.assert_allclose(np.asarray(back.todense()),
                               np.asarray(ac.todense()), rtol=1e-5,
                               atol=1e-5)


def test_paned_empty_panel_flagging():
    """An all-empty row panel's pad group must read the zero-init y
    panel, not the never-DMA'd x scratch (NaN poisoning risk)."""
    from spblas_tpu.kernels.route_paned import (build_route_paned_plan,
                                                route_paned_spmv)
    rng = np.random.default_rng(20)
    m = n = 4096
    # all entries in the FIRST 1024 rows; rows 1024.. are empty, so
    # with panel_rows=1024 panels 1..3 are empty
    rows = np.sort(rng.integers(0, 1024, 3000)).astype(np.int64)
    cols = rng.integers(0, n, 3000).astype(np.int32)
    import scipy.sparse as sps
    A = sps.coo_matrix((rng.standard_normal(3000).astype(np.float32),
                        (rows, cols)), shape=(m, n)).tocsr()
    A.sum_duplicates()
    plan = build_route_paned_plan(A.indptr, A.indices, A.data, (m, n),
                                  A.nnz, panel_rows=1024)
    # empty panels still carry one zero chunk (append_empty), whose
    # pane DMA defines the x scratch; the regroup's n_flag0==0 branch
    # additionally re-flags any truly pane-less group to read the
    # zero-init y panel. Either way the empty rows must come out 0.
    assert len(plan.panels) >= 2
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(route_paned_spmv(plan, jnp.asarray(x)))[:m]
    assert np.all(np.isfinite(y))
    assert np.abs(y[1024:]).max() == 0.0
    assert_close(y, A @ x, factor=256, abs_floor=1e-4)
