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
