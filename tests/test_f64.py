"""double-precision policy tests (VERDICT r2 missing #2).

The reference templates every algorithm over ``double``
(include/spblas/views/csr_view.hpp:12-16; test/gtest/util.hpp:7-23's
tolerance model handles doubles).  Policy here:

  * x64 disabled (jax default): container constructors WARN loudly (or
    raise under SPBLAS_STRICT_DTYPE=1) instead of silently narrowing.
  * x64 enabled: the CPU/XLA base paths run genuinely in f64 and the
    f64 oracle suites below hold at f64 tolerances (64*eps_f64 —
    ~1e-14 relative, unreachable by an f32 path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spblas_tpu import (CSR, add, multiply, multiply_compute,
                        multiply_fill, scaled, spmv, transpose,
                        triangular_solve, matrix_opt)
from spblas_tpu.utils import generate as gen
from tests.util import DIMS, assert_close, csr_entries, dense_from_csr


@pytest.fixture
def x64():
    with jax.enable_x64(True):
        yield


def _f64_csr(m, n, nnz, seed=0):
    return gen.generate_csr(m, n, nnz, seed=seed, dtype=np.float64)


# ------------------------------------------------------------------ #
# downcast policy (x64 off)
# ------------------------------------------------------------------ #

def test_f64_downcast_warns():
    vals = np.array([1.0, 2.0], dtype=np.float64)
    with pytest.warns(UserWarning, match="narrowed to 32 bits"):
        a = CSR.from_arrays(vals, [0, 1, 2], [0, 1], (2, 2), nnz=2)
    assert a.dtype == jnp.float32


def test_f64_downcast_strict_raises(monkeypatch):
    monkeypatch.setenv("SPBLAS_STRICT_DTYPE", "1")
    vals = np.array([1.0], dtype=np.float64)
    with pytest.raises(TypeError, match="narrowed to 32 bits"):
        CSR.from_arrays(vals, [0, 1], [0], (1, 1), nnz=1)


def test_f32_no_warning(recwarn):
    vals = np.array([1.0, 2.0], dtype=np.float32)
    CSR.from_arrays(vals, [0, 1, 2], [0, 1], (2, 2), nnz=2)
    assert not [w for w in recwarn if "narrowed" in str(w.message)]


# ------------------------------------------------------------------ #
# f64 oracle suites (x64 on) — bounds at 64*eps_f64 prove the whole
# path stayed in double precision
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_f64_spmv(x64, m, n, nnz):
    a = _f64_csr(m, n, nnz)
    assert a.dtype == jnp.float64
    x = gen.generate_vector(n, seed=1, dtype=np.float64)
    y = spmv(a, x)
    assert y.dtype == jnp.float64
    assert_close(y, dense_from_csr(a) @ x)


def test_f64_spmv_optimized_plan(x64):
    # the plan chooser must keep f64 on a dtype-preserving path
    m, n, nnz = 400, 400, 4000
    a = _f64_csr(m, n, nnz)
    x = gen.generate_vector(n, seed=2, dtype=np.float64)
    y = spmv(matrix_opt(a), x)
    assert y.dtype == jnp.float64
    assert_close(y, dense_from_csr(a) @ x)


@pytest.mark.parametrize("k", [1, 8, 64])
def test_f64_spmm(x64, k):
    m, n, nnz = 300, 200, 2500
    a = _f64_csr(m, n, nnz)
    b = gen.generate_dense(n, k, seed=3, dtype=np.float64)
    c = multiply(a, jnp.asarray(b))
    assert c.dtype == jnp.float64
    assert_close(c, dense_from_csr(a) @ b)


def test_f64_spgemm_two_phase(x64):
    m, k, n = 120, 90, 110
    a = _f64_csr(m, k, 900, seed=4)
    b = _f64_csr(k, n, 800, seed=5)
    info = multiply_compute(a, b)
    c = multiply_fill(info, a, b)
    assert c.dtype == jnp.float64
    expected = dense_from_csr(a) @ dense_from_csr(b)
    got = np.zeros((m, n))
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected)


def test_f64_triangular_solve(x64):
    m = 300
    a = gen.generate_triangular_csr(m, seed=6, lower=True,
                                    dtype=np.float64)
    b = gen.generate_vector(m, seed=7, dtype=np.float64)
    x = triangular_solve(a, b, uplo="lower", diag="explicit")
    assert x.dtype == jnp.float64
    # residual check at f64 tolerance
    assert_close(dense_from_csr(a) @ np.asarray(x), b, factor=512)


def test_f64_add_transpose_scaled(x64):
    m, n = 150, 130
    a = _f64_csr(m, n, 1200, seed=8)
    b = _f64_csr(m, n, 1100, seed=9)
    c = add(a, b)
    assert c.dtype == jnp.float64
    expected = dense_from_csr(a) + dense_from_csr(b)
    got = np.zeros((m, n))
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected)

    at = transpose(a)
    assert at.values.dtype == jnp.float64
    got_t = np.zeros((n, m))
    for (i, j), v in csr_entries(at).items():
        got_t[i, j] += v
    assert_close(got_t, dense_from_csr(a).T)

    x = gen.generate_vector(n, seed=10, dtype=np.float64)
    y = spmv(scaled(2.5, a), x)
    assert y.dtype == jnp.float64
    assert_close(y, 2.5 * (dense_from_csr(a) @ x))
