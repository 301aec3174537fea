"""Edge cases: empty matrices (nnz=0), single-entry matrices, and
capacity==nnz tight fits through every op."""

import jax.numpy as jnp
import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.formats.csr import CSR
from spblas_tpu.utils import generate as gen


def _empty(m, n):
    return CSR.from_arrays(np.zeros(0, np.float32), np.zeros(m + 1),
                           np.zeros(0, np.int32), (m, n), nnz=0)


def test_empty_spmv():
    a = _empty(10, 8)
    y = sp.spmv(a, jnp.ones((8,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(y), 0)


def test_empty_spmm():
    a = _empty(6, 9)
    c = sp.spmm(a, jnp.ones((9, 4), jnp.float32))
    np.testing.assert_array_equal(np.asarray(c), 0)


def test_empty_spgemm():
    a = _empty(5, 5)
    b = gen.generate_csr(5, 5, 10, seed=0)
    info = sp.multiply_compute(a, b)
    assert info.result_nnz == 0
    c = sp.multiply_fill(info, a, b)
    np.testing.assert_array_equal(np.asarray(c.todense()), 0)


def test_empty_plus_something():
    a = _empty(7, 7)
    b = gen.generate_csr(7, 7, 15, seed=1)
    c = sp.add(a, b)
    np.testing.assert_allclose(np.asarray(c.todense()),
                               np.asarray(b.todense()))


def test_empty_transpose():
    t = sp.transpose(_empty(4, 6))
    assert t.shape == (6, 4)
    assert int(t.nnz) == 0


def test_single_entry_ops():
    a = CSR.from_arrays(np.asarray([3.0], np.float32),
                        np.asarray([0, 0, 1, 1]),
                        np.asarray([2], np.int32), (3, 4), nnz=1)
    y = sp.spmv(a, jnp.arange(4, dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(y), [0, 6.0, 0])
    t = sp.transpose(a)
    assert np.asarray(t.todense())[2, 1] == 3.0


def test_tight_capacity_spgemm():
    """c_capacity exactly equal to result_nnz must work (no slack)."""
    a = gen.generate_csr(10, 10, 30, seed=2)
    info = sp.multiply_compute(a, a)
    info2 = sp.multiply_compute(a, a, c_capacity=info.result_nnz)
    c = sp.multiply_fill(info2, a, a)
    expected = np.asarray(a.todense()) @ np.asarray(a.todense())
    np.testing.assert_allclose(np.asarray(c.todense()), expected,
                               rtol=1e-4)


def test_identity_triangular_solve():
    m = 12
    eye = CSR.from_dense(np.eye(m, dtype=np.float32))
    b = gen.generate_vector(m, seed=3)
    x = sp.triangular_solve(eye, b, uplo="lower")
    np.testing.assert_allclose(np.asarray(x), np.asarray(b), rtol=1e-6)
