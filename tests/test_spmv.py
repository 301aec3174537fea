"""SpMV oracle tests — mirrors test/gtest/spmv_test.cpp coverage:
plain, scaled-A, scaled-x, CSC, COO, jit, complex conjugated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import DIMS, assert_close, dense_from_csr, dense_from_csc


@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_spmv_csr(m, n, nnz):
    a = gen.generate_csr(m, n, nnz, seed=0)
    x = gen.generate_vector(n, seed=1)
    y = sp.multiply(a, x)
    assert_close(np.asarray(y), dense_from_csr(a) @ x)


@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_spmv_scaled(m, n, nnz):
    a = gen.generate_csr(m, n, nnz, seed=0)
    x = gen.generate_vector(n, seed=1)
    y = sp.multiply(sp.scaled(2.0, a), x)
    assert_close(np.asarray(y), 2.0 * (dense_from_csr(a) @ x))
    y2 = sp.multiply(a, sp.scaled(-0.5, x))
    assert_close(np.asarray(y2), -0.5 * (dense_from_csr(a) @ x))
    # nested scaling folds multiplicatively (view_inspectors.hpp:22-77)
    y3 = sp.multiply(sp.scaled(2.0, sp.scaled(3.0, a)), x)
    assert_close(np.asarray(y3), 6.0 * (dense_from_csr(a) @ x))


@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_spmv_csc(m, n, nnz):
    a = gen.generate_csc(m, n, nnz, seed=2)
    x = gen.generate_vector(n, seed=3)
    y = sp.multiply(a, x)
    assert_close(np.asarray(y), dense_from_csc(a) @ x)


def test_spmv_coo():
    a = gen.generate_coo(80, 60, 500, seed=4)
    x = gen.generate_vector(60, seed=5)
    y = sp.multiply(a, x)
    assert_close(np.asarray(y), np.asarray(a.todense()) @ x)


def test_spmv_jit():
    a = gen.generate_csr(100, 100, 500, seed=6)
    x = gen.generate_vector(100, seed=7)
    y = jax.jit(sp.spmv)(a, x)
    assert_close(np.asarray(y), dense_from_csr(a) @ x)


def test_spmv_transposed_view():
    a = gen.generate_csr(50, 70, 300, seed=8)
    x = gen.generate_vector(50, seed=9)
    y = sp.multiply(sp.transposed(a), x)
    assert_close(np.asarray(y), dense_from_csr(a).T @ x)


def test_spmv_conjugated_complex():
    a = gen.generate_csr(40, 40, 200, seed=10, dtype=np.complex64,
                         complex_=True)
    x = gen.generate_vector(40, seed=11, dtype=np.complex64, complex_=True)
    y = sp.multiply(sp.conjugated(a), x)
    # conjugate tests loosen to 256*eps (conjugate_test.cpp:18-37)
    assert_close(np.asarray(y), np.conj(dense_from_csr(a)) @ x, factor=256,
                 abs_floor=1e-2)
    # conjugated of real matrix is identity (conjugated_impl.hpp:12-28)
    ar = gen.generate_csr(40, 40, 200, seed=12)
    assert sp.conjugated(ar) is ar


def test_spmv_dim_mismatch_raises():
    a = gen.generate_csr(10, 20, 50, seed=13)
    x = gen.generate_vector(10, seed=14)
    with pytest.raises(ValueError):
        sp.multiply(a, x)
