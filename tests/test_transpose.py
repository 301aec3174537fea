"""Transpose tests — mirrors test/gtest/transpose_test.cpp (COO
sort-and-compare oracle) + the lazy transposed view."""

import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import DIMS, assert_close, dense_from_csr


@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_transpose_materialized(m, n, nnz):
    a = gen.generate_csr(m, n, nnz, seed=0)
    b = sp.transpose(a)
    b.validate()
    assert b.shape == (n, m)
    assert_close(np.asarray(b.todense()), dense_from_csr(a).T)


def test_transpose_inspect():
    a = gen.generate_csr(30, 50, 200, seed=1)
    info = sp.transpose_inspect(a)
    assert info.result_shape == (50, 30)
    assert info.result_nnz == 200


def test_transpose_scaled():
    a = gen.generate_csr(25, 35, 150, seed=2)
    b = sp.transpose(sp.scaled(2.0, a))
    assert_close(np.asarray(b.todense()), 2.0 * dense_from_csr(a).T)


def test_transpose_capacity_check():
    a = gen.generate_csr(10, 10, 50, seed=3)
    with pytest.raises(RuntimeError):
        sp.transpose(a, capacity=10)


def test_scale():
    a = gen.generate_csr(20, 20, 100, seed=4)
    b = sp.scale(3.0, a)
    assert_close(np.asarray(b.todense()), 3.0 * dense_from_csr(a))
    x = gen.generate_vector(10, seed=5)
    assert_close(np.asarray(sp.scale(2.0, x)), 2.0 * x)
