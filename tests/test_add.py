"""SpADD tests — mirrors test/gtest/add_test.cpp: vector, dense, CSR
two-phase union, scaled variants."""

import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import SQUARE_DIMS, assert_close, csr_entries, \
    dense_from_csr


def _check(c, expected, factor=64):
    got = np.zeros_like(expected)
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected, factor=factor, abs_floor=1e-3)


def test_add_vectors():
    x = gen.generate_vector(100, seed=0)
    y = gen.generate_vector(100, seed=1)
    assert_close(np.asarray(sp.add(x, y)), x + y)
    assert_close(np.asarray(sp.add(sp.scaled(2.0, x), y)), 2 * x + y)


def test_add_dense():
    a = gen.generate_dense(30, 40, seed=2)
    b = gen.generate_dense(30, 40, seed=3)
    assert_close(np.asarray(sp.add(a, b)), a + b)


@pytest.mark.parametrize("m,n,nnz", SQUARE_DIMS)
def test_add_csr_two_phase(m, n, nnz):
    a = gen.generate_csr(m, n, nnz, seed=4)
    b = gen.generate_csr(m, n, nnz, seed=5)
    info = sp.add_inspect(a, b)
    union = np.count_nonzero((dense_from_csr(a) != 0) |
                             (dense_from_csr(b) != 0))
    assert info.result_nnz == union
    c = sp.add_compute(info, a, b)
    c.validate()
    _check(c, dense_from_csr(a) + dense_from_csr(b))


def test_add_csr_scaled():
    a = gen.generate_csr(50, 50, 300, seed=6)
    b = gen.generate_csr(50, 50, 300, seed=7)
    c = sp.add(sp.scaled(2.0, a), sp.scaled(-1.0, b))
    _check(c, 2 * dense_from_csr(a) - dense_from_csr(b))


def test_add_sparse_dense():
    a = gen.generate_csr(20, 30, 100, seed=8)
    b = gen.generate_dense(20, 30, seed=9)
    c = sp.add(a, b)
    assert_close(np.asarray(c), dense_from_csr(a) + b)


def test_add_shape_mismatch_raises():
    a = gen.generate_csr(10, 10, 20, seed=10)
    b = gen.generate_csr(10, 11, 20, seed=11)
    with pytest.raises(ValueError):
        sp.add(a, b)
