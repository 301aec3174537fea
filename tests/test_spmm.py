"""SpMM oracle tests — mirrors test/gtest/spmm_test.cpp: CSR/CSC x dense B,
n-column sweep {1, 8, 32, 64, 512} (spmm_test.cpp:11), scaled variants."""

import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import assert_close, dense_from_csr, dense_from_csc

NCOLS = [1, 8, 32, 64, 512]


@pytest.mark.parametrize("ncols", NCOLS)
def test_spmm_csr(ncols):
    m, k, nnz = 200, 100, 2000
    a = gen.generate_csr(m, k, nnz, seed=0)
    b = gen.generate_dense(k, ncols, seed=1)
    c = sp.multiply(a, b)
    assert_close(np.asarray(c), dense_from_csr(a) @ b)


@pytest.mark.parametrize("ncols", [8, 64])
def test_spmm_csc(ncols):
    m, k, nnz = 100, 150, 1500
    a = gen.generate_csc(m, k, nnz, seed=2)
    b = gen.generate_dense(k, ncols, seed=3)
    c = sp.multiply(a, b)
    assert_close(np.asarray(c), dense_from_csc(a) @ b)


def test_spmm_scaled():
    m, k, ncols = 60, 80, 16
    a = gen.generate_csr(m, k, 600, seed=4)
    b = gen.generate_dense(k, ncols, seed=5)
    c = sp.multiply(sp.scaled(3.0, a), sp.scaled(0.5, b))
    assert_close(np.asarray(c), 1.5 * dense_from_csr(a) @ b)


def test_spmm_dense_dense():
    a = gen.generate_dense(32, 48, seed=6)
    b = gen.generate_dense(48, 16, seed=7)
    c = sp.multiply(a, b)
    assert_close(np.asarray(c), a @ b, factor=128)
