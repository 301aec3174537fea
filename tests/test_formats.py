"""Container round-trips, padding invariants, conversions, lazy transpose.

Coverage model follows the reference's view/format tests
(test/gtest/mdspan_overlays.cpp, spgemm_csr_csc.cpp format plumbing).
"""

import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import DIMS, assert_close, dense_from_csr, dense_from_csc


@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_csr_roundtrip(m, n, nnz):
    a = gen.generate_csr(m, n, nnz, seed=1)
    a.validate()
    dense = dense_from_csr(a)
    assert_close(np.asarray(a.todense()), dense)
    b = sp.CSR.from_dense(dense)
    b.validate()
    assert_close(np.asarray(b.todense()), dense)


@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_csc_roundtrip(m, n, nnz):
    a = gen.generate_csc(m, n, nnz, seed=2)
    a.validate()
    dense = dense_from_csc(a)
    assert_close(np.asarray(a.todense()), dense)


def test_coo_roundtrip():
    a = gen.generate_coo(50, 60, 300, seed=3)
    a.validate()
    csr = a.to_csr()
    csr.validate()
    assert_close(np.asarray(csr.todense()), np.asarray(a.todense()))


@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_conversions(m, n, nnz):
    a = gen.generate_csr(m, n, nnz, seed=4)
    dense = dense_from_csr(a)
    csc = sp.to_csc(a)
    csc.validate()
    assert_close(np.asarray(csc.todense()), dense)
    back = sp.to_csr(csc)
    back.validate()
    assert_close(np.asarray(back.todense()), dense)
    coo = sp.to_coo(csc)
    coo.validate()
    assert_close(np.asarray(coo.todense()), dense)


def test_transposed_view_zero_cost():
    """transposed(CSR) reinterprets as CSC over the same arrays
    (algorithms/transposed.hpp:7-22 semantics)."""
    a = gen.generate_csr(30, 50, 200, seed=5)
    at = sp.transposed(a)
    assert isinstance(at, sp.CSC)
    assert at.shape == (50, 30)
    assert at.values is a.values  # no copy
    assert_close(np.asarray(at.todense()), dense_from_csr(a).T)
    # double transpose round-trips
    att = sp.transposed(at)
    assert isinstance(att, sp.CSR)
    assert_close(np.asarray(att.todense()), dense_from_csr(a))


def test_bsr_roundtrip():
    rng = np.random.default_rng(0)
    dense = rng.normal(size=(64, 96)).astype(np.float32)
    dense[rng.random((64, 96)) < 0.5] = 0
    a = sp.BSR.from_dense(dense, block_shape=(16, 16))
    assert_close(np.asarray(a.todense()), dense)


def test_capacity_padding_and_update():
    a = gen.generate_csr(10, 10, 30, seed=6, capacity=64)
    assert a.capacity == 64
    a.validate()
    # functional update() rebinding (csr_view.hpp:36-49 analogue)
    b = a.update(values=np.asarray(a.values) * 2)
    assert_close(np.asarray(b.todense()), 2 * dense_from_csr(a))


def test_validate_catches_corruption():
    a = gen.generate_csr(10, 10, 30, seed=7)
    bad = sp.CSR(values=a.values, rowptr=a.rowptr,
                 colind=a.colind.at[0].set(99), nnz=a.nnz, shape=a.shape)
    with pytest.raises(ValueError):
        bad.validate()


def test_dcsr_roundtrip():
    from spblas_tpu.formats.dcsr import DCSR
    from spblas_tpu.utils.generate import generate_dcsr
    import numpy as np
    d = generate_dcsr(100, 50, 120, seed=0)
    back = d.to_csr()
    np.testing.assert_allclose(np.asarray(back.todense()),
                               np.asarray(d.todense()))
    # hypersparse: far fewer stored rows than m
    assert int(d.nrows) < 100
    # round-trip through CSR again
    d2 = DCSR.from_csr(back)
    np.testing.assert_allclose(np.asarray(d2.todense()),
                               np.asarray(d.todense()))


def test_dcsr_spmv_via_csr():
    import numpy as np
    import spblas_tpu as sp
    from spblas_tpu.utils.generate import generate_dcsr, generate_vector
    d = generate_dcsr(80, 60, 100, seed=1)
    x = generate_vector(60, seed=2)
    y = sp.multiply(d.to_csr(), x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(d.todense()) @ np.asarray(x),
                               rtol=1e-4)


def test_bsr_through_multiply():
    import numpy as np
    import spblas_tpu as sp
    from spblas_tpu.formats.bsr import BSR
    from spblas_tpu.formats.convert import to_csr
    rng = np.random.default_rng(3)
    dense = np.zeros((32, 256), np.float32)
    dense[:8, 128:] = rng.standard_normal((8, 128))
    dense[16:24, :128] = rng.standard_normal((8, 128))
    a = BSR.from_dense(dense, (8, 128))
    x = rng.standard_normal(256).astype(np.float32)
    y = sp.multiply(a, x)
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-4,
                               atol=1e-4)
    # BSR → CSR conversion parity
    np.testing.assert_allclose(np.asarray(to_csr(a).todense()), dense)
