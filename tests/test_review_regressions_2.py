"""Regression tests for the third review batch."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import assert_close


def test_spgemm_fill_d_mismatch_raises():
    a = gen.generate_csr(20, 20, 60, seed=0)
    b = gen.generate_csr(20, 20, 60, seed=1)
    d = gen.generate_csr(20, 20, 40, seed=2)
    from spblas_tpu.ops.spgemm import spgemm_compute, spgemm_fill
    info_d = spgemm_compute(a, b, d_view=d)
    with pytest.raises(ValueError):
        spgemm_fill(info_d, a, b)            # forgot d
    info = spgemm_compute(a, b)
    with pytest.raises(ValueError):
        spgemm_fill(info, a, b, d_view=d)    # plan has no D structure
    # and the correct pairing still works
    c = spgemm_fill(info_d, a, b, d_view=d)
    expected = (np.asarray(a.todense()) @ np.asarray(b.todense())
                + np.asarray(d.todense()))
    assert_close(np.asarray(c.todense()), expected, factor=256)


def test_trsv_complex_scaled_keeps_imaginary():
    L = gen.generate_triangular_csr(30, seed=3, lower=True)
    b = jnp.asarray(gen.generate_vector(30, seed=4))
    x = sp.triangular_solve(sp.scaled(2j, L), b, uplo="lower")
    assert jnp.iscomplexobj(x)
    dense = 2j * np.asarray(L.todense()).astype(np.complex64)
    np.testing.assert_allclose(np.abs(dense @ np.asarray(x)
                                      - np.asarray(b)).max(), 0,
                               atol=1e-3)


def test_scale_bsr_and_dcsr():
    from spblas_tpu.formats.bsr import BSR
    rng = np.random.default_rng(5)
    dense = np.zeros((16, 256), np.float32)
    dense[:8, :128] = rng.standard_normal((8, 128))
    bsr = BSR.from_dense(dense, (8, 128))
    scaled = sp.scale(3.0, bsr)
    np.testing.assert_allclose(np.asarray(scaled.todense()), 3.0 * dense)
    d = gen.generate_dcsr(40, 30, 60, seed=6)
    sd = sp.scale(-2.0, d)
    np.testing.assert_allclose(np.asarray(sd.todense()),
                               -2.0 * np.asarray(d.todense()))


def test_generate_triangular_unit_zero_density():
    L = gen.generate_triangular_csr(5, seed=7, unit_diag=True,
                                    density=0.0)
    assert int(L.nnz) == 0
    x = sp.triangular_solve(L, jnp.ones((5,), jnp.float32),
                            uplo="lower", diag="unit")
    np.testing.assert_allclose(np.asarray(x), 1.0)


def test_csr_to_coo_canonical_padding():
    a = gen.generate_csr(10, 10, 20, seed=8, capacity=64)
    from spblas_tpu.formats.convert import to_coo
    coo = to_coo(a)
    coo.validate()
    nnz = int(coo.nnz)
    assert (np.asarray(coo.rowind)[nnz:] == 0).all()


def test_multiply_inspect_spmv_shape():
    a = gen.generate_csr(12, 9, 30, seed=9)
    x = jnp.ones((9,), jnp.float32)
    info = sp.multiply_inspect(a, x)
    assert info.result_shape == (12,)
    assert sp.multiply(a, x).shape == info.result_shape


def test_mm_complex_loads(tmp_path):
    # complex coordinate files load as complex64 CSR since round 4
    # (utils/io.py python fallback); this test previously asserted
    # rejection and went stale when support landed mid-round.
    from spblas_tpu.utils.io import load_matrix_market
    p = str(tmp_path / "c.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate complex general\n")
        f.write("2 2 1\n1 1 1.0 2.0\n")
    a = load_matrix_market(p)
    dense = np.asarray(a.todense())
    assert dense.dtype == np.complex64
    np.testing.assert_allclose(dense, [[1.0 + 2.0j, 0.0], [0.0, 0.0]])


def test_mm_hermitian_real_expands(tmp_path):
    from spblas_tpu.utils.io import load_matrix_market
    p = str(tmp_path / "h.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real hermitian\n")
        f.write("2 2 2\n1 1 2.0\n2 1 -1.0\n")
    a = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(a.todense()),
                               [[2.0, -1.0], [-1.0, 0.0]])


def test_native_coo_to_csr_does_not_mutate_inputs():
    from spblas_tpu import native
    rows = np.asarray([1, 0, 1], np.int32)
    cols = np.asarray([0, 1, 1], np.int32)
    vals = np.asarray([1.0, 2.0, 3.0], np.float64)
    rows_copy = rows.copy()
    native.coo_to_csr(2, rows, cols, vals)
    np.testing.assert_array_equal(rows, rows_copy)
