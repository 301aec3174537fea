"""SpGEMM tests — mirrors test/gtest/spgemm_test.cpp (two-phase protocol,
scaled views, matrix_opt) + device/spgemm_reuse_test.cpp (reuse state) +
device/rocsparse/spgemm_4args_test.cpp (fused C = aAB + bD) +
spgemm_csr_csc.cpp (mixed formats)."""

import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from spblas_tpu.utils import generate as g
from tests.util import SQUARE_DIMS, assert_close, csr_entries, \
    dense_from_csr


def _oracle(da, db):
    return da @ db


def _check_csr_result(c, expected, factor=64):
    """Compare a CSR result against a dense oracle, tolerating duplicate
    (i, j) entries like the reference oracle (spgemm_test.cpp:44-68)."""
    got = np.zeros_like(expected)
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected, factor=factor, abs_floor=1e-3)


@pytest.mark.parametrize("m,n,nnz", SQUARE_DIMS)
def test_spgemm_two_phase(m, n, nnz):
    """The canonical protocol: compute → allocate → fill
    (examples/simple_spgemm.cpp:45-60)."""
    a = gen.generate_csr(m, 50, nnz, seed=0)
    b = gen.generate_csr(50, n, nnz, seed=1)
    info = sp.multiply_compute(a, b)
    expected = _oracle(dense_from_csr(a), dense_from_csr(b))
    assert info.result_shape == (m, n)
    assert info.result_nnz == np.count_nonzero(
        _oracle(dense_from_csr(a) != 0, dense_from_csr(b) != 0))
    c = sp.multiply_fill(info, a, b)
    c.validate()
    assert int(c.nnz) == info.result_nnz
    _check_csr_result(c, expected)


def test_spgemm_one_shot():
    a = gen.generate_csr(100, 10, 100, seed=2)
    b = gen.generate_csr(10, 100, 100, seed=3)
    c = sp.multiply(a, b)
    _check_csr_result(c, _oracle(dense_from_csr(a), dense_from_csr(b)))


def test_spgemm_scaled():
    a = gen.generate_csr(40, 40, 400, seed=4)
    b = gen.generate_csr(40, 40, 400, seed=5)
    info = sp.multiply_compute(sp.scaled(2.0, a), b)
    c = sp.multiply_fill(info, sp.scaled(2.0, a), b)
    _check_csr_result(c, 2.0 * _oracle(dense_from_csr(a),
                                       dense_from_csr(b)))


def test_spgemm_a_squared():
    """C = A·A, the headline two-phase benchmark shape
    (BASELINE.json configs[2])."""
    a = gen.generate_csr(64, 64, 512, seed=6)
    c = sp.multiply(a, a)
    da = dense_from_csr(a)
    _check_csr_result(c, da @ da)


def test_spgemm_csc_operands():
    """Mixed-format operands canonicalize (spgemm_csr_csc.cpp coverage)."""
    a = gen.generate_csc(30, 40, 300, seed=7)
    b = gen.generate_csr(40, 20, 200, seed=8)
    from tests.util import dense_from_csc
    c = sp.multiply(a, b)
    _check_csr_result(c, _oracle(dense_from_csc(a), dense_from_csr(b)))
    c2 = sp.multiply(b, sp.transposed(b))
    db = dense_from_csr(b)
    _check_csr_result(c2, db @ db.T)


def test_spgemm_reuse_state():
    """rocSPARSE-style symbolic/numeric split: numeric re-runs with new
    values, same sparsity (device/spgemm_reuse_test.cpp:42-70)."""
    a = gen.generate_csr(50, 50, 400, seed=9)
    b = gen.generate_csr(50, 50, 400, seed=10)
    state = sp.SpgemmState()
    sp.multiply_symbolic_compute(state, a, b)
    c_struct = sp.multiply_symbolic_fill(state, a, b)
    assert int(c_struct.nnz) == state.info.result_nnz
    for it in range(3):
        a2 = a.update(values=np.asarray(a.values) * (it + 1))
        c = sp.multiply_numeric(state, a2, b)
        _check_csr_result(c, (it + 1) * _oracle(dense_from_csr(a),
                                                dense_from_csr(b)))


def test_spgemm_4arg_fused():
    """C = alpha*A*B + beta*D (multiply_spgemm.hpp:232-317)."""
    a = gen.generate_csr(30, 30, 200, seed=11)
    b = gen.generate_csr(30, 30, 200, seed=12)
    d = gen.generate_csr(30, 30, 150, seed=13)
    state = sp.SpgemmState()
    c = sp.multiply_fused(state, sp.scaled(2.0, a), b, sp.scaled(-1.0, d))
    expected = 2.0 * _oracle(dense_from_csr(a), dense_from_csr(b)) \
        - dense_from_csr(d)
    _check_csr_result(c, expected)
    # null-D shortcut (multiply_spgemm.hpp null-D path)
    c2 = sp.multiply_fused(sp.SpgemmState(), a, b, None)
    _check_csr_result(c2, _oracle(dense_from_csr(a), dense_from_csr(b)))


def test_spgemm_capacity_overflow_raises():
    a = gen.generate_csr(20, 20, 100, seed=14)
    b = gen.generate_csr(20, 20, 100, seed=15)
    info = sp.multiply_compute(a, b)
    with pytest.raises(RuntimeError):
        sp.multiply_compute(a, b, c_capacity=max(info.result_nnz // 2, 1))


def test_spgemm_user_owned_capacity():
    """User allocates a bigger-than-needed C (capacity handshake)."""
    a = gen.generate_csr(25, 25, 150, seed=16)
    b = gen.generate_csr(25, 25, 150, seed=17)
    info = sp.multiply_compute(a, b, c_capacity=4096)
    c = sp.multiply_fill(info, a, b)
    assert c.capacity == 4096
    _check_csr_result(c, _oracle(dense_from_csr(a), dense_from_csr(b)))


@pytest.mark.parametrize("fmt_a", ["csr", "csc", "coo"])
@pytest.mark.parametrize("fmt_b", ["csr", "csc", "coo"])
def test_spgemm_all_format_positions(fmt_a, fmt_b):
    """Mixed-format operands in every position — mirrors
    test/gtest/spgemm_csr_csc.cpp's combinatorial coverage."""
    m, k, n = 40, 50, 30
    gen = {"csr": g.generate_csr, "csc": g.generate_csc,
           "coo": g.generate_coo}
    a = gen[fmt_a](m, k, 300, seed=1)
    b = gen[fmt_b](k, n, 350, seed=2)
    c = sp.multiply(a, b)
    expected = np.asarray(a.todense()) @ np.asarray(b.todense())
    assert_close(np.asarray(c.todense()), expected, factor=256)


def test_spgemm_transposed_operand():
    m, k, n = 30, 40, 35
    at = g.generate_csr(k, m, 300, seed=3)   # A^T stored
    b = g.generate_csr(k, n, 300, seed=4)
    c = sp.multiply(sp.transposed(at), b)
    expected = np.asarray(at.todense()).T @ np.asarray(b.todense())
    assert_close(np.asarray(c.todense()), expected, factor=256)


def test_spgemm_csc_result():
    """CSC result via the transpose trick (spgemm_gustavsons.hpp:97-127
    semantics): zero-cost reinterpretation of CSR(C^T)."""
    from spblas_tpu import CSC, spgemm_csc
    m, k, n = 30, 40, 35
    a = g.generate_csr(m, k, 300, seed=5)
    b = g.generate_csr(k, n, 300, seed=6)
    c = spgemm_csc(a, b)
    assert isinstance(c, CSC)
    expected = np.asarray(a.todense()) @ np.asarray(b.todense())
    assert_close(np.asarray(c.todense()), expected, factor=256)


@pytest.mark.parametrize("chunk", [16, 50, 200])
def test_spgemm_chunked_matches_monolithic(chunk):
    """Row-chunked expansion (bounded memory) must match the one-shot
    product exactly in structure and values."""
    from spblas_tpu import spgemm_chunked
    a = g.generate_csr(137, 100, 1200, seed=10)
    b = g.generate_csr(100, 90, 900, seed=11)
    c1 = spgemm_chunked(sp.scaled(2.0, a), b, rows_per_chunk=chunk)
    expected = 2.0 * np.asarray(a.todense()) @ np.asarray(b.todense())
    assert_close(np.asarray(c1.todense()), expected, factor=256)
