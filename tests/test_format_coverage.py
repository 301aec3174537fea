"""Format × op coverage: every sparse container works through add / to_csc.

Round-2 regression for the round-1 gaps: ``add(BSR, ...)`` / ``add(DCSR,
...)`` fell into the dense branch and crashed, and ``to_csc`` rejected
DCSR/BSR (reference parity bar: any view convertible to csr_view feeds any
algorithm, include/spblas/backend/view_customizations.hpp).
"""

import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu.formats.bsr import BSR
from spblas_tpu.formats.convert import to_csc, to_csr
from spblas_tpu.utils import generate as gen
from tests.util import assert_close, csr_entries, dense_from_csr


def _dense_of(a):
    return np.asarray(to_csr(a).todense())


def _make(fmt, m, n, nnz, seed):
    if fmt == "csr":
        return gen.generate_csr(m, n, nnz, seed=seed)
    if fmt == "csc":
        return gen.generate_csc(m, n, nnz, seed=seed)
    if fmt == "coo":
        return gen.generate_coo(m, n, nnz, seed=seed)
    if fmt == "dcsr":
        return gen.generate_dcsr(m, n, nnz, seed=seed)
    if fmt == "bsr":
        dense = np.zeros((m, n), np.float32)
        rng = np.random.default_rng(seed)
        # a handful of dense 8x8 blocks
        for _ in range(max(nnz // 64, 1)):
            bi = rng.integers(0, m // 8) * 8
            bj = rng.integers(0, n // 8) * 8
            dense[bi:bi + 8, bj:bj + 8] = rng.standard_normal((8, 8))
        return BSR.from_dense(dense, block_shape=(8, 8))
    raise AssertionError(fmt)


FORMATS = ["csr", "csc", "coo", "dcsr", "bsr"]


@pytest.mark.parametrize("fmt_a", FORMATS)
@pytest.mark.parametrize("fmt_b", ["csr", "bsr", "dcsr"])
def test_add_any_format_pair(fmt_a, fmt_b):
    m, n = 64, 48
    a = _make(fmt_a, m, n, 120, seed=10)
    b = _make(fmt_b, m, n, 140, seed=11)
    expected = _dense_of(a) + _dense_of(b)
    c = sp.add(a, b)
    got = np.zeros_like(expected)
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected, factor=64, abs_floor=1e-3)


@pytest.mark.parametrize("fmt", ["dcsr", "bsr", "coo"])
def test_to_csc_all_formats(fmt):
    m, n = 64, 48
    a = _make(fmt, m, n, 120, seed=12)
    c = to_csc(a)
    colptr = np.asarray(c.colptr)
    rowind = np.asarray(c.rowind)
    values = np.asarray(c.values)
    out = np.zeros((m, n), np.float32)
    nnz = int(c.nnz)
    for j in range(n):
        for e in range(colptr[j], min(colptr[j + 1], nnz)):
            out[rowind[e], j] += values[e]
    assert_close(out, _dense_of(a), factor=16)


def test_add_bsr_scaled_view():
    m = n = 64
    a = _make("bsr", m, n, 256, seed=13)
    b = _make("csr", m, n, 100, seed=14)
    c = sp.add(sp.scaled(2.0, a), b)
    expected = 2.0 * _dense_of(a) + _dense_of(b)
    got = np.zeros_like(expected)
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected, factor=64, abs_floor=1e-3)
