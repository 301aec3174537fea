"""View algebra: folding, nesting, conjugation parity, matrix_opt caching.
Mirrors detail/view_inspectors.hpp semantics + conjugate_test.cpp."""

import numpy as np
import pytest

import spblas_tpu as sp
from spblas_tpu import views as v
from spblas_tpu.utils import generate as gen
from tests.util import assert_close, dense_from_csr


def test_scaling_factor_product():
    a = gen.generate_csr(10, 10, 30, seed=0)
    w = sp.scaled(2.0, sp.scaled(3.0, a))
    assert float(v.get_scaling_factor(w)) == 6.0
    assert v.get_ultimate_base(w) is a


def test_conjugation_parity():
    a = gen.generate_csr(10, 10, 30, seed=1, dtype=np.complex64,
                         complex_=True)
    c1 = sp.conjugated(a)
    assert v.is_conjugated(c1)
    c2 = sp.conjugated(c1)
    assert c2 is a  # conj(conj(x)) folds back to x
    nested = sp.scaled(2.0, sp.conjugated(sp.scaled(3.0, a)))
    assert v.is_conjugated(nested)
    assert complex(v.get_scaling_factor(nested)) == 6.0


def test_matrix_opt_plan_cache():
    """matrix_opt caches per-op plans lazily, like the oneMKL handle cache
    (views/matrix_opt_impl.hpp:90-92)."""
    a = gen.generate_csr(20, 20, 100, seed=2)
    opt = sp.matrix_opt(a)
    calls = []

    def builder(base):
        calls.append(1)
        return "plan"

    assert opt.get_plan("spmv", builder) == "plan"
    assert opt.get_plan("spmv", builder) == "plan"
    assert len(calls) == 1  # built once
    assert sp.matrix_opt(opt) is opt


def test_matrix_opt_transparent_in_ops():
    a = gen.generate_csr(30, 30, 200, seed=3)
    x = gen.generate_vector(30, seed=4)
    y = sp.multiply(sp.matrix_opt(a), x)
    assert_close(np.asarray(y), dense_from_csr(a) @ x)
    # scaled(matrix_opt(A)) composes (spgemm_test.cpp matrix_opt coverage)
    y2 = sp.multiply(sp.scaled(2.0, sp.matrix_opt(a)), x)
    assert_close(np.asarray(y2), 2 * (dense_from_csr(a) @ x))


def test_views_are_pytrees():
    import jax
    a = gen.generate_csr(10, 10, 30, seed=5)
    w = sp.scaled(2.0, a)
    leaves = jax.tree_util.tree_leaves(w)
    assert len(leaves) >= 4  # alpha + csr arrays
    w2 = jax.tree_util.tree_map(lambda x: x, w)
    assert isinstance(w2, sp.ScaledView)
