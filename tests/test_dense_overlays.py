"""Dense-operand semantics — the mdspan-overlays analogue
(test/gtest/mdspan_overlays.cpp): dense matrices flow through the same
polymorphic ops, including transposed views and the dense·sparse operand
order the reference reaches via mdspan row iteration."""

import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import assert_close


def test_dense_dense_multiply():
    a = gen.generate_gaussian(40, 30, seed=0)
    b = gen.generate_gaussian(30, 20, seed=1)
    c = sp.multiply(a, b)
    assert_close(np.asarray(c), np.asarray(a) @ np.asarray(b),
                 factor=256)


def test_dense_transposed_view():
    a = gen.generate_gaussian(30, 40, seed=2)
    x = gen.generate_gaussian(1, 30, seed=3)[0]
    y = sp.multiply(sp.transposed(a), x)
    assert_close(np.asarray(y), np.asarray(a).T @ np.asarray(x),
                 factor=256)


def test_dense_times_sparse():
    a = gen.generate_gaussian(25, 40, seed=4)
    b = gen.generate_csr(40, 35, 300, seed=5)
    c = sp.multiply(a, b)
    assert_close(np.asarray(c), np.asarray(a) @ np.asarray(b.todense()),
                 factor=1024)


def test_dense_times_sparse_scaled():
    a = gen.generate_gaussian(20, 30, seed=6)
    b = gen.generate_csr(30, 25, 200, seed=7)
    c = sp.multiply(sp.scaled(2.0, a), sp.scaled(3.0, b))
    expected = 6.0 * (np.asarray(a) @ np.asarray(b.todense()))
    assert_close(np.asarray(c), expected, factor=1024)


def test_scaled_dense_add():
    a = gen.generate_gaussian(15, 15, seed=8)
    b = gen.generate_gaussian(15, 15, seed=9)
    c = sp.add(sp.scaled(2.0, a), b)
    assert_close(np.asarray(c), 2.0 * np.asarray(a) + np.asarray(b),
                 factor=256)


def test_column_major_dense_operands():
    """F-ordered (column-major) numpy inputs — the reference's
    layout_left mdspan overlays (test/gtest/mdspan_overlays.cpp:58-104).
    jnp canonicalizes the layout on ingest (one copy), so results must
    be identical to the C-ordered calls; this test pins that the copy
    happens and no axis transposition sneaks in."""
    import jax.numpy as jnp
    a = gen.generate_csr(40, 30, 240, seed=10)
    bC = np.asarray(gen.generate_gaussian(30, 12, seed=11))
    bF = np.asfortranarray(bC)
    assert not bF.flags.c_contiguous
    cC = np.asarray(sp.multiply(a, jnp.asarray(bC)))
    cF = np.asarray(sp.multiply(a, jnp.asarray(bF)))
    np.testing.assert_array_equal(cC, cF)
    # dense x dense with one F operand
    dC = np.asarray(gen.generate_gaussian(12, 9, seed=12))
    eC = np.asarray(sp.multiply(jnp.asarray(bC), jnp.asarray(dC)))
    eF = np.asarray(sp.multiply(jnp.asarray(bF),
                                jnp.asarray(np.asfortranarray(dC))))
    np.testing.assert_allclose(eC, eF, rtol=1e-6)
