"""JAX transform compatibility: vmap over operands, jit of composite
pipelines, int-valued matrices (the reference templates over T; here the
dtype rides the arrays)."""

import jax
import jax.numpy as jnp
import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils import generate as gen
from tests.util import assert_close


def test_vmap_spmv_over_x():
    a = gen.generate_csr(40, 50, 300, seed=0)
    xs = jnp.asarray(np.random.default_rng(1)
                     .standard_normal((8, 50)).astype(np.float32))
    ys = jax.vmap(lambda x: sp.spmv(a, x))(xs)
    dense = np.asarray(a.todense())
    for i in range(8):
        assert_close(np.asarray(ys[i]), dense @ np.asarray(xs[i]),
                     factor=256)


def test_vmap_spmv_over_values():
    import dataclasses
    a = gen.generate_csr(30, 30, 200, seed=2)
    x = jnp.asarray(gen.generate_vector(30, seed=3))
    scales = jnp.asarray([1.0, 2.0, -0.5], jnp.float32)

    def f(s):
        a2 = dataclasses.replace(a, values=a.values * s)
        return sp.spmv(a2, x)

    ys = jax.vmap(f)(scales)
    base = np.asarray(a.todense()) @ np.asarray(x)
    for i, s in enumerate([1.0, 2.0, -0.5]):
        assert_close(np.asarray(ys[i]), s * base, factor=256)


def test_jit_composite_pipeline():
    a = gen.generate_csr(25, 25, 150, seed=4)
    b = gen.generate_csr(25, 25, 150, seed=5)
    info = sp.add_inspect(a, b)

    @jax.jit
    def pipeline(a, b, x):
        s = sp.add_compute(info, a, b)
        return sp.spmv(sp.scaled(0.5, s), x)

    x = jnp.asarray(gen.generate_vector(25, seed=6))
    y = pipeline(a, b, x)
    expected = 0.5 * (np.asarray(a.todense())
                      + np.asarray(b.todense())) @ np.asarray(x)
    assert_close(np.asarray(y), expected, factor=256)


def test_int_valued_matrix():
    """Integer values flow through SpMV exactly (the reference's
    EXPECT_EQ_ compares integers exactly, util.hpp:7-23)."""
    from spblas_tpu.formats.csr import CSR
    dense = np.zeros((10, 10), np.int32)
    rng = np.random.default_rng(7)
    idx = rng.choice(100, 30, replace=False)
    dense[idx // 10, idx % 10] = rng.integers(-50, 50, 30)
    a = CSR.from_dense(dense)
    x = jnp.asarray(rng.integers(-10, 10, 10).astype(np.int32))
    y = sp.spmv(a, x)
    np.testing.assert_array_equal(np.asarray(y), dense @ np.asarray(x))
