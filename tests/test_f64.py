"""double-precision policy tests (VERDICT r2 missing #2).

The reference templates every algorithm over ``double``
(include/spblas/views/csr_view.hpp:12-16; test/gtest/util.hpp:7-23's
tolerance model handles doubles).  Policy here:

  * x64 disabled (jax default): container constructors WARN loudly (or
    raise under SPBLAS_STRICT_DTYPE=1) instead of silently narrowing.
  * x64 enabled: the CPU/XLA base paths run genuinely in f64 and the
    f64 oracle suites below hold at f64 tolerances (64*eps_f64 —
    ~1e-14 relative, unreachable by an f32 path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spblas_tpu import (CSR, add, multiply, multiply_compute,
                        multiply_fill, scaled, spmv, transpose,
                        triangular_solve, matrix_opt)
from spblas_tpu.utils import generate as gen
from tests.util import DIMS, assert_close, csr_entries, dense_from_csr


@pytest.fixture
def x64():
    with jax.enable_x64(True):
        yield


def _f64_csr(m, n, nnz, seed=0):
    return gen.generate_csr(m, n, nnz, seed=seed, dtype=np.float64)


# ------------------------------------------------------------------ #
# downcast policy (x64 off)
# ------------------------------------------------------------------ #

def test_f64_downcast_warns():
    vals = np.array([1.0, 2.0], dtype=np.float64)
    with pytest.warns(UserWarning, match="narrowed to 32 bits"):
        a = CSR.from_arrays(vals, [0, 1, 2], [0, 1], (2, 2), nnz=2)
    assert a.dtype == jnp.float32


def test_f64_downcast_strict_raises(monkeypatch):
    monkeypatch.setenv("SPBLAS_STRICT_DTYPE", "1")
    vals = np.array([1.0], dtype=np.float64)
    with pytest.raises(TypeError, match="narrowed to 32 bits"):
        CSR.from_arrays(vals, [0, 1], [0], (1, 1), nnz=1)


def test_f32_no_warning(recwarn):
    vals = np.array([1.0, 2.0], dtype=np.float32)
    CSR.from_arrays(vals, [0, 1, 2], [0, 1], (2, 2), nnz=2)
    assert not [w for w in recwarn if "narrowed" in str(w.message)]


# ------------------------------------------------------------------ #
# f64 oracle suites (x64 on) — bounds at 64*eps_f64 prove the whole
# path stayed in double precision
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("m,n,nnz", DIMS)
def test_f64_spmv(x64, m, n, nnz):
    a = _f64_csr(m, n, nnz)
    assert a.dtype == jnp.float64
    x = gen.generate_vector(n, seed=1, dtype=np.float64)
    y = spmv(a, x)
    assert y.dtype == jnp.float64
    assert_close(y, dense_from_csr(a) @ x)


def test_f64_spmv_optimized_plan(x64):
    # the plan chooser must keep f64 on a dtype-preserving path
    m, n, nnz = 400, 400, 4000
    a = _f64_csr(m, n, nnz)
    x = gen.generate_vector(n, seed=2, dtype=np.float64)
    y = spmv(matrix_opt(a), x)
    assert y.dtype == jnp.float64
    assert_close(y, dense_from_csr(a) @ x)


@pytest.mark.parametrize("k", [1, 8, 64])
def test_f64_spmm(x64, k):
    m, n, nnz = 300, 200, 2500
    a = _f64_csr(m, n, nnz)
    b = gen.generate_dense(n, k, seed=3, dtype=np.float64)
    c = multiply(a, jnp.asarray(b))
    assert c.dtype == jnp.float64
    assert_close(c, dense_from_csr(a) @ b)


def test_f64_spgemm_two_phase(x64):
    m, k, n = 120, 90, 110
    a = _f64_csr(m, k, 900, seed=4)
    b = _f64_csr(k, n, 800, seed=5)
    info = multiply_compute(a, b)
    c = multiply_fill(info, a, b)
    assert c.dtype == jnp.float64
    expected = dense_from_csr(a) @ dense_from_csr(b)
    got = np.zeros((m, n))
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected)


def test_f64_triangular_solve(x64):
    m = 300
    a = gen.generate_triangular_csr(m, seed=6, lower=True,
                                    dtype=np.float64)
    b = gen.generate_vector(m, seed=7, dtype=np.float64)
    x = triangular_solve(a, b, uplo="lower", diag="explicit")
    assert x.dtype == jnp.float64
    # residual check at f64 tolerance
    assert_close(dense_from_csr(a) @ np.asarray(x), b, factor=512)


def test_f64_add_transpose_scaled(x64):
    m, n = 150, 130
    a = _f64_csr(m, n, 1200, seed=8)
    b = _f64_csr(m, n, 1100, seed=9)
    c = add(a, b)
    assert c.dtype == jnp.float64
    expected = dense_from_csr(a) + dense_from_csr(b)
    got = np.zeros((m, n))
    for (i, j), v in csr_entries(c).items():
        got[i, j] += v
    assert_close(got, expected)

    at = transpose(a)
    assert at.values.dtype == jnp.float64
    got_t = np.zeros((n, m))
    for (i, j), v in csr_entries(at).items():
        got_t[i, j] += v
    assert_close(got_t, dense_from_csr(a).T)

    x = gen.generate_vector(n, seed=10, dtype=np.float64)
    y = spmv(scaled(2.5, a), x)
    assert y.dtype == jnp.float64
    assert_close(y, 2.5 * (dense_from_csr(a) @ x))


# ------------------------------------------------------------------ #
# x64-mode tracing of the f32 Pallas kernels (round 5)
# ------------------------------------------------------------------ #
# Mosaic rejects i64 anywhere the TPU kernels put a scalar: weak
# Python-int roll shifts become i64 ('tpu.dynamic_rotate' operand must
# be i32) and BlockSpec index-map int constants become i64 constants
# whose func.return fails to legalize.  Both were found by the round-5
# spmv_f64 bench section, whose f32 comparison leg runs with x64
# globally on.  Fix: kernels pin static shifts to np.int32, and every
# Pallas dispatch traces under types.no_x64.  The tests assert the
# strong invariant: tracing a dispatch with x64 ON yields NO i64 aval
# anywhere in the jaxpr.


def _all_dtypes(jaxpr, out):
    """Collect aval dtypes of every var in every eqn, recursing through
    call/pallas/scan subjaxprs."""
    for eqn in jaxpr.eqns:
        for v in list(eqn.invars) + list(eqn.outvars):
            if hasattr(v.aval, "dtype"):
                out.append(v.aval.dtype)
        for p in eqn.params.values():
            inner = getattr(p, "jaxpr", p)
            if hasattr(inner, "eqns"):
                _all_dtypes(inner, out)
    return out


def test_dia_pallas_no_i64_under_x64(x64):
    from spblas_tpu.kernels.dia import build_dia_plan, _dia_spmv_pallas

    # tridiagonal => off+pad_lo = 0,1,2: nonzero r takes the roll path
    a = gen.generate_banded_csr(512, 512, 3, seed=0)
    plan = build_dia_plan(a)
    assert any((off + 1) % 128 for off in plan.offsets)
    x = jnp.ones((512,), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda v: _dia_spmv_pallas(plan, v))(x)
    dts = _all_dtypes(jaxpr.jaxpr, [])
    assert dts and not any(d == jnp.int64 for d in dts)

    # numerics unchanged under x64 (interpret mode on CPU; the kernel
    # itself is f32, so f32 tolerances apply even with x64 on)
    y = _dia_spmv_pallas(plan, x)
    np.testing.assert_allclose(np.asarray(y, np.float64),
                               dense_from_csr(a) @ np.ones(512),
                               rtol=1e-5, atol=1e-5)


def _find_pallas_eqns(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn)
        for p in eqn.params.values():
            inner = getattr(p, "jaxpr", p)
            if hasattr(inner, "eqns"):
                _find_pallas_eqns(inner, out)
    return out


def _assert_pallas_i32(jaxpr):
    """Every pallas_call in the traced program: index maps return only
    i32, and the kernel jaxpr holds no i64 aval (Mosaic's contract)."""
    eqns = _find_pallas_eqns(jaxpr, [])
    assert eqns, "expected at least one pallas_call"
    for e in eqns:
        for bm in e.params["grid_mapping"].block_mappings:
            outs = [v.aval.dtype for v in bm.index_map_jaxpr.jaxpr.outvars]
            assert all(d == jnp.int32 for d in outs), outs
        kdts = _all_dtypes(e.params["jaxpr"], [])
        assert not any(d == jnp.int64 for d in kdts)


def test_band_route_pallas_no_i64_under_x64(x64):
    """Same invariant over the band + ROUTE dispatches, which carry
    Python-int BlockSpec index-map constants (the func.return class);
    their XLA glue outside the kernel may legally use i64 under x64,
    so the check scopes to what Mosaic actually compiles."""
    from spblas_tpu.kernels.banded import build_band_plan, band_spmv
    from spblas_tpu.kernels.route_plan import build_route_plan
    from spblas_tpu.kernels.route_spmv import route_spmv

    a = gen.generate_banded_csr(2048, 2048, 9, seed=1)
    bplan = build_band_plan(a)
    x = jnp.ones((2048,), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda v: band_spmv(bplan, v, interpret=True))(x)
    _assert_pallas_i32(jaxpr.jaxpr)

    g = gen.generate_csr(4096, 4096, 40_000, seed=2)
    rplan = build_route_plan(
        np.asarray(g.rowptr, np.int64), np.asarray(g.colind, np.int64),
        np.asarray(g.values), g.shape, int(g.nnz))
    xr = jnp.ones((4096,), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda v: route_spmv(rplan, v, interpret=True))(xr)
    _assert_pallas_i32(jaxpr.jaxpr)
