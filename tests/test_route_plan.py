"""ROUTE plan builder invariants + numpy-simulator oracle tests.

The simulator (route_spmv_numpy) reproduces the Pallas kernel
semantics bit-for-bit in numpy; these tests pin the *plan* against the
dense oracle across degree profiles, so the kernel test only has to match
the simulator.
"""

import numpy as np
import pytest

from spblas_tpu.kernels import route_plan as rp
from spblas_tpu.utils import generate as gen
from tests.util import assert_close


def _dense_oracle(rowptr, colind, values, shape, nnz, x):
    m, n = shape
    y = np.zeros(m, np.float64)
    rowptr = np.asarray(rowptr)
    colind = np.asarray(colind)
    values = np.asarray(values)
    for i in range(m):
        for e in range(rowptr[i], min(rowptr[i + 1], nnz)):
            y[i] += float(values[e]) * float(x[colind[e]])
    return y.astype(np.float32)


def test_route_permutation_random_bijections():
    rng = np.random.default_rng(0)
    jj = np.broadcast_to(np.arange(rp.LANES)[None, :], (rp.SUBS, rp.LANES))
    ii = np.broadcast_to(np.arange(rp.SUBS)[:, None], (rp.SUBS, rp.LANES))
    for _ in range(5):
        src = rng.permutation(rp.SLOTS)
        dst = rng.permutation(rp.SLOTS)
        q1, q2, q3 = rp._route_permutation(src, dst)
        c = rng.standard_normal((rp.SUBS, rp.LANES)).astype(np.float32)
        t = c[q1, jj]
        t = t[ii, q2]
        t = t[q3, jj]
        expect = np.zeros_like(c)
        expect[dst // rp.LANES, dst % rp.LANES] = \
            c[src // rp.LANES, src % rp.LANES]
        np.testing.assert_array_equal(t, expect)


def _roundtrip(m, n, nnz, seed, g=None):
    a = gen.generate_csr(m, n, nnz, seed=seed)
    rowptr = np.asarray(a.rowptr)
    colind = np.asarray(a.colind)
    values = np.asarray(a.values)
    plan = rp.build_route_plan(rowptr, colind, values, (m, n),
                               int(a.nnz), g=g)
    x = np.random.default_rng(seed + 1).standard_normal(n).astype(
        np.float32)
    got = rp.route_spmv_numpy(plan, x)
    want = _dense_oracle(rowptr, colind, values, (m, n), int(a.nnz), x)
    assert_close(got, want, factor=64, abs_floor=1e-4)
    return plan


@pytest.mark.parametrize("m,n,nnz", [
    (100, 100, 500),           # small square
    (1000, 1000, 10000),       # deg 10, multiple windows at g=1
    (300, 5000, 6000),         # wide: several col windows
    (5000, 300, 6000),         # tall: several row stripes
    (2048, 2048, 2048),        # deg 1
    (64, 64, 2000),            # dense-ish: long rows split across chunks
])
def test_route_plan_matches_dense_oracle(m, n, nnz):
    _roundtrip(m, n, nnz, seed=m + n)


def test_route_plan_adversarial_rows():
    # one dense row + empty rows + a hot column
    m = n = 600
    rng = np.random.default_rng(3)
    rows = np.concatenate([
        np.full(n // 2, 7),                       # dense row 7
        rng.integers(0, m, 800),
        np.full(300, 11),                         # another long row
    ])
    cols = np.concatenate([
        rng.permutation(n)[: n // 2],
        np.full(800, 13),                         # hot column 13
        rng.permutation(n)[:300],
    ])
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keep = np.ones(len(rows), bool)               # dedupe
    keep[1:] = (np.diff(rows) != 0) | (np.diff(cols) != 0)
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    rowptr = np.zeros(m + 1, np.int64)
    np.add.at(rowptr[1:], rows, 1)
    rowptr = np.cumsum(rowptr)
    plan = rp.build_route_plan(rowptr, cols, vals, (m, n), len(rows))
    x = rng.standard_normal(n).astype(np.float32)
    got = rp.route_spmv_numpy(plan, x)
    want = _dense_oracle(rowptr, cols, vals, (m, n), len(rows), x)
    assert_close(got, want, factor=128, abs_floor=1e-4)


def test_route_plan_g_values():
    for g in (1, 2, 4):
        plan = _roundtrip(500, 3000, 4000, seed=77, g=g)
        assert plan.g == g


def test_route_plan_fill_reasonable():
    plan = _roundtrip(4096, 4096, 40960, seed=5)   # uniform deg 10
    assert plan.fill > 0.5, plan.fill


def test_route_plan_empty_matrix():
    plan = rp.build_route_plan(np.zeros(11, np.int64),
                               np.zeros(0, np.int64),
                               np.zeros(0, np.float32), (10, 10), 0)
    x = np.ones(10, np.float32)
    np.testing.assert_array_equal(rp.route_spmv_numpy(plan, x),
                                  np.zeros(10, np.float32))


def test_route_plan_update_values():
    import jax.numpy as jnp
    m = n = 256
    a = gen.generate_csr(m, n, 2000, seed=9)
    rowptr = np.asarray(a.rowptr)
    colind = np.asarray(a.colind)
    values = np.asarray(a.values)
    plan = rp.build_route_plan(rowptr, colind, values, (m, n), int(a.nnz))
    new_vals = values * 3.0
    plan2 = plan.update_values(jnp.asarray(new_vals))
    x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    got = rp.route_spmv_numpy(plan2, x)
    want = _dense_oracle(rowptr, colind, new_vals, (m, n), int(a.nnz), x)
    assert_close(got, want, factor=64, abs_floor=1e-4)


def test_route_plan_python_fallback_matches(monkeypatch):
    """The no-toolchain python packer builds equivalent (valid) plans."""
    from spblas_tpu import native
    m = n = 2000
    a = gen.generate_csr(m, n, 20000, seed=21)
    rowptr = np.asarray(a.rowptr)
    colind = np.asarray(a.colind)
    values = np.asarray(a.values)
    x = np.random.default_rng(2).standard_normal(n).astype(np.float32)
    want = _dense_oracle(rowptr, colind, values, (m, n), int(a.nnz), x)

    plan_nat = rp.build_route_plan(rowptr, colind, values, (m, n),
                                   int(a.nnz))
    monkeypatch.setattr(native, "route_pack", lambda *args: None)
    plan_py = rp.build_route_plan(rowptr, colind, values, (m, n),
                                  int(a.nnz))
    for plan in (plan_nat, plan_py):
        got = rp.route_spmv_numpy(plan, x)
        assert_close(got, want, factor=64, abs_floor=1e-4)
