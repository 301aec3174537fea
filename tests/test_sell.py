"""SELL bucketed-ELL plan tests (kernels/sell.py) — dense oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from spblas_tpu.kernels.sell import build_sell_plan, sell_spmm, sell_spmv
from spblas_tpu.utils.generate import generate_csr, generate_rmat_csr
from tests.util import assert_close, dense_from_csr


@pytest.mark.parametrize("gen,m", [
    (lambda m: generate_csr(m, m, m * 7, seed=2), 3000),
    (lambda m: generate_rmat_csr(m, m * 8, seed=4), 2048),   # skewed
    (lambda m: generate_csr(m, m // 2, m * 3, seed=5), 1000),  # rect
])
def test_sell_matches_dense(gen, m):
    a = gen(m)
    plan = build_sell_plan(a)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    # abs floor: generate_csr values are U[0,100] (reference
    # distribution), so near-cancelling rows see reassociation error
    # ~eps * sum|terms| that the relative bound can't model
    assert_close(np.asarray(sell_spmv(plan, jnp.asarray(x))),
                 dense_from_csr(a) @ x, abs_floor=1e-2)
    b = rng.standard_normal((a.shape[1], 9)).astype(np.float32)
    assert_close(np.asarray(sell_spmm(plan, jnp.asarray(b))),
                 dense_from_csr(a) @ b, abs_floor=1e-2)


def test_sell_empty_rows_and_reuse():
    import scipy.sparse as sp
    import dataclasses
    rng = np.random.default_rng(0)
    m = 512
    rows = rng.integers(0, m // 2, 2000)      # bottom half all empty
    cols = rng.integers(0, m, 2000)
    v = rng.standard_normal(2000).astype(np.float32)
    A = sp.coo_matrix((v, (rows, cols)), shape=(m, m)).tocsr()
    A.sum_duplicates()
    from spblas_tpu.formats.csr import CSR
    a = CSR.from_arrays(A.data, A.indptr, A.indices, (m, m), nnz=A.nnz)
    plan = build_sell_plan(a)
    x = rng.standard_normal(m).astype(np.float32)
    assert_close(np.asarray(sell_spmv(plan, jnp.asarray(x))), A @ x)
    # numeric reuse with new values, same sparsity
    v2 = rng.standard_normal(A.nnz).astype(np.float32)
    plan2 = plan.refresh_values(jnp.asarray(v2))
    A2 = A.copy(); A2.data = v2
    assert_close(np.asarray(sell_spmv(plan2, jnp.asarray(x))), A2 @ x)
