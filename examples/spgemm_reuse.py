"""Numeric-reuse SpGEMM — mirrors the rocSPARSE reuse protocol
(test/gtest/device/spgemm_reuse_test.cpp): one symbolic phase, many
numeric re-runs with new values over unchanged sparsity, plus the
4-argument fused form C = alpha*A*B + beta*D."""

import dataclasses

import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils.generate import generate_csr

m = k = n = 80
a = generate_csr(m, k, 600, seed=0)
b = generate_csr(k, n, 600, seed=1)

state = sp.SpgemmState()
sp.multiply_symbolic_compute(state, a, b)
c_struct = sp.multiply_symbolic_fill(state, a, b)
print("symbolic nnz:", state.info.result_nnz)

dense_b = np.asarray(b.todense())
for it in range(3):
    a_new = dataclasses.replace(a, values=a.values * (it + 1.0))
    c = sp.multiply_numeric(state, a_new, b)
    expected = np.asarray(a_new.todense()) @ dense_b
    assert np.allclose(np.asarray(c.todense()), expected, rtol=1e-4)

# fused 4-arg form
d = generate_csr(m, n, 400, seed=2)
c4 = sp.multiply_fused(sp.SpgemmState(), sp.scaled(2.0, a), b,
                       sp.scaled(3.0, d))
expected4 = 2.0 * np.asarray(a.todense()) @ dense_b + \
    3.0 * np.asarray(d.todense())
assert np.allclose(np.asarray(c4.todense()), expected4, rtol=1e-4)
print("ok")
