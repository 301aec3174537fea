"""SpTRSV walk-through — mirrors examples/simple_sptrsv.cpp /
sptrsv_csr.cpp, with the level-scheduled inspector made explicit."""

import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils.generate import generate_triangular_csr, \
    generate_vector

m = 200
L = generate_triangular_csr(m, seed=0, lower=True)
b = generate_vector(m, seed=1)

# one-shot (analysis runs internally)
x = sp.triangular_solve(L, b, uplo="lower", diag="explicit")

# inspector-executor: amortize the level analysis across solves
info = sp.triangular_solve_inspect(L, uplo="lower", diag="explicit")
print("levels:", info.plan.num_levels)
x2 = sp.triangular_solve(L, b, uplo="lower", info=info)

dense = np.asarray(L.todense())
assert np.allclose(dense @ np.asarray(x), np.asarray(b), atol=1e-4)
assert np.allclose(np.asarray(x), np.asarray(x2))
print("ok")
