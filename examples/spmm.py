"""SpMM (CSR and CSC) — mirrors examples/spmm_csr.cpp / spmm_csc.cpp."""

import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils.generate import generate_csr, generate_csc, \
    generate_dense

m, n, k = 100, 80, 64

a_csr = generate_csr(m, n, 700, seed=0)
b = generate_dense(n, k, seed=1)

c = sp.multiply(a_csr, b)
expected = np.asarray(a_csr.todense()) @ np.asarray(b)
assert np.allclose(np.asarray(c), expected, rtol=1e-4)

# same call, CSC operand (the reference dispatches by iterability;
# here the op canonicalizes formats internally)
a_csc = generate_csc(m, n, 700, seed=0)
c2 = sp.multiply(a_csc, b)
expected2 = np.asarray(a_csc.todense()) @ np.asarray(b)
assert np.allclose(np.asarray(c2), expected2, rtol=1e-4)
print("ok")
