"""SpMV walk-through — mirrors reference examples/simple_spmv.cpp.

y = alpha * A @ x over a random CSR, via the polymorphic ``multiply``
with a lazy ``scaled`` view folded into the kernel.
"""

import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils.generate import generate_csr, generate_vector

m, n, nnz = 100, 100, 10

a = generate_csr(m, n, nnz, seed=0)
x = generate_vector(n, seed=1)

alpha = 2.0
y = sp.multiply(sp.scaled(alpha, a), x)

print("A:", a)
print("y[:8] =", np.asarray(y)[:8])

# oracle check, the reference tests' style
expected = alpha * (np.asarray(a.todense()) @ np.asarray(x))
assert np.allclose(np.asarray(y), expected, rtol=1e-5)
print("ok")
