"""Two-phase SpGEMM walk-through — mirrors examples/simple_spgemm.cpp.

The canonical inspector-executor protocol: symbolic ``multiply_compute``
returns an info with ``result_nnz``; the caller sizes the output; numeric
``multiply_fill`` populates it.
"""

import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils.generate import generate_csr

m, k, n = 100, 80, 120

a = generate_csr(m, k, 600, seed=0)
b = generate_csr(k, n, 500, seed=1)

# symbolic phase: structure + nnz (the one device→host sync)
info = sp.multiply_compute(a, b)
print("result shape:", info.result_shape, "nnz:", info.result_nnz)

# numeric phase into the computed structure
c = sp.multiply_fill(info, a, b)
print("C:", c)

expected = np.asarray(a.todense()) @ np.asarray(b.todense())
assert np.allclose(np.asarray(c.todense()), expected, rtol=1e-4)
print("ok")
