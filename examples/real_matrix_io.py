"""Real-matrix IO tour: load a checked-in Matrix Market file, run the
full matvec chooser on it, and round-trip a matrix through save/load.

The reference has no IO layer (its fixtures are seeded generators);
the benchmark north star names SuiteSparse matrices, so this framework
ships a native C++ MM reader (`spblas_tpu.native.mm_read`) with
transparent .gz support and benchmark matrices under data/.
"""

import os
import tempfile

import numpy as np

import spblas_tpu as sp
from spblas_tpu.utils.generate import generate_csr, generate_vector
from spblas_tpu.utils.io import load_matrix_market, save_matrix_market

data = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")

# load a checked-in benchmark matrix (gzipped Matrix Market)
a = load_matrix_market(os.path.join(data, "fem2d_128.mtx.gz"))
print("fem2d_128:", a.shape, int(a.nnz), "nnz")

# run it through the optimized-matrix path (plan chooser)
x = generate_vector(a.shape[1], seed=1)
y = sp.multiply(sp.matrix_opt(a), x)

expected = np.asarray(a.todense()) @ np.asarray(x)
assert np.allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-3)

# save/load round-trip of a generated matrix
b = generate_csr(200, 150, 900, seed=2)
with tempfile.TemporaryDirectory() as d:
    p = os.path.join(d, "b.mtx")
    save_matrix_market(p, b)
    b2 = load_matrix_market(p)
assert b2.shape == b.shape and int(b2.nnz) == int(b.nnz)
assert np.allclose(np.asarray(b2.todense()), np.asarray(b.todense()),
                   rtol=1e-6)
print("ok")
