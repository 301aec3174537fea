"""Distributed SpMV over a device mesh — no reference counterpart
(the reference is single-device; SURVEY.md §2.6).

Run with real chips, or fake a mesh on CPU:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python examples/distributed_spmv.py
"""

import jax
import numpy as np

from spblas_tpu.parallel import (
    dist_spmv, gather_result, make_row_mesh, partition_csr,
    partition_vector,
)
from spblas_tpu.utils.generate import generate_csr, generate_vector

mesh = make_row_mesh()
print("mesh:", mesh)

m = n = 1024
a = generate_csr(m, n, 16 * m, seed=0)
x = generate_vector(n, seed=1)

d = partition_csr(a, mesh)             # inspect: row blocks + ring layout
xd = partition_vector(x, d, mesh)

y_ring = gather_result(dist_spmv(d, xd, mesh, strategy="ring"), d)
y_ag = gather_result(dist_spmv(d, xd, mesh, strategy="allgather"), d)

expected = np.asarray(a.todense()) @ np.asarray(x)
assert np.allclose(np.asarray(y_ring), expected, rtol=1e-3, atol=1e-3)
assert np.allclose(np.asarray(y_ag), expected, rtol=1e-3, atol=1e-3)
print("ok")
