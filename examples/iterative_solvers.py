"""Iterative solvers over the sparse framework: CG on an SPD banded
system and a dominant eigenpair by power iteration — jit-compiled loops
with no host sync per iteration (beyond the reference's BLAS-level
scope; the natural consumer of a jax-native sparse library)."""

import jax.numpy as jnp
import numpy as np

from spblas_tpu import matrix_opt, solvers
from spblas_tpu.formats.csr import CSR

rng = np.random.default_rng(0)
m = 400

# SPD: diagonally dominant symmetric band
off1 = rng.uniform(0.05, 0.25, m - 1).astype(np.float32)
dense = np.diag(np.full(m, 2.0, np.float32))
dense += np.diag(off1, 1) + np.diag(off1, -1)
a = CSR.from_dense(dense)

b = rng.standard_normal(m).astype(np.float32)
res = solvers.cg(matrix_opt(a), jnp.asarray(b), tol=1e-6, maxiter=500)
print(f"CG: {int(res.iterations)} iterations, "
      f"residual {float(res.residual_norm):.2e}")
assert np.abs(dense @ np.asarray(res.x) - b).max() < 1e-3

eig = solvers.power_method(a, m, iters=200)
lam_true = np.linalg.eigvalsh(dense.astype(np.float64)).max()
print(f"power method: lambda_max = {float(eig.eigenvalue):.6f} "
      f"(dense oracle {lam_true:.6f})")
assert abs(float(eig.eigenvalue) - lam_true) < 1e-2

x_j = solvers.jacobi(a, jnp.asarray(b), jnp.asarray(np.diag(dense)),
                     iters=300, omega=0.8)
assert np.abs(dense @ np.asarray(x_j) - b).max() < 1e-2
print("ok")
