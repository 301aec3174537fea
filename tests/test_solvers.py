"""Iterative solvers over the sparse ops (jit-compiled loops)."""

import jax.numpy as jnp
import numpy as np

from spblas_tpu import solvers
from spblas_tpu.formats.csr import CSR


def _spd_banded(m, seed=0):
    """SPD tridiagonal-ish: 2I + band/4 symmetric."""
    rng = np.random.default_rng(seed)
    off = rng.uniform(0.05, 0.2, m - 1).astype(np.float32)
    dense = np.diag(np.full(m, 2.0, np.float32))
    dense += np.diag(off, 1) + np.diag(off, -1)
    return dense


def test_cg_solves_spd():
    m = 200
    dense = _spd_banded(m)
    a = CSR.from_dense(dense)
    b = np.random.default_rng(1).standard_normal(m).astype(np.float32)
    res = solvers.cg(a, jnp.asarray(b), tol=1e-6, maxiter=500)
    x = np.asarray(res.x)
    assert np.abs(dense @ x - b).max() < 1e-3
    assert int(res.iterations) < 500


def test_cg_with_matvec_callable():
    m = 100
    dense = _spd_banded(m, seed=2)
    mv = lambda v: jnp.asarray(dense) @ v   # noqa: E731
    b = np.ones(m, np.float32)
    res = solvers.cg(mv, jnp.asarray(b), tol=1e-6)
    assert np.abs(dense @ np.asarray(res.x) - b).max() < 1e-3


def test_power_method_dominant_eigenvalue():
    m = 120
    dense = _spd_banded(m, seed=3)
    a = CSR.from_dense(dense)
    res = solvers.power_method(a, m, iters=300)
    lam_true = np.linalg.eigvalsh(dense.astype(np.float64)).max()
    np.testing.assert_allclose(float(res.eigenvalue), lam_true,
                               rtol=1e-3)


def test_jacobi_reduces_residual():
    m = 150
    dense = _spd_banded(m, seed=4)
    a = CSR.from_dense(dense)
    b = np.random.default_rng(5).standard_normal(m).astype(np.float32)
    diag = jnp.asarray(np.diag(dense))
    x = solvers.jacobi(a, jnp.asarray(b), diag, iters=200, omega=0.9)
    r0 = np.abs(b).max()
    r = np.abs(dense @ np.asarray(x) - b).max()
    assert r < 1e-3 * r0
