"""Pane-blocked triangular solve (round 5, VERDICT r4 #8).

Forces the blocked path at CPU sizes via the env-tunable pane cap and
checks it against the dense substitution oracle, including upper
triangles, unit diagonals, scaled views, and numeric re-runs with new
values (the refresh path re-gathers per-block values and strip plans).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

import spblas_tpu as sp
from spblas_tpu.ops.triangular_solve import (triangular_solve,
                                             triangular_solve_inspect)
from spblas_tpu.utils import generate as gen
from tests.util import dense_from_csr


@pytest.fixture(autouse=True)
def _force_blocked(monkeypatch):
    monkeypatch.setenv("SPBLAS_FORCE_ROUTE_TRSV", "1")
    monkeypatch.setenv("SPBLAS_ROUTE_SOLVE_PANE_CAP", "4")
    monkeypatch.setenv("SPBLAS_BLOCK_SOLVE_ROWS", "512")


def _check(L, x, b, uplo, diag, alpha=1.0, factor=64):
    dense = dense_from_csr(L).astype(np.float64) * alpha
    if diag == "unit":
        np.fill_diagonal(dense, alpha)
    resid = np.abs(dense @ np.asarray(x, np.float64) - np.asarray(b))
    assert resid.max() < 1e-3 * max(1.0, np.abs(b).max()), resid.max()


@pytest.mark.parametrize("uplo", ["lower", "upper"])
@pytest.mark.parametrize("diag", ["explicit", "unit"])
def test_blocked_solve_oracle(uplo, diag):
    m = 1500
    L = gen.generate_triangular_csr(m, seed=1, lower=(uplo == "lower"),
                                    unit_diag=(diag == "unit"),
                                    density=0.004)
    info = triangular_solve_inspect(L, uplo=uplo, diag=diag)
    assert info.plan.blocked is not None, "blocked gate should fire"
    assert len(info.plan.blocked.subs) == 3
    b = np.asarray(gen.generate_vector(m, seed=2))
    x = triangular_solve(L, jnp.asarray(b), uplo=uplo, diag=diag,
                         info=info)
    _check(L, x, b, uplo, diag)


def test_blocked_solve_scaled_and_refresh():
    m = 1200
    L = gen.generate_triangular_csr(m, seed=3, lower=True,
                                    density=0.004)
    info = triangular_solve_inspect(L, uplo="lower")
    assert info.plan.blocked is not None
    b = np.asarray(gen.generate_vector(m, seed=4))
    x = triangular_solve(sp.scaled(2.0, L), jnp.asarray(b),
                         uplo="lower", info=info)
    _check(L, x, b, "lower", "explicit", alpha=2.0)
    # numeric re-run with new values, same sparsity
    L2 = dataclasses.replace(L, values=L.values * 1.5)
    x2 = triangular_solve(L2, jnp.asarray(b), uplo="lower", info=info)
    _check(L2, x2, b, "lower", "explicit")


def test_blocked_matches_ragged():
    m = 1100
    L = gen.generate_triangular_csr(m, seed=5, lower=True,
                                    density=0.004)
    info = triangular_solve_inspect(L, uplo="lower")
    assert info.plan.blocked is not None
    b = np.asarray(gen.generate_vector(m, seed=6))
    x_blk = triangular_solve(L, jnp.asarray(b), uplo="lower", info=info)
    plan_r = dataclasses.replace(info.plan, blocked=None)
    x_rag = triangular_solve(L, jnp.asarray(b), uplo="lower",
                             info=info.update(plan=plan_r))
    np.testing.assert_allclose(np.asarray(x_blk), np.asarray(x_rag),
                               rtol=2e-4, atol=2e-4)
