"""Distributed SpGEMM stacked mul engine (round 5, VERDICT r4 #1).

The engine path is gated to TPU (or SPBLAS_FORCE_ROUTE_SPGEMM); these
tests force it on the faked 8-device CPU mesh (interpret-mode Pallas)
and check it against the dense oracle AND the engine-less XLA numeric.
Reference capability bar: device-speed distributed numeric reuse,
include/spblas/vendor/rocsparse/multiply_spgemm.hpp:150-214.
"""

import dataclasses

import jax
import numpy as np
import pytest

from spblas_tpu.parallel import (assemble_csr, dist_spgemm_compute,
                                 dist_spgemm_numeric, make_row_mesh,
                                 partition_rowblock)
from spblas_tpu.utils.generate import generate_csr
from tests.util import assert_close


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return make_row_mesh(8)


@pytest.fixture(autouse=True)
def _force_engine(monkeypatch):
    monkeypatch.setenv("SPBLAS_FORCE_ROUTE_SPGEMM", "1")


@pytest.mark.parametrize("m,k,n,nnz_a,nnz_b", [
    (64, 64, 64, 512, 512),
    (100, 40, 70, 600, 500),
    (33, 57, 41, 300, 700),
])
def test_engine_matches_oracle(mesh, m, k, n, nnz_a, nnz_b):
    a = generate_csr(m, k, nnz_a, seed=5)
    b = generate_csr(k, n, nnz_b, seed=6)
    ar = partition_rowblock(a, mesh)
    br = partition_rowblock(b, mesh)
    plan = dist_spgemm_compute(ar, br, mesh)
    assert plan.engine is not None, "engine gate should pass under force"
    c = assemble_csr(dist_spgemm_numeric(plan, ar, br, mesh))
    expected = np.asarray(a.todense()) @ np.asarray(b.todense())
    assert_close(np.asarray(c.todense()), expected, factor=256)


def test_engine_matches_xla_path(mesh, monkeypatch):
    m = k = n = 96
    a = generate_csr(m, k, 900, seed=7)
    b = generate_csr(k, n, 800, seed=8)
    ar = partition_rowblock(a, mesh)
    br = partition_rowblock(b, mesh)
    plan = dist_spgemm_compute(ar, br, mesh)
    assert plan.engine is not None
    c_eng = assemble_csr(dist_spgemm_numeric(plan, ar, br, mesh))
    plan_x = dataclasses.replace(plan, engine=None)
    c_xla = assemble_csr(dist_spgemm_numeric(plan_x, ar, br, mesh))
    np.testing.assert_allclose(np.asarray(c_eng.todense()),
                               np.asarray(c_xla.todense()),
                               rtol=1e-5, atol=1e-5)


def test_engine_reuse_new_values(mesh):
    m = k = n = 64
    a = generate_csr(m, k, 500, seed=9)
    b = generate_csr(k, n, 500, seed=10)
    ar = partition_rowblock(a, mesh)
    br = partition_rowblock(b, mesh)
    plan = dist_spgemm_compute(ar, br, mesh)
    assert plan.engine is not None
    c1 = assemble_csr(dist_spgemm_numeric(plan, ar, br, mesh))
    expected = np.asarray(a.todense()) @ np.asarray(b.todense())
    assert_close(np.asarray(c1.todense()), expected, factor=256)
    a2 = dataclasses.replace(ar, values=ar.values * 2.0)
    c2 = assemble_csr(dist_spgemm_numeric(plan, a2, br, mesh))
    assert_close(np.asarray(c2.todense()), 2.0 * expected, factor=256)


def test_engine_multi_panel_with_device_padding(mesh, monkeypatch):
    """Tiny panel grid: several panels per device, device chunk counts
    differing per panel (flag-1 zero-pad groups), empty panels on the
    starved shards — the SPMD-uniformity corners."""
    monkeypatch.setenv("SPBLAS_DIST_MUL_PANEL_SLOTS", "1024")
    m = k = n = 160            # skewed blocks: last shard nearly empty
    a = generate_csr(m, k, 2600, seed=11)
    b = generate_csr(k, n, 2600, seed=12)
    ar = partition_rowblock(a, mesh)
    br = partition_rowblock(b, mesh)
    plan = dist_spgemm_compute(ar, br, mesh)
    assert plan.engine is not None
    assert len(plan.engine.panels) >= 2, "grid should split panels"
    c = assemble_csr(dist_spgemm_numeric(plan, ar, br, mesh))
    expected = np.asarray(a.todense()) @ np.asarray(b.todense())
    assert_close(np.asarray(c.todense()), expected, factor=256)


def test_engine_skipped_without_force_or_tpu(mesh, monkeypatch):
    monkeypatch.delenv("SPBLAS_FORCE_ROUTE_SPGEMM", raising=False)
    a = generate_csr(64, 64, 500, seed=13)
    ar = partition_rowblock(a, mesh)
    plan = dist_spgemm_compute(ar, ar, mesh)
    assert plan.engine is None
