"""Paned ROUTE2 SpMV (kernels/route_paned.py) — beyond-VMEM executor.

Small pane/panel geometry on CPU interpret mode exercises multi-pane
streaming, multi-panel dispatch, pane-boundary padding groups, hub-row
aux reductions, and the chooser's beyond-VMEM entry (VERDICT r2 #3).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spblas_tpu.kernels.route_paned import (build_route_paned_plan,
                                            route_paned_spmv,
                                            estimate_paned_bytes)
from spblas_tpu.utils import generate as gen
from tests.util import assert_close, dense_from_csr


def _run(a, panel_rows, pane_rows, g=None):
    plan = build_route_paned_plan(
        np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values),
        a.shape, int(a.nnz), g=g, panel_rows=panel_rows,
        pane_rows=pane_rows)
    x = gen.generate_vector(a.shape[1], seed=11)
    y = np.asarray(route_paned_spmv(plan, jnp.asarray(x),
                                    interpret=True))
    assert_close(y, dense_from_csr(a) @ x, factor=64, abs_floor=1e-3)
    return plan


def test_multi_pane_multi_panel():
    # m=5000 -> 5 panels of 1024; n=6000 at g=1 -> x_rows 47 -> panes of
    # 16 sublane rows -> 3+ panes per panel
    a = gen.generate_csr(5000, 6000, 40_000, seed=0)
    plan = _run(a, panel_rows=1024, pane_rows=16, g=1)
    assert len(plan.panels) == 5
    assert plan.x_rows_pad % 16 == 0


def test_single_pane_path():
    a = gen.generate_csr(2048, 1000, 8_000, seed=1)
    plan = _run(a, panel_rows=1024, pane_rows=64, g=1)
    assert len(plan.panels) == 2


def test_hub_rows_aux_within_panel():
    # a few dense rows force hub spill -> aux chunks at panel end
    m, n = 3000, 2000
    rng = np.random.default_rng(2)
    rows = [rng.integers(0, m, 12_000)]
    rows.append(np.full(1500, 7))          # hub rows
    rows.append(np.full(1500, 2049))
    rows_all = np.concatenate(rows)
    cols = rng.integers(0, n, len(rows_all))
    key = rows_all * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows_all, cols = rows_all[uniq], cols[uniq]
    order = np.lexsort((cols, rows_all))
    rows_all, cols = rows_all[order], cols[order]
    vals = rng.uniform(0, 1, len(rows_all)).astype(np.float32)
    rowptr = np.zeros(m + 1, np.int64)
    np.add.at(rowptr[1:], rows_all, 1)
    rowptr = np.cumsum(rowptr)
    from spblas_tpu import CSR
    a = CSR.from_arrays(vals, rowptr, cols, (m, n), nnz=len(vals))
    plan = _run(a, panel_rows=1024, pane_rows=16, g=1)
    assert any(p.has_aux for p in plan.panels)


def test_uneven_last_panel_and_empty_rows():
    a = gen.generate_csr(2500, 1500, 6_000, seed=3)
    _run(a, panel_rows=2048, pane_rows=32, g=1)


def test_g2_windows():
    a = gen.generate_csr(4096, 4096, 30_000, seed=4)
    _run(a, panel_rows=2048, pane_rows=32, g=2)


def test_estimate_and_chooser_entry(monkeypatch):
    # beyond-VMEM shapes route to the paned plan on (fake) TPU
    from spblas_tpu.kernels import plans as _plans
    est = estimate_paned_bytes(4_000_000, 4_000_000, 40_000_000)
    assert est > 1_000_000_000      # starved cells -> big stream

    a = gen.generate_csr(3000, 2000, 15_000, seed=5)
    monkeypatch.setattr(_plans, "_ROUTE_VMEM_ROWS", 10)  # force paned
    monkeypatch.setattr(_plans, "_on_tpu", lambda: True)
    kind, plan = _plans._try_route(a)
    assert kind == "route_paned"
    x = gen.generate_vector(2000, seed=6)
    y = np.asarray(_plans.plan_spmv((kind, plan), jnp.asarray(x)))
    assert_close(y, dense_from_csr(a) @ x, factor=64, abs_floor=1e-3)


def test_budget_guard(monkeypatch):
    from spblas_tpu.kernels import plans as _plans
    a = gen.generate_csr(3000, 2000, 15_000, seed=7)
    monkeypatch.setattr(_plans, "_ROUTE_PANED_BUDGET", 1)
    assert _plans._try_route_paned(a) is None


def test_update_values_refresh():
    # same sparsity, new values: plan refresh stays on the paned
    # kernel (rocSPARSE optimize-handle reuse contract)
    a = gen.generate_csr(5000, 6000, 40_000, seed=8)
    plan = build_route_paned_plan(
        np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values),
        a.shape, int(a.nnz), g=1, panel_rows=1024, pane_rows=16)
    new_vals = np.asarray(a.values) * 3.0 - 1.0
    plan2 = plan.update_values(jnp.asarray(new_vals))
    x = gen.generate_vector(a.shape[1], seed=9)
    y = np.asarray(route_paned_spmv(plan2, jnp.asarray(x),
                                    interpret=True))
    import dataclasses
    a2 = dataclasses.replace(a, values=jnp.asarray(new_vals))
    assert_close(y, dense_from_csr(a2) @ x, factor=64, abs_floor=1e-3)
    # original plan still computes with the OLD values
    y0 = np.asarray(route_paned_spmv(plan, jnp.asarray(x),
                                     interpret=True))
    assert_close(y0, dense_from_csr(a) @ x, factor=64, abs_floor=1e-3)


def test_update_values_hub_aux_preserved():
    # aux (hub reduction) chunks carry baked 1.0 coefficients with
    # src=-1 — a refresh must not zero them
    m, n = 3000, 2000
    rng = np.random.default_rng(12)
    rows = np.concatenate([rng.integers(0, m, 12_000), np.full(1500, 7)])
    cols = rng.integers(0, n, len(rows))
    key = rows * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols = rows[uniq], cols[uniq]
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.uniform(0, 1, len(rows)).astype(np.float32)
    rowptr = np.zeros(m + 1, np.int64)
    np.add.at(rowptr[1:], rows, 1)
    rowptr = np.cumsum(rowptr)
    from spblas_tpu import CSR
    a = CSR.from_arrays(vals, rowptr, cols, (m, n), nnz=len(vals))
    plan = build_route_paned_plan(
        np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values),
        a.shape, int(a.nnz), g=1, panel_rows=1024, pane_rows=16)
    assert any(p.has_aux for p in plan.panels)
    new_vals = vals * -0.5 + 2.0
    plan2 = plan.update_values(jnp.asarray(new_vals))
    x = gen.generate_vector(n, seed=13)
    y = np.asarray(route_paned_spmv(plan2, jnp.asarray(x),
                                    interpret=True))
    import dataclasses
    a2 = dataclasses.replace(a, values=jnp.asarray(new_vals))
    assert_close(y, dense_from_csr(a2) @ x, factor=64, abs_floor=1e-3)


def test_paned_supercell_panels():
    """Round 4: paned plans take supercell publishes too (common ww
    across panels).  Starved fixture so the auto gate trips; checked
    through the interpret kernel against the dense oracle."""
    a = gen.generate_csr(40_960, 40_960, 120_000, seed=7)
    plan = build_route_paned_plan(
        np.asarray(a.rowptr), np.asarray(a.colind),
        np.asarray(a.values), a.shape, int(a.nnz),
        panel_rows=16_384, pane_rows=256)
    assert plan.row_window_mult > 1, "fixture must trip the ww gate"
    assert len(plan.panels) > 1
    x = gen.generate_vector(a.shape[1], seed=8)
    y = np.asarray(route_paned_spmv(plan, jnp.asarray(x),
                                    interpret=True))
    assert_close(y, dense_from_csr(a) @ x, factor=64, abs_floor=1e-3)


def test_paned_rotated_panels_oracle():
    """Starved supercell panels pack with per-chunk publish rotations
    (round 5) and the paned kernel's un-rotating publish matches the
    dense oracle; serialization keeps per-panel rho."""
    import numpy as np
    from spblas_tpu.kernels.route_paned import (build_route_paned_plan,
                                                route_paned_spmv)
    from spblas_tpu.utils.generate import generate_csr_arrays

    m, deg = 300_000, 3
    vals, rowptr, colind = generate_csr_arrays(m, m, m * deg, seed=1)
    plan = build_route_paned_plan(rowptr, colind, vals, (m, m), m * deg,
                                  panel_rows=65536, pane_rows=8192)
    assert any(p.rotated for p in plan.panels), "gate should fire"
    x = np.random.default_rng(2).standard_normal(m).astype(np.float32)
    y = np.asarray(route_paned_spmv(plan, x))[:m]
    rows = np.repeat(np.arange(m), np.diff(rowptr))
    ref = np.zeros(m, np.float64)
    np.add.at(ref, rows, vals.astype(np.float64) * x[colind])
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 1e-4, err
