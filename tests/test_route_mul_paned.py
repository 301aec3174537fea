"""Paned ROUTE2-mul engine tests (kernels/route_mul_paned.py): the
beyond-VMEM fused SpGEMM numeric — output slots paneled per dispatch,
B panes streamed through a double buffer (VERDICT r3 #2; capability
bar: rocSPARSE reuse at any size, multiply_spgemm.hpp:101-105)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from spblas_tpu.kernels.route_mul_paned import (
    build_route2_mul_paned_plan, route2_mul_paned)
from tests.util import assert_close


def _ref(slots, sa, sb, A, B, cap):
    out = np.zeros(cap, np.float32)
    np.add.at(out, slots, A[sa] * B[sb])
    return out


@pytest.mark.parametrize("n_ent,cap,panel_slots,pane_rows,hub", [
    (20_000, 4096, 1024, 256, False),    # 4 panels x 2 B panes
    (6_000, 2048, 1024, 512, True),      # hub slot -> per-panel aux
    (3_000, 1024, 1 << 20, 512, False),  # single panel, single dispatch
])
def test_route2_mul_paned_matches_scatter(n_ent, cap, panel_slots,
                                          pane_rows, hub):
    rng = np.random.default_rng(n_ent)
    if hub:
        slots = np.sort(np.concatenate(
            [np.zeros(500, np.int64), rng.integers(0, cap, n_ent - 500)]))
    else:
        slots = np.sort(rng.integers(0, cap, n_ent))
    a_len, b_len = 1501, 40_000        # b spans 2 windows at g_b=32
    sa = rng.integers(0, a_len - 1, n_ent)
    sb = rng.integers(0, b_len, n_ent)
    plan = build_route2_mul_paned_plan(slots, sa, sb, a_len, b_len, cap,
                                       panel_slots=panel_slots,
                                       pane_rows=pane_rows)
    if panel_slots < cap:
        assert len(plan.panels) > 1, "fixture must exercise paneling"
    if pane_rows < plan.b_rows_pad:
        assert plan.b_rows_pad // pane_rows > 1, \
            "fixture must exercise B pane streaming"
    A = rng.standard_normal(a_len).astype(np.float32)
    A[-1] = 1.0                        # the caller-owned constant-1 slot
    B = rng.standard_normal(b_len).astype(np.float32)
    ref = _ref(slots, sa, sb, A, B, cap)
    floor = 1e-5 * float(np.abs(ref).max() + 1)
    got = np.asarray(route2_mul_paned(plan, jnp.asarray(A),
                                      jnp.asarray(B)))
    assert_close(got, ref, factor=256, abs_floor=floor)


def test_spgemm_paned_engine_forced(monkeypatch):
    """End-to-end two-phase SpGEMM on the PANED engine: 3-arg, 4-arg
    D-fused, numeric reuse with new values, and user-capacity
    re-targeting."""
    import spblas_tpu as sp
    from spblas_tpu.kernels.route_mul_paned import Route2MulPanedPlan
    from spblas_tpu.ops.spgemm import SpgemmState
    from spblas_tpu.utils.generate import generate_csr

    monkeypatch.setenv("SPBLAS_FORCE_ROUTE_SPGEMM", "x")   # enable on CPU
    monkeypatch.setenv("SPBLAS_FORCE_PANED_SPGEMM", "1")
    monkeypatch.delenv("SPBLAS_ROUTE_SPGEMM", raising=False)
    a = generate_csr(350, 350, 3200, seed=31)
    b = generate_csr(350, 350, 3200, seed=32)
    d = generate_csr(350, 350, 1500, seed=33)
    st = SpgemmState()
    info = st.symbolic_compute(a, b, d=sp.scaled(0.25, d))
    assert isinstance(info.plan.route, Route2MulPanedPlan)
    c = st.numeric(a, b, d=sp.scaled(0.25, d))
    Ad, Bd, Dd = (np.asarray(x.todense()) for x in (a, b, d))
    want = Ad @ Bd + 0.25 * Dd
    assert_close(np.asarray(c.todense()), want, factor=256,
                 abs_floor=1e-2)
    a2 = dataclasses.replace(a, values=a.values * 2.0)
    c2 = st.numeric(a2, b, d=sp.scaled(0.25, d))
    assert_close(np.asarray(c2.todense()), 2 * Ad @ Bd + 0.25 * Dd,
                 factor=256, abs_floor=1e-2)

    # user-owned larger capacity keeps the engine (with_capacity)
    info2 = sp.multiply_compute(a, b)
    assert isinstance(info2.plan.route, Route2MulPanedPlan)
    from spblas_tpu.formats.csr import CSR
    big = info2.plan.c_capacity * 2
    c_user = CSR(values=jnp.zeros(big, jnp.float32),
                 rowptr=info2.plan.c_rowptr,
                 colind=jnp.zeros(big, jnp.int32),
                 nnz=jnp.asarray(info2.result_nnz, jnp.int32),
                 shape=info2.plan.shape)
    c3 = sp.multiply_fill(info2, a, b, c=c_user)
    assert int(c3.capacity) == big
    assert_close(np.asarray(c3.todense()), Ad @ Bd, factor=256,
                 abs_floor=1e-2)
