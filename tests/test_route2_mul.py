"""ROUTE2-mul engine tests: the default fused SpGEMM numeric on TPU
(kernels/route2.py build_route2_mul_plan + route2_mul; native packer
native/src/route2_pack.cpp spblas_route2_mul_pack)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spblas_tpu.kernels.route2 import (build_route2_mul_plan,
                                       route2_mul_numpy)
from spblas_tpu.kernels.route2_kernel import route2_mul
from tests.util import assert_close


def _ref(slots, sa, sb, A, B, cap):
    out = np.zeros(cap, np.float32)
    np.add.at(out, slots, A[sa] * B[sb])
    return out


@pytest.mark.parametrize("n_ent,cap,hub", [
    (20_000, 4096, False),
    (5_500, 2048, True),        # 500-dupe hub slot -> aux reduction
    (300, 1024, False),         # tiny
])
def test_route2_mul_matches_scatter(n_ent, cap, hub):
    rng = np.random.default_rng(n_ent)
    if hub:
        slots = np.sort(np.concatenate(
            [np.zeros(500, np.int64), rng.integers(0, cap, n_ent - 500)]))
    else:
        slots = np.sort(rng.integers(0, cap, n_ent))
    a_len, b_len = 1501, 1800
    sa = rng.integers(0, a_len - 1, n_ent)
    sb = rng.integers(0, b_len, n_ent)
    plan = build_route2_mul_plan(slots, sa, sb, a_len, b_len, cap)
    A = rng.standard_normal(a_len).astype(np.float32)
    A[-1] = 1.0                 # the caller-owned constant-1 slot
    B = rng.standard_normal(b_len).astype(np.float32)
    ref = _ref(slots, sa, sb, A, B, cap)
    floor = 1e-5 * float(np.abs(ref).max() + 1)
    assert_close(route2_mul_numpy(plan, A, B), ref, factor=256,
                 abs_floor=floor)
    assert_close(np.asarray(route2_mul(plan, jnp.asarray(A),
                                       jnp.asarray(B))),
                 ref, factor=256, abs_floor=floor)


def test_spgemm_route2_mul_engine_forced(monkeypatch):
    """Two-phase SpGEMM with the engine forced on (the TPU default):
    3-arg, 4-arg D-fused, and numeric reuse with new values."""
    import dataclasses
    import spblas_tpu as sp
    from spblas_tpu.ops.spgemm import SpgemmState
    from spblas_tpu.utils.generate import generate_csr

    monkeypatch.setenv("SPBLAS_FORCE_ROUTE_SPGEMM", "1e")  # truthy
    monkeypatch.delenv("SPBLAS_ROUTE_SPGEMM", raising=False)
    a = generate_csr(350, 350, 3200, seed=31)
    b = generate_csr(350, 350, 3200, seed=32)
    d = generate_csr(350, 350, 1500, seed=33)
    st = SpgemmState()
    info = st.symbolic_compute(a, b, d=sp.scaled(0.25, d))
    from spblas_tpu.kernels.route2 import Route2MulPlan
    assert isinstance(info.plan.route, Route2MulPlan)
    c = st.numeric(a, b, d=sp.scaled(0.25, d))
    Ad, Bd, Dd = (np.asarray(x.todense()) for x in (a, b, d))
    want = Ad @ Bd + 0.25 * Dd
    assert_close(np.asarray(c.todense()), want, factor=256,
                 abs_floor=1e-2)
    a2 = dataclasses.replace(a, values=a.values * 2.0)
    c2 = st.numeric(a2, b, d=sp.scaled(0.25, d))
    assert_close(np.asarray(c2.todense()), 2 * Ad @ Bd + 0.25 * Dd,
                 factor=256, abs_floor=1e-2)


def test_spgemm_with_capacity_keeps_engine(monkeypatch):
    """Re-targeting a route-bearing plan at user-owned capacity must
    keep the fused engine (the extra capacity is canonical zero
    padding) — VERDICT r2 next-6: with_capacity used to drop it."""
    import jax.numpy as jnp
    import spblas_tpu as sp
    from spblas_tpu.formats.csr import CSR
    from spblas_tpu.utils.generate import generate_csr

    monkeypatch.setenv("SPBLAS_FORCE_ROUTE_SPGEMM", "1")
    a = generate_csr(350, 350, 3200, seed=31)
    b = generate_csr(350, 350, 3200, seed=32)
    info = sp.multiply_compute(a, b)
    assert info.plan.route is not None
    want = np.asarray(a.todense()) @ np.asarray(b.todense())

    # user allocates LARGER capacity than the plan's (the
    # allocate-then-update handshake, examples/simple_spgemm.cpp:50-60)
    big = info.plan.c_capacity * 2
    c_user = CSR(values=jnp.zeros(big, jnp.float32),
                 rowptr=info.plan.c_rowptr,
                 colind=jnp.zeros(big, jnp.int32),
                 nnz=jnp.asarray(info.result_nnz, jnp.int32),
                 shape=info.plan.shape)
    plan2 = info.plan.with_capacity(big)
    assert plan2.route is not None
    c = sp.multiply_fill(info, a, b, c=c_user)
    assert int(c.capacity) == big
    assert_close(np.asarray(c.todense()), want, factor=256,
                 abs_floor=1e-2)
