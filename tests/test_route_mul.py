"""ROUTE-mul plan: fused SpGEMM-numeric oracle tests (numpy simulator)."""

import numpy as np
import pytest

from spblas_tpu.kernels import route_mul as rm


def _random_stream(rng, n_slots, dup_mean, a_len, b_len):
    """Random slot-sorted expansion stream with duplicates."""
    dups = rng.poisson(dup_mean, n_slots) + 1
    slots = np.repeat(np.arange(n_slots), dups)
    ne = len(slots)
    src_a = rng.integers(0, a_len, ne)
    src_b = rng.integers(0, b_len, ne)
    return slots, src_a, src_b


@pytest.mark.parametrize("n_slots,dup,a_len,b_len", [
    (500, 2, 300, 400),
    (3000, 3, 5000, 9000),      # multi-window sources
    (5000, 0, 200, 200),        # no duplicates
    (100, 40, 50, 60),          # heavy duplication (long segments)
])
def test_route_mul_matches_direct(n_slots, dup, a_len, b_len):
    rng = np.random.default_rng(n_slots + dup)
    slots, src_a, src_b = _random_stream(rng, n_slots, dup, a_len, b_len)
    a_arr = rng.standard_normal(a_len).astype(np.float32)
    b_arr = rng.standard_normal(b_len).astype(np.float32)
    cap = n_slots
    plan = rm.build_route_mul_plan(slots, src_a, src_b, a_len, b_len, cap)
    got = rm.route_mul_numpy(plan, a_arr, b_arr)
    want = np.zeros(cap, np.float64)
    np.add.at(want, slots, a_arr[src_a].astype(np.float64)
              * b_arr[src_b])
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-4,
                               atol=2e-4)
    assert plan.fill > 0.1, plan.fill


def test_route_mul_empty():
    plan = rm.build_route_mul_plan(np.zeros(0, np.int64),
                                   np.zeros(0, np.int64),
                                   np.zeros(0, np.int64), 10, 10, 16)
    out = rm.route_mul_numpy(plan, np.ones(10, np.float32),
                             np.ones(10, np.float32))
    np.testing.assert_array_equal(out, np.zeros(16, np.float32))


def test_route_mul_native_packer_bit_identical(monkeypatch):
    """The C++ packer must mirror the python packer exactly (same chunks,
    same tiles) — run twice to catch cross-call state leaks."""
    from spblas_tpu import native
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    for trial in range(2):
        slots, src_a, src_b = _random_stream(rng, 4000, 3, 7000, 9000)
        cap = 4000
        p_nat = rm.build_route_mul_plan(slots, src_a, src_b, 7000, 9000,
                                        cap)
        with monkeypatch.context() as mp:
            mp.setattr(rm, "_pack_all_mul_native",
                       lambda *a, **k: False)
            p_py = rm.build_route_mul_plan(slots, src_a, src_b, 7000,
                                           9000, cap)
        for f in ("tile1", "tile2", "tile3", "a_base", "b_base",
                  "o_base"):
            np.testing.assert_array_equal(
                np.asarray(getattr(p_nat, f)),
                np.asarray(getattr(p_py, f)), err_msg=f"{f} trial{trial}")


def test_route_mul_kernel_interpret_matches_simulator():
    import jax.numpy as jnp
    from spblas_tpu.kernels.route_mul_kernel import route_mul
    rng = np.random.default_rng(0)
    slots, src_a, src_b = _random_stream(rng, 2000, 2, 3000, 5000)
    a_arr = rng.standard_normal(3000).astype(np.float32)
    b_arr = rng.standard_normal(5000).astype(np.float32)
    plan = rm.build_route_mul_plan(slots, src_a, src_b, 3000, 5000, 2000)
    want = rm.route_mul_numpy(plan, a_arr, b_arr)
    got = np.asarray(route_mul(plan, jnp.asarray(a_arr),
                               jnp.asarray(b_arr), interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
