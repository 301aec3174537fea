"""Optimized-plan kernels: ELL and DIA SpMV/SpMM vs the generic path,
and plan selection through matrix_opt."""

import numpy as np

import spblas_tpu as sp
from spblas_tpu.kernels import dia, ell, plans
from spblas_tpu.utils import generate as gen
from tests.util import assert_close, dense_from_csr


def test_ell_plan_spmv():
    a = gen.generate_csr(100, 80, 800, seed=0)
    x = gen.generate_vector(80, seed=1)
    plan = ell.build_ell_plan(a)
    y = ell.ell_spmv(plan, x)
    assert_close(np.asarray(y), dense_from_csr(a) @ x)


def test_ell_plan_spmm():
    a = gen.generate_csr(60, 50, 500, seed=2)
    b = gen.generate_dense(50, 16, seed=3)
    plan = ell.build_ell_plan(a)
    c = ell.ell_spmm(plan, b)
    assert_close(np.asarray(c), dense_from_csr(a) @ b, abs_floor=1e-3)


def test_ell_refresh_values():
    a = gen.generate_csr(40, 40, 300, seed=4)
    x = gen.generate_vector(40, seed=5)
    plan = ell.build_ell_plan(a)
    a2 = a.update(values=np.asarray(a.values) * 3)
    plan2 = plan.refresh_values(a2.values)
    assert_close(np.asarray(ell.ell_spmv(plan2, x)),
                 3 * (dense_from_csr(a) @ x))


def test_dia_plan_banded():
    a = gen.generate_banded_csr(200, 200, bandwidth=9, seed=6)
    x = gen.generate_vector(200, seed=7)
    assert dia.dia_fill_fraction(a) > 0.9
    plan = dia.build_dia_plan(a)
    y = dia.dia_spmv(plan, x)
    assert_close(np.asarray(y), dense_from_csr(a) @ x, abs_floor=1e-4)
    b = gen.generate_dense(200, 8, seed=8)
    c = dia.dia_spmm(plan, b)
    assert_close(np.asarray(c), dense_from_csr(a) @ b, abs_floor=1e-2)


def test_dia_rectangular():
    a = gen.generate_banded_csr(50, 70, bandwidth=5, seed=9)
    x = gen.generate_vector(70, seed=10)
    plan = dia.build_dia_plan(a)
    assert_close(np.asarray(dia.dia_spmv(plan, x)), dense_from_csr(a) @ x,
                 abs_floor=1e-4)


def test_plan_chooser():
    banded = gen.generate_banded_csr(128, 128, bandwidth=7, seed=11)
    kind, _ = plans.build_matvec_plan(banded)
    assert kind == "dia"
    scattered = gen.generate_csr(100, 100, 400, seed=12)
    kind, _ = plans.build_matvec_plan(scattered)
    assert kind == "sell"


def test_matrix_opt_uses_plan():
    a = gen.generate_banded_csr(64, 64, bandwidth=5, seed=13)
    x = gen.generate_vector(64, seed=14)
    opt = sp.matrix_opt(a)
    y = sp.multiply(opt, x)
    assert_close(np.asarray(y), dense_from_csr(a) @ x, abs_floor=1e-4)
    assert "matvec" in opt._plans  # cached after first use
    b = gen.generate_dense(64, 8, seed=15)
    c = sp.multiply(opt, b)
    assert_close(np.asarray(c), dense_from_csr(a) @ b, abs_floor=1e-2)


def test_band_plan_spmv_spmm():
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.utils.generate import generate_banded_csr
    from spblas_tpu.kernels.banded import (build_band_plan, band_spmv,
                                           band_spmm)
    a = generate_banded_csr(300, 300, 33, seed=5)
    plan = build_band_plan(a)
    dense = np.asarray(a.todense())
    x = np.random.default_rng(6).standard_normal(300).astype(np.float32)
    y = band_spmv(plan, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-4,
                               atol=1e-4)
    b = np.random.default_rng(7).standard_normal((300, 32)).astype(
        np.float32)
    c = band_spmm(plan, jnp.asarray(b), interpret=True)
    np.testing.assert_allclose(np.asarray(c), dense @ b, rtol=1e-4,
                               atol=1e-4)


def test_band_plan_bf16_storage_error_model():
    """bf16 panel storage halves streamed bytes (the 84-Gnnz/s headline
    variant); error analysis for the PERF_NOTES open item.

    Values are rounded once to bf16 (rel err <= 2^-9 per entry) and the
    in-kernel accumulation stays f32, so for a row with b entries the
    rounding errors add as independent perturbations:
    |y_bf16 - y| <= 2^-9 * sum_j |a_ij x_j|.  The test asserts that
    entrywise bound (deterministic, not probabilistic) and that plain
    f32 panels stay ~100x tighter, pinning the error to storage."""
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.utils.generate import generate_banded_csr
    from spblas_tpu.kernels.banded import build_band_plan, band_spmv
    m, bw = 1024, 65
    a = generate_banded_csr(m, m, bw, seed=11)
    dense = np.asarray(a.todense(), np.float64)
    rng = np.random.default_rng(12)
    x = rng.standard_normal(m).astype(np.float32)
    y_ref = dense @ x.astype(np.float64)
    # the bound: 2^-9 * |A| |x| (+ f32 accumulation dust)
    bound = (2.0 ** -9) * (np.abs(dense) @ np.abs(x)) + 1e-5 * np.abs(
        y_ref).max()
    y16 = np.asarray(band_spmv(build_band_plan(a, dtype=jnp.bfloat16),
                               jnp.asarray(x), interpret=True),
                     np.float64)
    err16 = np.abs(y16 - y_ref)
    assert (err16 <= bound).all(), (err16 / bound).max()
    y32 = np.asarray(band_spmv(build_band_plan(a), jnp.asarray(x),
                               interpret=True), np.float64)
    err32 = np.abs(y32 - y_ref)
    # f32 storage must be far inside the bf16 envelope
    assert err32.max() <= bound.max() / 20


def test_band_plan_rectangular_guard():
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.utils.generate import generate_banded_csr
    from spblas_tpu.kernels.banded import build_band_plan, band_spmv
    a = generate_banded_csr(200, 160, 9, seed=8)
    plan = build_band_plan(a)
    x = np.random.default_rng(9).standard_normal(160).astype(np.float32)
    y = band_spmv(plan, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(a.todense()) @ x,
                               rtol=1e-4, atol=1e-4)


def test_bsr_plan_chooser_block_structured(monkeypatch):
    """A block-structured matrix should take the BSR plan on TPU; force
    the TPU branch by monkeypatching the platform check."""
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.kernels import plans
    from spblas_tpu.formats.csr import CSR

    monkeypatch.setattr(plans, "_on_tpu", lambda: True)
    rng = np.random.default_rng(0)
    dense = np.zeros((64, 512), np.float32)
    for _ in range(10):
        i, j = rng.integers(8), rng.integers(4)
        dense[i*8:(i+1)*8, j*128:(j+1)*128] = rng.standard_normal((8, 128))
    a = CSR.from_dense(dense)
    kind, plan = plans.build_matvec_plan(a)
    assert kind == "bsr"
    x = rng.standard_normal(512).astype(np.float32)
    y = plans.plan_spmv((kind, plan), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-4,
                               atol=1e-4)
    b = rng.standard_normal((512, 128)).astype(np.float32)
    c = plans.plan_spmm((kind, plan), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(c), dense @ b, rtol=1e-3,
                               atol=1e-3)


def test_band_spmm_stream_matches_resident():
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.utils.generate import generate_banded_csr
    from spblas_tpu.kernels.banded import (build_band_plan, band_spmm,
                                           band_spmm_stream)
    a = generate_banded_csr(700, 700, 31, seed=9)
    plan = build_band_plan(a)
    b = np.random.default_rng(10).standard_normal((700, 32)).astype(
        np.float32)
    c1 = band_spmm(plan, jnp.asarray(b), interpret=True)
    c2 = band_spmm_stream(plan, jnp.asarray(b), interpret=True)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=1e-5, atol=1e-5)


def test_band_power_iterations():
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.utils.generate import generate_banded_csr
    from spblas_tpu.kernels.banded import (build_band_plan,
                                           band_power_iterations)
    m = 700
    a = generate_banded_csr(m, m, 11, seed=0)
    a = dataclasses.replace(a, values=a.values / jnp.float32(11.0))
    plan = build_band_plan(a)
    dense = np.asarray(a.todense())
    x = np.random.default_rng(1).standard_normal(m).astype(np.float32)
    y = band_power_iterations(plan, jnp.asarray(x), iters=5,
                              interpret=True)
    exp = x.copy()
    for _ in range(5):
        exp = dense @ exp
    np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-4, atol=1e-5)


def test_plan_spmm_band_streams_large_b(monkeypatch):
    """Large B must route to the streamed kernel (resident B would
    overflow VMEM) and still match the resident result."""
    import numpy as np
    import jax.numpy as jnp
    from spblas_tpu.kernels import plans
    from spblas_tpu.utils.generate import generate_banded_csr
    monkeypatch.setattr(plans, "_on_tpu", lambda: True)
    a = generate_banded_csr(2048, 2048, 17, seed=20)
    kind, plan = plans.build_matvec_plan(a)
    assert kind == "band"
    b = np.random.default_rng(21).standard_normal((2048, 1024)).astype(
        np.float32)
    resident_bytes = (plan.nblocks * 128 + plan.width) * 1024 * 4
    assert resident_bytes > 6 * 1024 * 1024   # must take the stream path
    c = plans.plan_spmm((kind, plan), jnp.asarray(b))
    nnz = int(a.nnz)
    rowptr = np.asarray(a.rowptr)
    cols = np.asarray(a.colind)[:nnz]
    vals = np.asarray(a.values)[:nnz]
    rows = np.repeat(np.arange(2048), np.diff(np.minimum(rowptr, nnz)))
    exp = np.zeros((2048, 1024), np.float32)
    np.add.at(exp, rows, vals[:, None] * b[cols])
    np.testing.assert_allclose(np.asarray(c), exp, rtol=1e-3, atol=1e-3)
