"""Plan serialization round-trips (SURVEY.md §5.4)."""

import numpy as np

import spblas_tpu as sp
from spblas_tpu.kernels.dia import build_dia_plan, dia_spmv
from spblas_tpu.kernels.ell import build_ell_plan, ell_spmv
from spblas_tpu.utils.generate import generate_banded_csr, generate_csr, \
    generate_triangular_csr, generate_vector
from spblas_tpu.utils.serialize import load_plan, save_plan


def test_ell_plan_roundtrip(tmp_path):
    a = generate_csr(50, 60, 400, seed=0)
    x = generate_vector(60, seed=1)
    plan = build_ell_plan(a)
    p = str(tmp_path / "ell.npz")
    save_plan(p, plan)
    plan2 = load_plan(p)
    np.testing.assert_allclose(np.asarray(ell_spmv(plan2, x)),
                               np.asarray(ell_spmv(plan, x)))


def test_dia_plan_roundtrip(tmp_path):
    a = generate_banded_csr(64, 64, 3, seed=2)
    x = generate_vector(64, seed=3)
    plan = build_dia_plan(a)
    p = str(tmp_path / "dia.npz")
    save_plan(p, plan)
    plan2 = load_plan(p)
    assert plan2.offsets == plan.offsets
    np.testing.assert_allclose(np.asarray(dia_spmv(plan2, x)),
                               np.asarray(dia_spmv(plan, x)))


def test_trsv_plan_roundtrip(tmp_path):
    L = generate_triangular_csr(80, seed=4, lower=True)
    b = generate_vector(80, seed=5)
    info = sp.triangular_solve_inspect(L, uplo="lower")
    p = str(tmp_path / "trsv.npz")
    save_plan(p, info.plan)
    plan2 = load_plan(p)
    info2 = info.update(plan=plan2)
    x1 = sp.triangular_solve(L, b, uplo="lower", info=info)
    x2 = sp.triangular_solve(L, b, uplo="lower", info=info2)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))


def test_spgemm_plan_roundtrip(tmp_path):
    a = generate_csr(40, 40, 300, seed=6)
    b = generate_csr(40, 40, 300, seed=7)
    info = sp.multiply_compute(a, b)
    p = str(tmp_path / "spgemm.npz")
    save_plan(p, info.plan)
    plan2 = load_plan(p)
    c1 = sp.multiply_fill(info, a, b)
    c2 = sp.multiply_fill(info.update(plan=plan2), a, b)
    np.testing.assert_allclose(np.asarray(c1.todense()),
                               np.asarray(c2.todense()))
