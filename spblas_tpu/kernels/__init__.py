"""Structured compute kernels — the TPU-native vendor-backend slot.

Where the reference swaps in cuSPARSE/rocSPARSE/oneMKL behind the same
API (SURVEY.md §2.5), this package holds the structure-exploiting plans
and Pallas kernels the plan chooser (`plans.build_matvec_plan`) selects
from, driven by measured platform limits (PERF_NOTES.md).
"""

from spblas_tpu.kernels.banded import (
    BandPlan, PermutedBandPlan, band_plan_from_diags, band_power_iterations, band_spmm,
    band_spmm_stream,
    band_spmv, band_spmv_ad, build_band_plan,
    build_permuted_band_plan,
    permuted_band_spmv,
)
from spblas_tpu.kernels.bsr_pallas import bsr_spmm, bsr_spmv
from spblas_tpu.kernels.bsr_spgemm import (
    BsrSpgemmPlan, bsr_spgemm, bsr_spgemm_compute, bsr_spgemm_numeric,
)
from spblas_tpu.kernels.dia import DiaPlan, build_dia_plan, dia_spmm, \
    dia_spmv
from spblas_tpu.kernels.ell import EllPlan, build_ell_plan, ell_spmm, \
    ell_spmv
from spblas_tpu.kernels.plans import build_matvec_plan, plan_spmm, \
    plan_spmv

__all__ = [
    "BandPlan", "PermutedBandPlan", "band_plan_from_diags", "band_power_iterations", "band_spmm",
    "band_spmm_stream",
    "band_spmv", "band_spmv_ad", "build_band_plan",
    "build_permuted_band_plan",
    "permuted_band_spmv",
    "bsr_spmm", "bsr_spmv",
    "BsrSpgemmPlan", "bsr_spgemm", "bsr_spgemm_compute",
    "bsr_spgemm_numeric",
    "DiaPlan", "build_dia_plan", "dia_spmm", "dia_spmv",
    "EllPlan", "build_ell_plan", "ell_spmm", "ell_spmv",
    "build_matvec_plan", "plan_spmm", "plan_spmv",
]
