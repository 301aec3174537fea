"""Plan selection: the optimize ("inspector") step behind matrix_opt.

The reference's vendors hide structure exploitation behind opaque handle
optimization (``optimize_gemv``/``optimize_gemm``,
vendor/onemkl_sycl/detail/matrix_opt hooks); here the chooser is explicit:

  banded (DIA fill fraction high)  → DIA plan: zero index traffic
  general                          → ELL/SELL padded-row plan

Plans are cached on the OptimizedMatrix wrapper per op key, mirroring the
lazy handle cache (detail/get_matrix_handle.hpp:17-40).
"""

from __future__ import annotations

from typing import Tuple

import jax

from spblas_tpu.formats.convert import to_csr
from spblas_tpu.kernels.dia import (DiaPlan, build_dia_plan, dia_spmv,
                                    dia_spmm, dia_fill_fraction)
from spblas_tpu.kernels.ell import (EllPlan, build_ell_plan, ell_spmv,
                                    ell_spmm)

# DIA wins when its dense-diagonal storage is mostly true nonzeros:
# above ~1/3 fill, 4 B/slot dense diagonals move fewer bytes than
# 12 B/nnz CSR-style storage.
_DIA_FILL_THRESHOLD = 0.34


def build_matvec_plan(a) -> Tuple[str, object]:
    a = to_csr(a)
    if dia_fill_fraction(a) >= _DIA_FILL_THRESHOLD:
        return ("dia", build_dia_plan(a))
    return ("ell", build_ell_plan(a))


def plan_spmv(plan: Tuple[str, object], x: jax.Array) -> jax.Array:
    kind, p = plan
    if kind == "dia":
        return dia_spmv(p, x)
    return ell_spmv(p, x)


def plan_spmm(plan: Tuple[str, object], b: jax.Array) -> jax.Array:
    kind, p = plan
    if kind == "dia":
        return dia_spmm(p, b)
    return ell_spmm(p, b)
