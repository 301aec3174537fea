"""Mimic bench section_sptrsv exactly, with fine-grained timers inside
triangular_solve_inspect (fresh process, as the bench subprocess runs)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

T0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - T0:8.2f}s] {label}", flush=True)


import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spblas_tpu.utils.generate import generate_triangular_csr  # noqa: E402

m = 20_000
L = generate_triangular_csr(m, seed=0, lower=True, density=0.0005)
mark("matrix generated (bench does NOT block_until_ready here)")

# --- inline triangular_solve_inspect with timers ---
from spblas_tpu import native  # noqa: E402
from spblas_tpu import views as _v  # noqa: E402
from spblas_tpu.formats.convert import to_csr  # noqa: E402

t_all = time.perf_counter()
a = to_csr(_v.get_ultimate_base(L))
mark("to_csr")
rowptr = np.asarray(a.rowptr).astype(np.int64)
mark("rowptr pull")
colind = np.asarray(a.colind)
mark("colind pull")
nnz = int(a.nnz)
mark("nnz pull")
levels, diag_pos, num_levels = native.level_schedule(
    m, nnz, rowptr, colind, True, False)
mark("level_schedule")
vals_h = np.asarray(a.values)
mark("values pull")
from spblas_tpu.kernels.route2 import build_route2_solve_plan  # noqa: E402
t = time.perf_counter()
plan = build_route2_solve_plan(rowptr, colind, vals_h, (m, m), nnz,
                               levels, diag_pos, False, True)
mark(f"build_route2_solve_plan: {time.perf_counter()-t:.3f}s")
jax.block_until_ready(plan.tile)
mark("plan arrays ready")
mark(f"TOTAL so far {time.perf_counter()-t_all:.2f}s")

from spblas_tpu.ops.triangular_solve import triangular_solve_inspect  # noqa: E402
t = time.perf_counter()
info = triangular_solve_inspect(L, uplo="lower")
mark(f"full inspect (after warm): {time.perf_counter()-t:.3f}s")
