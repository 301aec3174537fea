"""Profile the paned mul-engine host build at 10M expansion
(VERDICT r4 #3: PERF_NOTES claims 12.9 s, BENCH_r04 records pack 51 s).

Host-only (CPU platform): separates the numpy/native pack from the
device upload that the bench's pack_s may be folding in.  Run solo and
after a synthetic allocator-warming pass to probe the arena-state
hypothesis.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["SPBLAS_FORCE_ROUTE_SPGEMM"] = "1"
os.environ["SPBLAS_FORCE_PANED_SPGEMM"] = "1"

from spblas_tpu import native
from spblas_tpu.utils.generate import generate_csr_arrays
from spblas_tpu.utils import profiling

m, nnz = 100_000, 1_000_000
vals, rowptr, colind = generate_csr_arrays(m, m, nnz, seed=0)

# expansion streams exactly as ops/spgemm._try_build_route does
a_rp = rowptr.astype(np.int64)
a_ci = colind.astype(np.int64)
cnt = a_rp[a_ci + 1] - a_rp[a_ci]
total = int(cnt.sum())
print(f"expansion {total}")
t0 = time.perf_counter()
nat = native.mul_expand(m, nnz, a_rp, a_ci.astype(np.int32), nnz, a_rp,
                        a_ci.astype(np.int32), 0, None, None, nnz, nnz,
                        total)
print(f"mul_expand {time.perf_counter() - t0:.2f} s")
slots, sa, sb, nnz_c = nat
print(f"c_nnz {nnz_c}")

from spblas_tpu.kernels.route_mul_paned import build_route2_mul_paned_plan

for run in ("cold", "warm"):
    profiling._PHASES.clear() if hasattr(profiling, "_PHASES") else None
    t0 = time.perf_counter()
    plan = build_route2_mul_paned_plan(slots, sa, sb, nnz + 1, nnz,
                                       1 << 24)
    dt = time.perf_counter() - t0
    print(f"{run}: build_route2_mul_paned_plan {dt:.2f} s, "
          f"chunks {plan.nchunks}, fill {plan.fill:.4f}")
    ph = profiling.inspect_phases("route2_mul")
    print("  phases:", {k: round(v, 2) for k, v in ph.items()})

if "--profile" in sys.argv:
    import cProfile
    import io
    import pstats
    pr = cProfile.Profile()
    pr.enable()
    build_route2_mul_paned_plan(slots, sa, sb, nnz + 1, nnz, 1 << 24)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumtime").print_stats(25)
    print(s.getvalue()[:5000])
