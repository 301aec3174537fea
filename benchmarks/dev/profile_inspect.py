"""Phase-level profile of triangular_solve_inspect + spgemm engine build
on the real chip — locates the round-2 inspection-latency cliff
(BENCH_r02: sptrsv.inspect_s=109 s, spgemm.symbolic_reuse_s=4.1 s)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

T0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - T0:8.2f}s] {label}", flush=True)


mark("start")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
mark("jax imported")
jax.devices()
mark("backend up")

from spblas_tpu.utils.generate import generate_triangular_csr  # noqa: E402
mark("spblas imported")

m = 20_000
L = generate_triangular_csr(m, seed=0, lower=True, density=0.0005)
jax.block_until_ready(L.values)
mark(f"matrix built on device (nnz={int(L.nnz)})")

# ---- phase breakdown of triangular_solve_inspect ----
from spblas_tpu import native  # noqa: E402
from spblas_tpu.formats.convert import to_csr  # noqa: E402

t = time.perf_counter()
a = to_csr(L)
rowptr = np.asarray(a.rowptr).astype(np.int64)
colind = np.asarray(a.colind)
values_h = np.asarray(a.values)
nnz = int(a.nnz)
mark(f"device->host pull of csr arrays: {time.perf_counter()-t:.3f}s")

t = time.perf_counter()
levels, diag_pos, num_levels = native.level_schedule(
    m, nnz, rowptr, colind, True, False)
mark(f"native level_schedule (incl. first-use build): "
     f"{time.perf_counter()-t:.3f}s")

t = time.perf_counter()
from spblas_tpu.kernels.route2 import build_route2_solve_plan  # noqa: E402
plan = build_route2_solve_plan(rowptr, colind, values_h, (m, m), nnz,
                               levels, diag_pos, False, True)
mark(f"build_route2_solve_plan TOTAL: {time.perf_counter()-t:.3f}s "
     f"(nchunks={plan.nchunks}, tile={plan.tile.shape})")
t = time.perf_counter()
jax.block_until_ready((plan.tile, plan.val, plan.val_src))
mark(f"block_until_ready on plan arrays: {time.perf_counter()-t:.3f}s")
tile_mb = plan.tile.size * 4 / 1e6
mark(f"plan bytes: tile {tile_mb:.1f} MB x3 streams "
     f"~{3*tile_mb:.1f} MB total")

# full inspect as the bench times it
from spblas_tpu.ops.triangular_solve import triangular_solve_inspect  # noqa: E402
t = time.perf_counter()
info = triangular_solve_inspect(L, uplo="lower")
mark(f"full triangular_solve_inspect (2nd build): "
     f"{time.perf_counter()-t:.3f}s")

# ---- spgemm engine build breakdown ----
from spblas_tpu.ops.spgemm import spgemm_compute  # noqa: E402
from spblas_tpu.utils.generate import generate_csr  # noqa: E402
ga = generate_csr(2_000, 2_000, 40_000, seed=0)
jax.block_until_ready(ga.values)
mark("spgemm operand ready")
t = time.perf_counter()
info0 = spgemm_compute(ga, ga, reuse=False)
mark(f"spgemm symbolic no-engine (cold): {time.perf_counter()-t:.3f}s")
t = time.perf_counter()
info0 = spgemm_compute(ga, ga, reuse=False)
mark(f"spgemm symbolic no-engine (warm): {time.perf_counter()-t:.3f}s")
t = time.perf_counter()
info1 = spgemm_compute(ga, ga)
mark(f"spgemm symbolic + route engine: {time.perf_counter()-t:.3f}s")
r = info1.plan.route
if r is not None:
    mb = sum(np.asarray(x).size * 4 for x in
             (r.tile_a, r.tile_b) if hasattr(r, 'tile_a')) / 1e6
    mark(f"engine plan ~{mb:.1f} MB tiles")
mark("done")
