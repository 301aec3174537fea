import sys, time, numpy as np
import jax, jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spl
from spblas_tpu.utils.generate import generate_triangular_csr
from spblas_tpu.kernels.route2 import build_route2_solve_plan
from spblas_tpu.kernels.route2_kernel import route2_solve
from spblas_tpu import native

m = 20_000
any_lane = len(sys.argv) > 1 and sys.argv[1] == "any"
L = generate_triangular_csr(m, seed=0, lower=True, density=0.0005)
rp, ci, vv = np.asarray(L.rowptr), np.asarray(L.colind), np.asarray(L.values)
nnz = int(L.nnz)
levels, diag_pos, nl = native.level_schedule(m, nnz, rp.astype(np.int64), ci, True, False)
t0 = time.perf_counter()
plan = build_route2_solve_plan(rp, ci, vv, (m, m), nnz, levels, diag_pos, False, True,
                               any_lane=any_lane)
print("any_lane =", plan.any_lane, flush=True)
print(f"build {time.perf_counter()-t0:.1f}s levels={nl} nchunks={plan.nchunks} fill={plan.fill:.3f} nnz={nnz}", flush=True)
b = np.random.default_rng(1).standard_normal(m).astype(np.float32)
y0 = (b / vv[diag_pos]).astype(np.float32)

# correctness on TPU
xk = np.asarray(route2_solve(plan, jnp.asarray(y0)))
A = sp.csr_matrix((vv[:nnz], ci[:nnz], rp), shape=(m, m))
ref = spl.spsolve_triangular(A, b, lower=True)
print("TPU rel-err:", float(np.abs(xk - ref).max() / np.abs(ref).max()), flush=True)

# timing, chained with distinct inputs
iters = 50
@jax.jit
def chain(plan, y):
    def body(_, v):
        x = route2_solve(plan, v)
        return x * 1e-3 + y * 0.5
    return jax.lax.fori_loop(0, iters, body, y)
y0j = jnp.asarray(y0)
jax.block_until_ready(chain(plan, y0j))
best = float("inf")
for r in range(3):
    yr = y0j + jnp.float32(1e-4 * (r + 1))
    jax.block_until_ready(yr)
    t0 = time.perf_counter()
    out = chain(plan, yr)
    jax.block_until_ready(out); float(out[0])
    best = min(best, time.perf_counter() - t0)
per = best / iters
print(f"{per*1e3:.2f} ms/solve  {m/per/1e3:.0f}k rows/s  (round-1: 43.7 ms, 458k rows/s)", flush=True)
