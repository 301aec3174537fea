import time, sys, numpy as np
import jax, jax.numpy as jnp
from spblas_tpu.utils.generate import generate_rmat_csr, generate_csr
from spblas_tpu.kernels.route_plan import build_route_plan
from spblas_tpu.kernels.route_spmv import route_spmv

which = sys.argv[1]
if which == "rmat":
    a = generate_rmat_csr(131_072, 131_072*16, seed=5); iters = 50
else:
    a = generate_csr(100_000, 100_000, 1_000_000, seed=0); iters = 100
m = a.shape[0]
rp, ci, vv = np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values)
nnz = int(a.nnz)
t0 = time.perf_counter()
plan = build_route_plan(rp, ci, vv, (m, m), nnz)
print(f"v1 {which}: build {time.perf_counter()-t0:.1f}s fill={getattr(plan,'fill',-1):.3f} nchunks={getattr(plan,'nchunks',-1)}", flush=True)
x0 = jax.device_put(np.random.default_rng(1).standard_normal(m).astype(np.float32))

@jax.jit
def chain(plan, x):
    def body(_, v):
        y = route_spmv(plan, v)
        return y[:m] * 1e-3 + x * 0.5
    return jax.lax.fori_loop(0, iters, body, x)

jax.block_until_ready(chain(plan, x0))
best = float("inf")
for r in range(3):
    xr = x0 + jnp.float32(1e-3 * (r + 1))
    jax.block_until_ready(xr)
    t0 = time.perf_counter()
    out = chain(plan, xr)
    jax.block_until_ready(out); float(out[0])
    best = min(best, time.perf_counter() - t0)
per = best / iters
print(f"  {per*1e6:.0f} us/spmv  {nnz/per/1e9:.2f} Gnnz/s", flush=True)
