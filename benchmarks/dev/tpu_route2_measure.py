import time, numpy as np, sys
import jax, jax.numpy as jnp
from spblas_tpu.utils.generate import generate_csr, generate_rmat_csr
from spblas_tpu.kernels.route2 import build_route2_plan
from spblas_tpu.kernels.route2_kernel import route2_spmv

def bench(tag, a, m, nnz, iters=100):
    t0 = time.perf_counter()
    rp, ci, vv = np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values)
    nnz = int(a.nnz)
    plan = build_route2_plan(rp, ci, vv, (m, m), nnz)
    tb = time.perf_counter() - t0
    print(f"{tag}: build {tb:.1f}s g={plan.g} fill={plan.fill:.3f} nchunks={plan.nchunks}", flush=True)
    x0 = jax.device_put(np.random.default_rng(1).standard_normal(m).astype(np.float32))

    @jax.jit
    def chain(plan, x):
        def body(_, v):
            y = route2_spmv(plan, v)
            return y[:m] * 1e-3 + x * 0.5
        return jax.lax.fori_loop(0, iters, body, x)

    t0 = time.perf_counter()
    jax.block_until_ready(chain(plan, x0))
    print(f"  compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for r in range(3):
        xr = x0 + jnp.float32(1e-3 * (r + 1))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(plan, xr)
        jax.block_until_ready(out)
        float(out[0])
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"  {per*1e6:.0f} us/spmv  {nnz/per/1e9:.2f} Gnnz/s  {per/plan.nchunks*1e9:.0f} ns/chunk", flush=True)

which = sys.argv[1]
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 0
if which == "u100k":
    m, deg = 100_000, 10
    bench("uniform100k", generate_csr(m, m, m*deg, seed=0), m, m*deg, iters=iters or 100)
elif which == "u300k":
    m, deg = 300_000, 10
    bench("uniform300k", generate_csr(m, m, m*deg, seed=0), m, m*deg, iters=iters or 50)
elif which == "rmat":
    m, deg = 131_072, 16
    bench("rmat131k", generate_rmat_csr(m, m*deg, seed=5), m, m*deg, iters=iters or 50)
