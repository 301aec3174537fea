import time, sys, numpy as np
import jax, jax.numpy as jnp
from spblas_tpu.utils.generate import generate_csr
from spblas_tpu.kernels.route2 import build_route2_plan
from spblas_tpu.kernels.route2_kernel import route2_spmv

m, deg = 100_000, 10
nnz = m * deg
a = generate_csr(m, m, nnz, seed=0)
rp, ci, vv = np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values)
x0 = jax.device_put(np.random.default_rng(1).standard_normal(m).astype(np.float32))
iters = 100

for g in (2, 4, 8, 16):
    t0 = time.perf_counter()
    plan = build_route2_plan(rp, ci, vv, (m, m), nnz, g=g)
    tb = time.perf_counter() - t0

    @jax.jit
    def chain(plan, x):
        def body(_, v):
            y = route2_spmv(plan, v)
            return y[:m] * 1e-3 + x * 0.5
        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(chain(plan, x0))
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
    print(f"g={g}: build {tb:.1f}s fill={plan.fill:.3f} nchunks={plan.nchunks} "
          f"{per*1e6:.0f} us {nnz/per/1e9:.2f} Gnnz/s {per/plan.nchunks*1e9:.0f} ns/chunk", flush=True)
