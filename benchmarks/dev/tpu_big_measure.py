import time, sys, numpy as np
import jax, jax.numpy as jnp
from spblas_tpu.utils.generate import generate_csr

def chain_time(step, params, x0, iters, reps=3):
    @jax.jit
    def chain(params, x):
        return jax.lax.fori_loop(0, iters, lambda _, v: step(params, v), x)
    jax.block_until_ready(chain(params, x0))
    best = float("inf")
    for r in range(reps):
        xr = x0 + jnp.float32(1e-3 * (r + 1))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(params, xr)
        jax.block_until_ready(out)
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters

which = sys.argv[1]
if which in ("v1_300k", "v1_1m", "v2_1m"):
    m = 300_000 if "300k" in which else 1_000_000
    iters = 50 if m == 300_000 else 20
    a = generate_csr(m, m, m*10, seed=0)
    rp, ci, vv = np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values)
    nnz = int(a.nnz)
    t0 = time.perf_counter()
    if which.startswith("v1"):
        from spblas_tpu.kernels.route_plan import build_route_plan
        from spblas_tpu.kernels.route_spmv import route_spmv as apply_fn
        plan = build_route_plan(rp, ci, vv, (m, m), nnz)
    else:
        from spblas_tpu.kernels.route2 import build_route2_plan
        from spblas_tpu.kernels.route2_kernel import route2_spmv as apply_fn
        plan = build_route2_plan(rp, ci, vv, (m, m), nnz)
    print(f"{which}: build {time.perf_counter()-t0:.1f}s fill={plan.fill:.3f} nchunks={plan.nchunks}", flush=True)
    x0 = jax.device_put(np.random.default_rng(1).standard_normal(m).astype(np.float32))
    def step(plan, v):
        y = apply_fn(plan, v)
        return y[:m] * 1e-3 + 0.5
    sec = chain_time(step, plan, x0, iters)
    print(f"  {sec*1e6:.0f} us/spmv  {nnz/sec/1e9:.2f} Gnnz/s", flush=True)
elif which == "ellspmm":
    m = 100_000
    a = generate_csr(m, m, m*10, seed=0)
    from spblas_tpu.kernels.ell import build_ell_plan, ell_spmm
    t0 = time.perf_counter()
    plan = build_ell_plan(a)
    print(f"ell plan: build {time.perf_counter()-t0:.1f}s W={plan.width} m_pad={plan.m_pad}", flush=True)
    nnz = int(a.nnz)
    for k in (64, 256):
        B0 = jax.device_put(np.random.default_rng(1).standard_normal((m, k)).astype(np.float32))
        def step(plan, Bc):
            C = ell_spmm(plan, Bc)
            return C * 1e-3 + 0.5
        sec = chain_time(step, plan, B0, 20)
        fl = 2 * nnz * k
        print(f"  ell_spmm k={k}: {sec*1e3:.2f} ms  {fl/sec/1e9:.1f} GFLOP/s "
              f"(gather roofline ~{375/ (plan.width*plan.m_pad/nnz) / (k*4) * fl / 1e9 / (nnz/1e9):.0f} GF)", flush=True)
