import time, numpy as np
import jax, jax.numpy as jnp
from spblas_tpu.utils.generate import generate_csr
from spblas_tpu.kernels.route2 import build_route2_plan, _pack_stream
from spblas_tpu.kernels.route2_kernel import route2_spmv
import spblas_tpu.kernels.route2 as r2

m, deg = 100_000, 24
a = generate_csr(m, m, m * deg, seed=0)
rp, ci, vv = np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values)
nl = int(a.nnz)

def run(tag, plan):
    x0 = jax.device_put(np.random.default_rng(1).standard_normal(m).astype(np.float32))
    iters = 300
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
        out = chain(plan, xr); jax.block_until_ready(out); float(out[0])
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"{tag}: fill={plan.fill:.3f} nchunks={plan.nchunks} aux={plan.n_aux_chunks} "
          f"{per*1e6:.0f} us  {nl/per/1e9:.2f} Gnnz/s", flush=True)

plan_on = build_route2_plan(rp, ci, vv, (m, m), nl)
run("spill-on ", plan_on)

# counterfactual: gate forced off
orig = _pack_stream
def no_spill(*args, **kw):
    kw["spill"] = False
    return orig(*args, **kw)
r2._pack_stream = no_spill
plan_off = build_route2_plan(rp, ci, vv, (m, m), nl)
r2._pack_stream = orig
run("spill-off", plan_off)
