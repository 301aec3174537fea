import time, numpy as np
import jax, jax.numpy as jnp
from spblas_tpu.utils.generate import generate_csr
from spblas_tpu.kernels.ell import build_ell_plan

m = 100_000
a = generate_csr(m, m, m*10, seed=0)
plan = build_ell_plan(a)
nnz = int(a.nnz)
W = plan.width
print(f"W={W}", flush=True)

def make_wblock(wb):
    def f(plan, b):
        k = b.shape[1]
        acc = jnp.zeros((plan.m_pad, k), jnp.float32)
        for w0 in range(0, plan.width, wb):
            w1 = min(w0 + wb, plan.width)
            idx = plan.cols[:, w0:w1].reshape(-1)
            g = b[idx].reshape(plan.m_pad, w1 - w0, k)
            acc = acc + jnp.einsum("mw,mwk->mk", plan.values[:, w0:w1],
                                   g)
        return acc
    return f

k = 256
B0 = jax.device_put(np.random.default_rng(1).standard_normal((m, k)).astype(np.float32))
for wb in (2, 4, 8):
    fn = make_wblock(wb)
    @jax.jit
    def chain(plan, B, fn=fn, iters=20):
        def body(_, Bc):
            C = fn(plan, Bc)[:m]
            return C * 1e-3 + B * 0.5
        return jax.lax.fori_loop(0, iters, body, B)
    jax.block_until_ready(chain(plan, B0))
    best = float("inf")
    for r in range(2):
        Br = B0 + jnp.float32(1e-3 * (r + 1))
        jax.block_until_ready(Br)
        t0 = time.perf_counter()
        out = chain(plan, Br); jax.block_until_ready(out); float(out[0,0])
        best = min(best, time.perf_counter() - t0)
    per = best / 20
    print(f"wblock={wb}: {per*1e3:.2f} ms  {2*nnz*k/per/1e9:.1f} GFLOP/s", flush=True)
