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

def v_einsum(plan, b):
    bg = b[plan.cols]
    return jnp.einsum("mw,mwk->mk", plan.values, bg,
                      precision=jax.lax.Precision.HIGHEST)

def v_mulsum(plan, b):
    bg = b[plan.cols]                          # (m,W,k)
    return (plan.values[:, :, None] * bg).sum(axis=1)

def v_flat(plan, b):
    k = b.shape[1]
    bg = b[plan.cols.reshape(-1)]              # (m*W, k)
    vz = plan.values.reshape(-1, 1)
    return (vz * bg).reshape(plan.m_pad, -1, k).sum(axis=1)

def v_bf16(plan, b):
    bg = b.astype(jnp.bfloat16)[plan.cols]
    return (plan.values[:, :, None] * bg.astype(jnp.float32)).sum(axis=1)

def v_loop(plan, b):
    # W separate row-gathers, accumulate: avoids the (m,W,k) intermediate
    acc = jnp.zeros((plan.m_pad, b.shape[1]), jnp.float32)
    for w in range(plan.width):
        acc = acc + plan.values[:, w, None] * b[plan.cols[:, w]]
    return acc

for k in (256,):
    B0 = jax.device_put(np.random.default_rng(1).standard_normal((m, k)).astype(np.float32))
    for name, fn in (("einsum", v_einsum), ("mulsum", v_mulsum),
                     ("flat", v_flat), ("bf16gather", v_bf16),
                     ("wloop", v_loop)):
        @jax.jit
        def chain(plan, B, fn=fn, iters=20):
            def body(_, Bc):
                C = fn(plan, Bc)[:m]
                return C * 1e-3 + B * 0.5
            return jax.lax.fori_loop(0, iters, body, B)
        try:
            jax.block_until_ready(chain(plan, B0))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)
            continue
        best = float("inf")
        for r in range(2):
            Br = B0 + jnp.float32(1e-3 * (r + 1))
            jax.block_until_ready(Br)
            t0 = time.perf_counter()
            out = chain(plan, Br)
            jax.block_until_ready(out); float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        per = best / 20
        print(f"{name} k={k}: {per*1e3:.2f} ms  {2*nnz*k/per/1e9:.1f} GFLOP/s", flush=True)
