import time, sys, numpy as np
import jax, jax.numpy as jnp
from spblas_tpu.utils.generate import generate_csr
from spblas_tpu.ops.spmm import _spmm_base

m, deg = 100_000, 10
nnz = m * deg
a = generate_csr(m, m, nnz, seed=0)

for k in (64, 256):
    B0 = jax.device_put(np.random.default_rng(1).standard_normal((m, k)).astype(np.float32))

    @jax.jit
    def chain(a, B, iters=20):
        def body(_, Bc):
            C = _spmm_base(a, Bc, False)
            return C * 1e-3 + B * 0.5
        return jax.lax.fori_loop(0, iters, body, B)

    jax.block_until_ready(chain(a, B0))
    best = float("inf")
    for r in range(3):
        Br = B0 + jnp.float32(1e-3 * (r + 1))
        jax.block_until_ready(Br)
        t0 = time.perf_counter()
        out = chain(a, Br)
        jax.block_until_ready(out)
        float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    per = best / 20
    fl = 2 * nnz * k
    print(f"XLA spmm k={k}: {per*1e3:.2f} ms  {fl/per/1e9:.1f} GFLOP/s  {nnz/per/1e6:.0f} Mnnz/s", flush=True)

# raw row-gather rate
idx = jax.device_put(np.random.default_rng(2).integers(0, m, nnz).astype(np.int32))
for k in (64, 256):
    B0 = jax.device_put(np.random.default_rng(1).standard_normal((m, k)).astype(np.float32))

    @jax.jit
    def gchain(idx, B, iters=20):
        def body(_, acc):
            g = B[idx]          # (nnz, k) row gather
            return acc + g[::65536].sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    jax.block_until_ready(gchain(idx, B0))
    t0 = time.perf_counter()
    out = gchain(idx, B0)
    jax.block_until_ready(out); float(out)
    per = (time.perf_counter() - t0) / 20
    gb = nnz * k * 4 / 1e9
    print(f"row-gather k={k}: {per*1e3:.2f} ms  {gb/per:.1f} GB/s", flush=True)
