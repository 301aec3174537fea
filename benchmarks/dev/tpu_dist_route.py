# On one real chip this exercises the dist route program single-device
# (p=1 mesh) — the multi-chip shardings are covered by dryrun_multichip.
import time, numpy as np
import jax, jax.numpy as jnp
from spblas_tpu.parallel import make_row_mesh, partition_route, dist_route_spmv
from spblas_tpu.utils.generate import generate_csr

mesh = make_row_mesh(1, devices=jax.devices()[:1])
m = 300_000
a = generate_csr(m, m, m*10, seed=0)
plan = partition_route(a, mesh)
x = jnp.ones((plan.p * plan.nloc,), jnp.float32)

@jax.jit
def chain(plan, x):
    def body(_, v):
        y = dist_route_spmv(plan, v, mesh)
        return y * 1e-3 + x * 0.5
    return jax.lax.fori_loop(0, 50, body, x)

jax.block_until_ready(chain(plan, x))
best = float("inf")
for r in range(3):
    xr = x + jnp.float32(1e-3 * (r + 1))
    jax.block_until_ready(xr)
    t0 = time.perf_counter()
    out = chain(plan, xr); jax.block_until_ready(out); float(out[0])
    best = min(best, time.perf_counter() - t0)
print(f"dist route p=1 m=300k: {best/50*1e6:.0f} us/spmv  {int(a.nnz)/(best/50)/1e9:.2f} Gnnz/s")
