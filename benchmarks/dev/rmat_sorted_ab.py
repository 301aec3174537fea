"""On-chip A/B: plain ROUTE v1 vs degree-sorted v1 + unperm pass on the
RMAT benchmark shape (round 5, VERDICT r4 #4 — the implemented attack).

Host fill already measured 0.331 -> 0.464 (chunks 5728 -> 4092); this
records the chained two-dispatch cost on the chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from spblas_tpu.kernels import plans as _plans
from spblas_tpu.utils.generate import generate_rmat_csr

M = int(os.environ.get("AB_M", 131072))
DEG = int(os.environ.get("AB_DEG", 16))
ITERS = int(os.environ.get("AB_ITERS", 300))

a = generate_rmat_csr(M, M * DEG, seed=5)
m = a.shape[0]
nnz = int(a.nnz)
rp = np.asarray(a.rowptr)
ci = np.asarray(a.colind)
vv = np.asarray(a.values)
print(f"rmat m={m} nnz={nnz}")

from spblas_tpu.kernels.route_plan import build_route_plan

t0 = time.perf_counter()
plain = build_route_plan(rp, ci, vv, (m, m), nnz)
print(f"plain v1: chunks {plain.nchunks} fill {plain.fill:.3f} "
      f"build {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
import unittest.mock as mock
with mock.patch.object(_plans, "_SORTED_DISPATCH_NS", -10**12):
    kind_s, sp = _plans._try_route_sorted(rp, ci, vv, m, m, nnz, plain)
assert kind_s == "route1_sorted"
print(f"sorted v1: chunks {sp.base.nchunks} fill {sp.base.fill:.3f} "
      f"unperm chunks {sp.unperm.nchunks} fill {sp.unperm.fill:.3f} "
      f"build {time.perf_counter()-t0:.1f}s", flush=True)


def bench(kind, plan, tag):
    def step(plan, x):
        y = _plans.plan_spmv((kind, plan), x)
        return y * jax.lax.rsqrt(jnp.sum(y * y) / m + 1e-9)

    from spblas_tpu.utils.profiling import time_chained
    sec = time_chained(lambda p, x: step(p, x), None, iters=ITERS) \
        if False else None
    # manual chain (profiling.time_chained signature differs)
    @jax.jit
    def chain(plan, x0):
        def body(_, x):
            return step(plan, x)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    x0 = jnp.ones((m,), jnp.float32)
    jax.block_until_ready(chain(plan, x0))
    best = 1e9
    for r in range(5):
        xr = x0 * (1 + 1e-3 * r)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(plan, xr)
        jax.block_until_ready(out)
        float(out[0])
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{tag}: {nnz/per/1e9:.2f} Gnnz/s ({per*1e6:.0f} us/iter)",
          flush=True)
    return per


p_plain = bench("route1", plain, "plain v1")
p_sorted = bench("route1_sorted", sp, "sorted v1+unperm")
extra = p_sorted - (sp.base.nchunks / plain.nchunks) * p_plain
print(f"implied extra-dispatch+glue cost: {extra*1e6:.0f} us "
      f"(chunk-scaled baseline)")
