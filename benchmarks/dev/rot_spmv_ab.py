"""On-chip A/B: supercell ROUTE2 with per-chunk d=2 publish rotations
vs the shipped W=8 plans (round 5, VERDICT r4 #5).

Host chunks at these shapes: m=1M 26113 -> 18745 (-28%), m=300k
4755 -> 3965 (-17%); the kernel pays the un-rotation (~7-14 ns,
rot_publish_ab.py).  This records the net on-chip rates.

Run: python benchmarks/dev/rot_spmv_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from spblas_tpu.kernels.route2 import build_route2_plan
from spblas_tpu.kernels.route2_kernel import route2_spmv
from spblas_tpu.utils.generate import generate_csr_arrays

ITERS = int(os.environ.get("AB_ITERS", 300))


def bench(plan, m, nnz, tag):
    def step(plan, x):
        y = route2_spmv(plan, x)
        return y * jax.lax.rsqrt(jnp.sum(y * y) / m + 1e-9)

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
    print(f"{tag}: {nnz/per/1e9:.2f} Gnnz/s ({per*1e6:.0f} us/iter, "
          f"{per/plan.nchunks*1e9:.1f} ns/chunk)", flush=True)


for m, deg in ((300_000, 10), (1_000_000, 10)):
    nnz = m * deg
    vals, rowptr, colind = generate_csr_arrays(m, m, nnz, seed=3)
    rp = rowptr.astype(np.int64)
    ci = colind.astype(np.int64)
    for rot in (False, True):
        t0 = time.perf_counter()
        plan = build_route2_plan(rp, ci, vals, (m, m), nnz,
                                 row_window_mult=None, rotate=rot)
        print(f"m={m} rotate={rot}: chunks {plan.nchunks} "
              f"fill {plan.fill:.3f} W {plan.row_window_mult} "
              f"build {time.perf_counter()-t0:.1f}s", flush=True)
        bench(plan, m, nnz, f"m={m} rot={rot}")
