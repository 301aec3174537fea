"""Supercell (row_window_mult) A/B on the VERDICT r3 target shapes.

Measures ROUTE2 SpMV at m=300k/1M deg 10 for W in {1,2,4,8} home-lane
plus the round-3 any-lane baseline; 300-iter chains, distinct inputs
per repetition, scalar readback (PERF_NOTES methodology).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dev/supercell_ab.py [m]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from spblas_tpu.kernels.route2 import build_route2_plan
from spblas_tpu.kernels.route2_kernel import route2_spmv
from spblas_tpu.utils.generate import generate_csr

ITERS = 300


def measure(plan, m):
    @jax.jit
    def chain(plan, x):
        def body(_, v):
            y = route2_spmv(plan, v)
            return y * jax.lax.rsqrt(jnp.sum(y * y) / m + 1e-9)
        return jax.lax.fori_loop(0, ITERS, body, x)

    x0 = jnp.ones((m,), jnp.float32)
    jax.block_until_ready(chain(plan, x0))
    best = float("inf")
    for r in range(3):
        xr = x0 * (1 + 1e-4 * r)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(plan, xr)
        jax.block_until_ready(out)
        float(out[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    deg = 10
    a = generate_csr(m, m, m * deg, seed=0)
    nnz = int(a.nnz)
    rp, ci, vv = (np.asarray(a.rowptr), np.asarray(a.colind),
                  np.asarray(a.values))
    configs = [("anylane", dict(any_lane=True, row_window_mult=1)),
               ("home-w1", dict(any_lane=False, row_window_mult=1)),
               ("home-w2", dict(any_lane=False, row_window_mult=2)),
               ("home-w4", dict(any_lane=False, row_window_mult=4)),
               ("home-w8", dict(any_lane=False, row_window_mult=8))]
    for name, kw in configs:
        t0 = time.perf_counter()
        plan = build_route2_plan(rp, ci, vv, a.shape, nnz, **kw)
        t_build = time.perf_counter() - t0
        # correctness spot check vs dense segment sums on host
        x = np.random.default_rng(1).standard_normal(m).astype(np.float32)
        y = np.asarray(route2_spmv(plan, jnp.asarray(x)))
        want = np.zeros(m, np.float64)
        np.add.at(want, np.repeat(np.arange(m), np.diff(rp[:m + 1])),
                  vv[:nnz].astype(np.float64) * x[ci[:nnz]])
        err = np.abs(y - want).max() / (np.abs(want).max() + 1)
        sec = measure(plan, m)
        print(f"{name}: {nnz/sec/1e9:.2f} Gnnz/s  fill {plan.fill:.3f} "
              f"chunks {plan.nchunks} aux {plan.n_aux_chunks} "
              f"g {plan.g} ns/chunk {sec/plan.nchunks*1e9:.0f} "
              f"build {t_build:.1f}s relerr {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
