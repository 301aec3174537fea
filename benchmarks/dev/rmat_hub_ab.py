"""RMAT hub-split A/B (VERDICT r3 #4) at the benchmark shape
(m=131k deg16): v1 (the r3 chooser pick) vs supercell v2 vs
supercell v2 + hub chunks at several thresholds.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dev/rmat_hub_ab.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from spblas_tpu.kernels.route2 import build_route2_plan
from spblas_tpu.kernels.route2_kernel import route2_spmv
from spblas_tpu.utils.generate import generate_rmat_csr

ITERS = 300


def measure(step, plan, m, nnz):
    @jax.jit
    def chain(plan, x):
        def body(_, v):
            y = step(plan, v)
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
    return nnz / (best / ITERS)


def main():
    m = 131_072
    a = generate_rmat_csr(m, m * 16, seed=5)
    nnz = int(a.nnz)
    rp, ci, vv = (np.asarray(a.rowptr), np.asarray(a.colind),
                  np.asarray(a.values))
    deg = np.diff(np.minimum(rp[:m + 1], nnz))
    for t in (64, 256, 512, 1024, 2048, 4096):
        mass = int(deg[deg >= t].sum())
        print(f"deg>={t}: rows {int((deg >= t).sum())} "
              f"mass {mass/nnz:.3f}")

    # v1 baseline through the chooser (route_plan kernel)
    from spblas_tpu.kernels import plans as _plans
    kind, vplan = _plans.build_matvec_plan(a)
    sec_kind = measure(lambda p, x: _plans.plan_spmv((kind, p), x),
                       vplan, m, nnz)
    print(f"chooser[{kind}]: {sec_kind/1e9:.2f} Gnnz/s "
          f"fill {getattr(vplan, 'fill', None)}", flush=True)

    for name, kw in [("v2-super", dict(hub_deg=0)),
                     ("v2-super+hub4096", dict(hub_deg=4096)),
                     ("v2-super+hub2048", dict(hub_deg=2048)),
                     ("v2-super+hub1024", dict(hub_deg=1024)),
                     ("v2-super+hub512", dict(hub_deg=512))]:
        plan = build_route2_plan(rp, ci, vv, a.shape, nnz, **kw)
        x = np.random.default_rng(1).standard_normal(m).astype(
            np.float32)
        y = np.asarray(route2_spmv(plan, jnp.asarray(x)))
        want = np.zeros(m, np.float64)
        np.add.at(want, np.repeat(np.arange(m), deg),
                  vv[:nnz].astype(np.float64) * x[ci[:nnz]])
        err = np.abs(y - want).max() / (np.abs(want).max() + 1)
        rate = measure(lambda p, x2: route2_spmv(p, x2), plan, m, nnz)
        print(f"{name}: {rate/1e9:.2f} Gnnz/s fill {plan.fill:.3f} "
              f"chunks {plan.nchunks} ww {plan.row_window_mult} "
              f"hub {plan.has_hub} relerr {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
