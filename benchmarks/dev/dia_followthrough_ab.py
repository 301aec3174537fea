"""DIA follow-through A/Bs (VERDICT r3 #8).

1. bf16 diagonal storage on the stencil family: DIA is traffic-bound
   ((ndiag+2)*4 B/row at f32), so half-width diagonals should approach
   2x on wide stencils.
2. ndiag > 32 FEM-like offsets: what plan does the chooser actually
   pick past the DIA gate, and at what rate?

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dev/dia_followthrough_ab.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from spblas_tpu.formats.csr import CSR
from spblas_tpu.kernels import plans as _plans
from spblas_tpu.kernels.dia import build_dia_plan, dia_spmv
from spblas_tpu.utils.generate import generate_stencil_csr

ITERS = 300


def measure(step, plan, m, nnz):
    @jax.jit
    def chain(plan, x):
        def body(_, v):
            y = step(plan, v).astype(jnp.float32)
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


def wide_offset_csr(m=1_000_000, ndiag=48, spread=20_000, seed=0):
    """FEM-ish: many full diagonals at wide scattered offsets."""
    rng = np.random.default_rng(seed)
    offs = np.unique(np.concatenate(
        [[0], rng.integers(-spread, spread, ndiag * 2)]))[:ndiag]
    rows_l, cols_l = [], []
    for q in offs:
        r0, r1 = max(0, -q), min(m, m - q)
        rr = np.arange(r0, r1)
        rows_l.append(rr)
        cols_l.append(rr + q)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    rowptr = np.zeros(m + 1, np.int64)
    np.add.at(rowptr[1:], rows, 1)
    return CSR.from_arrays(vals, np.cumsum(rowptr), cols, (m, m),
                           nnz=len(rows)), len(offs)


def main():
    for dims in ((1000, 1000), (64, 64, 64)):
        a = generate_stencil_csr(dims)
        m = a.shape[0]
        nnz = int(a.nnz)
        plan = build_dia_plan(a)
        r32 = measure(dia_spmv, plan, m, nnz)
        plan16 = dataclasses.replace(
            plan, diags=plan.diags.astype(jnp.bfloat16))
        x = np.random.default_rng(0).standard_normal(m).astype(
            np.float32)
        y32 = np.asarray(dia_spmv(plan, jnp.asarray(x)))
        y16 = np.asarray(dia_spmv(plan16, jnp.asarray(x)))
        relerr = float(np.abs(y16 - y32).max()
                       / (np.abs(y32).max() + 1e-9))
        r16 = measure(dia_spmv, plan16, m, nnz)
        print(f"stencil{dims}: f32 {r32/1e9:.1f} Gnnz/s | bf16 diags "
              f"{r16/1e9:.1f} Gnnz/s ({r16/r32:.2f}x) relerr {relerr:.1e}",
              flush=True)

    a, nd = wide_offset_csr()
    m, nnz = a.shape[0], int(a.nnz)
    kind, plan = _plans.build_matvec_plan(a)
    rate = measure(lambda p, x: _plans.plan_spmv((kind, p), x), plan,
                   m, nnz)
    print(f"wide-offset ndiag={nd} m={m}: chooser -> {kind} at "
          f"{rate/1e9:.2f} Gnnz/s (fill "
          f"{getattr(plan, 'fill', None)})", flush=True)


if __name__ == "__main__":
    main()
