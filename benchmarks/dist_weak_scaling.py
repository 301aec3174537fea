"""Weak-scaling harness for the distributed SpMV paths.

BASELINE.json's north star asks for >=70% weak-scaling efficiency from
1 host to N>=2 hosts.  Real multi-chip hardware isn't attached to this
environment, so this script IS the harness: it scales the problem with
the mesh (rows_per_device held constant), measures per-iteration time on
1..P devices, and reports efficiency = t(1) / t(P).  On a CPU mesh the
absolute numbers are meaningless but the machinery (partition, halo
ppermute pipeline, timing) is exactly what a pod run uses:

  jax.distributed init -> make_row_mesh() over all chips -> same code.

Usage (faked mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python benchmarks/dist_weak_scaling.py [band|route]

``band`` (default) scales the halo band pipeline; ``route`` scales the
unstructured per-shard ROUTE2 path through the round-4 chooser surface
(partition_spmv / dist_plan_spmv) — the same two entry points a pod
run uses.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spblas_tpu.parallel import (dist_band_spmv, make_row_mesh,
                                 partition_band, partition_band_vector)
from spblas_tpu.utils.generate import generate_banded_csr

ROWS_PER_DEVICE = 8192
BANDWIDTH = 65
ITERS = 20


def measure(p: int) -> float:
    mesh = make_row_mesh(p, devices=jax.devices()[:p])
    m = ROWS_PER_DEVICE * p
    a = generate_banded_csr(m, m, BANDWIDTH, seed=0)
    plan = partition_band(a, mesh)
    x = partition_band_vector(jnp.ones((m,), jnp.float32), plan, mesh)

    @jax.jit
    def chain(panels_plan, v):
        def body(_, u):
            return dist_band_spmv(panels_plan, u, mesh) / BANDWIDTH
        return jax.lax.fori_loop(0, ITERS, body, v)

    jax.block_until_ready(chain(plan, x))
    best = float("inf")
    for r in range(3):
        xr = x + jnp.float32(1e-3 * (r + 1))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(plan, xr)
        jax.block_until_ready(out)
        float(np.asarray(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


DEG = 10


def measure_route(p: int) -> float:
    """Unstructured weak scaling through the chooser surface
    (partition_spmv with the TPU-default per-shard ROUTE2 selection,
    forced via ``prefer`` on the CPU mesh)."""
    from spblas_tpu.parallel import (dist_plan_spmv, partition_spmv,
                                     partition_spmv_vector)
    from spblas_tpu.utils.generate import generate_csr

    mesh = make_row_mesh(p, devices=jax.devices()[:p])
    m = ROWS_PER_DEVICE * p
    a = generate_csr(m, m, DEG * m, seed=0)
    kind, plan = partition_spmv(a, mesh, prefer="route")
    x = partition_spmv_vector((kind, plan),
                              jnp.ones((m,), jnp.float32), mesh)

    @jax.jit
    def chain(plan, v):
        def body(_, u):
            y = dist_plan_spmv((kind, plan), u, mesh)
            return y / jnp.float32(DEG)
        return jax.lax.fori_loop(0, ITERS, body, v)

    jax.block_until_ready(chain(plan, x))
    best = float("inf")
    for r in range(3):
        xr = x + jnp.float32(1e-3 * (r + 1))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(plan, xr)
        jax.block_until_ready(out)
        float(np.asarray(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def measure_spgemm(p: int) -> float:
    """Distributed SpGEMM numeric weak scaling through the stacked
    per-shard mul engines (round 5): work per device held constant
    (C = A·A, rows scale with the mesh), numeric re-run timed."""
    import dataclasses
    import os
    from spblas_tpu.parallel import (dist_spgemm_compute,
                                     dist_spgemm_numeric,
                                     partition_rowblock)
    from spblas_tpu.utils.generate import generate_csr

    os.environ["SPBLAS_FORCE_ROUTE_SPGEMM"] = "1"   # CPU-mesh force
    mesh = make_row_mesh(p, devices=jax.devices()[:p])
    m = (ROWS_PER_DEVICE // 8) * p                  # keep host pack fast
    a = generate_csr(m, m, DEG * m, seed=0)
    ar = partition_rowblock(a, mesh)
    plan = dist_spgemm_compute(ar, ar, mesh)
    assert plan.engine is not None

    def run(values):
        c = dist_spgemm_numeric(
            plan, dataclasses.replace(ar, values=values), ar, mesh)
        return c.values

    jax.block_until_ready(run(ar.values))
    best = float("inf")
    for r in range(3):
        av = ar.values * (1 + 1e-3 * (r + 1))
        jax.block_until_ready(av)
        t0 = time.perf_counter()
        out = run(av)
        jax.block_until_ready(out)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import sys
    mode = sys.argv[1] if len(sys.argv) > 1 else "band"
    fn = {"route": measure_route,
          "spgemm": measure_spgemm}.get(mode, measure)
    pmax = jax.device_count()
    t1 = fn(1)
    print(f"[{mode}] p=1: {t1*1e3:.2f} ms/iter "
          f"(rows/device={ROWS_PER_DEVICE})")
    for p in (2, 4, pmax):
        if p <= 1 or p > pmax:
            continue
        tp = fn(p)
        eff = t1 / tp
        print(f"[{mode}] p={p}: {tp*1e3:.2f} ms/iter, weak-scaling "
              f"efficiency {eff:.2f}")


if __name__ == "__main__":
    main()
