"""Benchmark harness — the perf baseline the reference never published.

The reference ships no numbers (BASELINE.md); targets come from
BASELINE.json's roofline model: CSR f32/i32 SpMV moves ~12 B of matrix
traffic per nonzero, so roofline nnz/s = HBM_BW / 12.  The headline metric
mirrors configs[0] (banded 10k x 10k SpMV, examples/simple_spmv.cpp shape
template): optimized-plan SpMV throughput as a fraction of that CSR
roofline — the DIA plan moves ~4 B/nnz, so beating 1.0 is expected.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# chip HBM bandwidth (GB/s) by device_kind prefix; CPU fallback nominal
_HBM_GBPS = [
    ("TPU v6 lite", 1640.0),
    ("TPU v6", 3584.0),
    ("TPU v5 lite", 819.0),
    ("TPU v5p", 2765.0),
    ("TPU v5", 2765.0),
    ("TPU v4", 1228.0),
    ("TPU v3", 900.0),
]
_CPU_GBPS = 100.0


def hbm_bandwidth_gbps() -> float:
    kind = jax.devices()[0].device_kind
    for prefix, bw in _HBM_GBPS:
        if kind.startswith(prefix):
            return bw
    return _CPU_GBPS


def banded_csr(m: int, half_bw: int, dtype=np.float32):
    """10k-class banded matrix (configs[0] shape template)."""
    from spblas_tpu import CSR
    offs = np.arange(-half_bw, half_bw + 1)
    rows_l, cols_l, vals_l = [], [], []
    rng = np.random.default_rng(0)
    for o in offs:
        i0, i1 = max(0, -o), min(m, m - o)
        i = np.arange(i0, i1)
        rows_l.append(i)
        cols_l.append(i + o)
        vals_l.append(rng.uniform(0.1, 1.0, i1 - i0).astype(dtype))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    rowptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(rowptr[1:], rows, 1)
    rowptr = np.cumsum(rowptr)
    return CSR.from_arrays(vals, rowptr, cols, (m, m), nnz=len(vals))


def _time_chained(step, x0, iters: int) -> float:
    """Wall time per application of `step`, amortized over a jitted chain
    (defeats both dispatch overhead and cross-iteration CSE)."""

    @jax.jit
    def chain(x):
        def body(_, v):
            return step(v)
        return jax.lax.fori_loop(0, iters, body, x)

    y = chain(x0)
    jax.block_until_ready(y)          # compile + warm
    reps, best = 3, float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x0))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_spmv_banded(m=10_000, half_bw=50):
    from spblas_tpu import matrix_opt, spmv
    a = banded_csr(m, half_bw)
    nnz = int(a.nnz)
    a_opt = matrix_opt(a)
    x0 = jnp.ones((m,), dtype=jnp.float32) / m

    def step(x):
        y = spmv(a_opt, x)
        # keep magnitudes bounded so a 100-deep chain can't overflow
        return y / jnp.float32(half_bw * 2 + 1)

    sec = _time_chained(step, x0, iters=100)
    return nnz / sec, nnz


def bench_spmv_csr_general(m=20_000, nnz=2_000_000):
    """General (unstructured) CSR path: gather + segment-sum."""
    from spblas_tpu.utils.generate import generate_csr
    from spblas_tpu import spmv
    a = generate_csr(m, m, nnz, seed=0)
    x0 = jnp.ones((m,), dtype=jnp.float32)

    def step(x):
        y = spmv(a, x)
        return y / jnp.float32(nnz / m)

    sec = _time_chained(step, x0, iters=20)
    return int(a.nnz) / sec


def main():
    bw = hbm_bandwidth_gbps()
    roofline_nnz_s = bw * 1e9 / 12.0   # CSR f32/i32 model (BASELINE.md)

    nnz_s, nnz = bench_spmv_banded()
    details = {
        "device": jax.devices()[0].device_kind,
        "hbm_gbps": bw,
        "csr_roofline_nnz_s": roofline_nnz_s,
        "banded_nnz": nnz,
    }
    try:
        details["spmv_csr_general_nnz_s"] = bench_spmv_csr_general()
        details["csr_general_vs_roofline"] = (
            details["spmv_csr_general_nnz_s"] / roofline_nnz_s)
    except Exception as e:  # keep the headline line even if extras fail
        details["spmv_csr_general_error"] = repr(e)

    print(json.dumps({
        "metric": "spmv_banded_10k_nnz_s",
        "value": nnz_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_s / roofline_nnz_s,
        "details": details,
    }))


if __name__ == "__main__":
    main()
