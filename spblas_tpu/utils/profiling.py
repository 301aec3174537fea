"""Roofline accounting + timing — the perf observability the reference
lacks entirely (SURVEY.md §6: no benchmark or counter of any kind).

Gives every op a traffic/flop model so measured runtimes convert to
roofline fractions (BASELINE.md: CSR f32/i32 SpMV ≈ 12 B matrix traffic
per nnz), plus a tiny timing helper that amortizes over a jitted chain so
microsecond kernels are measurable despite dispatch overhead.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

# chip HBM bandwidth (GB/s) by device_kind prefix
HBM_GBPS = (
    ("TPU v6 lite", 1640.0),
    ("TPU v6", 3584.0),
    ("TPU v5 lite", 819.0),
    ("TPU v5p", 2765.0),
    ("TPU v5", 2765.0),
    ("TPU v4", 1228.0),
    ("TPU v3", 900.0),
)
PEAK_F32_TFLOPS = (
    ("TPU v6 lite", 197.0 / 2),
    ("TPU v5 lite", 197.0 / 2),   # bf16 394/2? keep f32 MXU estimate
    ("TPU v5p", 459.0 / 2),
    ("TPU v4", 275.0 / 2),
)


def device_hbm_gbps(device=None) -> float:
    kind = (device or jax.devices()[0]).device_kind
    for prefix, bw in HBM_GBPS:
        if kind.startswith(prefix):
            return bw
    return 100.0  # CPU nominal


@dataclasses.dataclass(frozen=True)
class OpCost:
    """Minimal-traffic model of one op execution."""

    flops: int
    bytes: int
    label: str = ""

    def roofline_seconds(self, gbps: Optional[float] = None) -> float:
        gbps = gbps or device_hbm_gbps()
        return self.bytes / (gbps * 1e9)

    def fraction(self, measured_seconds: float,
                 gbps: Optional[float] = None) -> float:
        return self.roofline_seconds(gbps) / max(measured_seconds, 1e-12)


def spmv_cost(nnz: int, m: int, n: int, val_bytes=4, idx_bytes=4) -> OpCost:
    """CSR SpMV traffic: values + colind (+ amortized rowptr) + x + y."""
    return OpCost(flops=2 * nnz,
                  bytes=nnz * (val_bytes + idx_bytes) + (m + 1) * idx_bytes
                  + (n + m) * val_bytes,
                  label="spmv")


def dia_spmv_cost(nnz: int, m: int, n: int, ndiag: int,
                  val_bytes=4) -> OpCost:
    """DIA SpMV: dense diagonals + x + y, zero index traffic."""
    return OpCost(flops=2 * nnz,
                  bytes=ndiag * m * val_bytes + (n + m) * val_bytes,
                  label="dia_spmv")


def spmm_cost(nnz: int, m: int, n: int, k: int, val_bytes=4,
              idx_bytes=4) -> OpCost:
    return OpCost(flops=2 * nnz * k,
                  bytes=nnz * (val_bytes + idx_bytes)
                  + (n + m) * k * val_bytes,
                  label="spmm")


def spgemm_cost(flops: int, nnz_a: int, nnz_b: int, nnz_c: int,
                val_bytes=4, idx_bytes=4) -> OpCost:
    b = (nnz_a + nnz_b + nnz_c) * (val_bytes + idx_bytes)
    return OpCost(flops=2 * flops, bytes=b, label="spgemm")


# ------------------------------------------------------------------ #
# inspection-phase breakdown (host pack vs device upload vs compile) —
# plan builders record phases here; benches read them so the recorded
# inspect latency is attributable (VERDICT r2 next-1: the 109 s
# sptrsv.inspect_s was unprofiled)
# ------------------------------------------------------------------ #

_inspect_phases: dict = {}


def record_phase(op: str, name: str, seconds: float) -> None:
    _inspect_phases.setdefault(op, {})[name] = round(seconds, 4)


def inspect_phases(op: str) -> dict:
    """Snapshot of the most recent inspection breakdown for ``op``."""
    return dict(_inspect_phases.get(op, {}))


def time_chained(step: Callable, x0, iters: int = 50, reps: int = 3
                 ) -> float:
    """Best wall time per `step` application over a jitted fori chain.

    Follows the platform timing protocol (PERF_NOTES.md / CLAUDE.md):
    DISTINCT inputs per repetition (identical-argument repeats are
    memoized and time the dispatch floor) and a scalar readback inside
    the timed region (block_until_ready alone has been observed to
    return before execution completes)."""

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, iters, lambda _, v: step(v), x)

    jax.block_until_ready(chain(x0))

    def _perturb(x, r):
        if hasattr(x, "dtype"):
            return x + jnp.asarray(1e-3 * r, x.dtype)
        return jax.tree_util.tree_map(
            lambda v: v + jnp.asarray(1e-3 * r, v.dtype), x)

    best = float("inf")
    for r in range(reps):
        xr = _perturb(x0, r + 1)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(xr)
        jax.block_until_ready(out)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.real(first.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def time_fn(fn: Callable, *args, reps: int = 5) -> float:
    """Best wall time of one call (for ops too stateful to chain)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
