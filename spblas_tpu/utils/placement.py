"""Batched device placement for inspection-phase plan arrays.

Plan builders used to place each array with its own ``jnp.asarray``;
through a tunneled runtime every separate placement pays a dispatch
round-trip, and round-2 benchmarks recorded pathological inspect
latencies when those round-trips landed on a congested link
(BENCH_r02: sptrsv.inspect_s = 109 s for a 1.2 s host build).  One
``jax.device_put`` over the assembled tuple issues all transfers in a
single dispatch (the inspection phase is meant to be amortizable — the
vendors' contract, e.g. rocSPARSE spgemm reuse,
include/spblas/vendor/rocsparse/multiply_spgemm.hpp:72-118).

A live-slots-only "compact" upload (ship (pos, tile, val) triples for
nonzero slots, expand with one device scatter) was A/B'd and LOST even
at fill 0.08: 22.7-25.9 s vs 19.6 s plain for a 1.97 GB stream
(benchmarks/dev/tpu_compact_upload_ab.py, round 3) — the batched
upload sustains ~100 MB/s while the scatter-expand plus host
flatnonzero cost more than the 4x byte saving returns.
"""

from __future__ import annotations

import jax


def device_put_batch(*arrays):
    """Place all ``arrays`` (numpy, host) on the default device with ONE
    ``jax.device_put`` call; returns device arrays in argument order.
    Dtypes are preserved exactly — callers cast host-side first."""
    return jax.device_put(tuple(arrays))
