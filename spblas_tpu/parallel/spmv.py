"""Distributed SpMV / SpMM over a row-partitioned mesh.

New first-class layer with no reference counterpart (SURVEY.md §2.6):
the reference delegates all device work to single-queue vendor libraries.
Specified by BASELINE.json's north-star: row-partitioned distributed
SpMV with halo collectives overlapped with local compute.

Two execution strategies, both inside ``shard_map``:

* ``ring``  — systolic pipeline: x stays block-sharded; at step s every
  device multiplies its (rotation-scheduled) local block s against the x
  chunk it currently holds, while ``ppermute`` rotates chunks one hop
  around the ICI ring.  Memory per device is O(n/p); XLA overlaps the
  permute with the block compute (the collective and the segment-sum are
  data-independent within a step).
* ``allgather`` — gather x fully, then one local SpMV over the
  concatenated blocks; simplest, best for small n.

The step kernel is gather·mul·segment-sum over the COO blocks — the same
canonical-padding trick as single-device SpMV (padded entries carry row id
``mloc`` and value 0, so no masks anywhere in the numeric path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spblas_tpu.parallel.dist_csr import DistCSR
from spblas_tpu.parallel.mesh import ROW_AXIS, ring_perm


def _block_contrib(values, rowloc, colloc, chunk, mloc):
    """One block's y-contribution: (bcap,) gather·mul → segment-sum.

    For SpMM ``chunk`` is (nloc, k) and the result is (mloc, k).
    """
    contrib = values[..., None] * chunk[colloc] if chunk.ndim == 2 \
        else values * chunk[colloc]
    return jax.ops.segment_sum(contrib, rowloc, num_segments=mloc)


def _ring_kernel(values, rowloc, colloc, x, *, p, mloc):
    """shard_map body: values/rowloc/colloc are (1, p, bcap) local slices,
    x is the local (nloc,) or (nloc, k) chunk."""
    values, rowloc, colloc = values[0], rowloc[0], colloc[0]
    out_shape = (mloc,) if x.ndim == 1 else (mloc, x.shape[1])
    acc = jnp.zeros(out_shape, dtype=jnp.result_type(values.dtype, x.dtype))
    chunk = x
    for s in range(p):
        # Block s on this device is pre-scheduled for the chunk that
        # arrives at step s (rotation layout) — static index, no
        # dynamic slicing on device id.
        nxt = jax.lax.ppermute(chunk, ROW_AXIS, ring_perm(p)) \
            if s + 1 < p else chunk
        acc = acc + _block_contrib(values[s], rowloc[s], colloc[s],
                                   chunk, mloc)
        chunk = nxt
    return acc


def _allgather_kernel(values, rowloc, colloc, x, *, p, mloc, nloc):
    values, rowloc, colloc = values[0], rowloc[0], colloc[0]
    d = jax.lax.axis_index(ROW_AXIS)
    xg = jax.lax.all_gather(x, ROW_AXIS)        # (p, nloc[, k])
    out_shape = (mloc,) if x.ndim == 1 else (mloc, x.shape[1])
    acc = jnp.zeros(out_shape, dtype=jnp.result_type(values.dtype, x.dtype))
    for s in range(p):
        # block s holds columns of device (d + s) % p
        chunk = jax.lax.dynamic_index_in_dim(
            xg, (d + s) % p, axis=0, keepdims=False)
        acc = acc + _block_contrib(values[s], rowloc[s], colloc[s],
                                   chunk, mloc)
    return acc


def dist_spmv(a: DistCSR, x: jax.Array, mesh, strategy: str = "ring"
              ) -> jax.Array:
    """y = A @ x, A row-partitioned, x/y block-sharded over the mesh.

    Returns y of padded length p*mloc sharded over ``rows``; use
    ``gather_result`` to strip padding.
    """
    return _dist_apply(a, x, mesh, strategy)


def dist_spmm(a: DistCSR, b: jax.Array, mesh, strategy: str = "ring"
              ) -> jax.Array:
    """C = A @ B for dense B (p*nloc, k) row-sharded; C is (p*mloc, k)."""
    return _dist_apply(a, b, mesh, strategy)


def _dist_apply(a: DistCSR, x, mesh, strategy):
    p, mloc, nloc = a.p, a.mloc, a.nloc
    if x.shape[0] != p * nloc:
        raise ValueError(
            f"operand leading dim {x.shape[0]} != padded n {p * nloc}; "
            "use partition_vector")
    vec_tail = (None,) * (x.ndim - 1)
    in_specs = (P(ROW_AXIS, None, None),) * 3 + (P(ROW_AXIS, *vec_tail),)
    out_spec = P(ROW_AXIS, *vec_tail)
    if strategy == "ring":
        kern = partial(_ring_kernel, p=p, mloc=mloc)
    elif strategy == "allgather":
        kern = partial(_allgather_kernel, p=p, mloc=mloc, nloc=nloc)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    fn = jax.shard_map(kern, mesh=mesh, in_specs=in_specs,
                       out_specs=out_spec)
    return fn(a.values, a.rowloc, a.colloc, x)
