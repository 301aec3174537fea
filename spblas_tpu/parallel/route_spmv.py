"""Distributed UNSTRUCTURED SpMV: per-shard ROUTE2 plans under shard_map.

The generic distributed SpMV (parallel/spmv.py) runs gather+segment-sum
local blocks — the XLA element-gather wall on TPU (PERF_NOTES.md).
This module gives row-partitioned general sparsity the single-chip
ROUTE2 treatment: each device's row block gets its own gather-free
chunk plan, stacked into one SPMD program.

SPMD uniformity: every device must run the same static-shape program,
so the per-device plans are built with a COMMON window factor g and
padded to the maximum chunk count / aux-region size across devices
(padding chunks have vA=0 everywhere — they compute and publish
nothing).  x is gathered with one `all_gather` (the allgather strategy;
the x pane must be VMEM-resident anyway, so a ring adds nothing here).

No reference counterpart (SURVEY.md §2.6); extends the north-star
distributed SpMV to the unstructured case.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spblas_tpu.formats.convert import to_csr
from spblas_tpu.kernels.route_plan import LANES, SUBS
from spblas_tpu.parallel.mesh import ROW_AXIS
from spblas_tpu.types import on_tpu as _on_tpu


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistRoutePlan:
    """Stacked per-device ROUTE2 plans (leading axis = device)."""

    tile: jax.Array        # (p, nch, 8, 128) int32
    val: jax.Array         # (p, nch, 8, 128) f32
    slab_base: jax.Array   # (p, nch) int32
    y_base: jax.Array      # (p, nch) int32
    src_flag: jax.Array    # (p, nch) int32
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))
    nloc: int = dataclasses.field(metadata=dict(static=True))
    g: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    out_rows: int = dataclasses.field(metadata=dict(static=True))
    has_aux: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def p(self) -> int:
        return int(self.tile.shape[0])


def partition_route(a, mesh: Mesh) -> DistRoutePlan:
    """Host inspect step: one ROUTE2 plan per row block, padded to a
    uniform SPMD geometry and placed sharded over the mesh."""
    from spblas_tpu.kernels.route2 import build_route2_plan

    a = to_csr(a)
    p = mesh.devices.size
    m, n = a.shape
    mloc = -(-m // p)
    nloc = -(-n // p)
    nnz = int(a.nnz)
    rowptr = np.minimum(np.asarray(a.rowptr).astype(np.int64), nnz)
    colind = np.asarray(a.colind)[:nnz]
    values = np.asarray(a.values)[:nnz]

    # common g from the global density heuristic (the per-device
    # heuristic could disagree across skewed blocks)
    want = max(1, (2 * mloc * n) // (max(nnz // p, 1) * 1024) + 1)
    g = 1
    while g < want and g < 16:
        g *= 2

    plans = []
    for d in range(p):
        r0, r1 = d * mloc, min((d + 1) * mloc, m)
        lo, hi = int(rowptr[min(r0, m)]), int(rowptr[min(r1, m)])
        sub_rp = np.zeros(mloc + 1, np.int64)
        if r1 > r0:
            sub_rp[: r1 - r0 + 1] = rowptr[r0: r1 + 1] - lo
        sub_rp[r1 - r0 + 1:] = hi - lo
        plans.append(build_route2_plan(
            sub_rp, colind[lo:hi], values[lo:hi], (mloc, n), hi - lo,
            g=g))

    nch = max(pl.nchunks for pl in plans)
    # pad to whole CB groups so per-device tails stay flag-homogeneous
    nch = -(-nch // 8) * 8
    x_rows = max(pl.x_rows for pl in plans)
    out_rows = max(max(pl.pane_rows, SUBS * g) for pl in plans)
    has_aux = any(pl.n_aux_chunks > 0 for pl in plans)

    def stack(getter, pad_val=0, edge=False):
        outs = []
        for pl in plans:
            arr = np.asarray(getter(pl))
            padn = nch - arr.shape[0]
            if edge and arr.shape[0]:
                pad_block = np.repeat(arr[-1:], padn, axis=0)
            else:
                pad_block = np.full((padn,) + arr.shape[1:], pad_val,
                                    arr.dtype)
            outs.append(np.concatenate([arr, pad_block], axis=0))
        return np.stack(outs)

    sharding = NamedSharding(mesh, P(ROW_AXIS))
    return DistRoutePlan(
        tile=jax.device_put(stack(lambda q: q.tile), sharding),
        val=jax.device_put(stack(lambda q: q.val), sharding),
        slab_base=jax.device_put(stack(lambda q: q.slab_base), sharding),
        y_base=jax.device_put(stack(lambda q: q.y_base), sharding),
        src_flag=jax.device_put(stack(lambda q: q.src_flag, edge=True),
                                sharding),
        shape=(m, n), mloc=mloc, nloc=nloc, g=g,
        x_rows=x_rows, out_rows=out_rows, has_aux=has_aux)


def dist_route_spmv(plan: DistRoutePlan, x: jax.Array, mesh: Mesh
                    ) -> jax.Array:
    """y = A @ x with x block-sharded (p*nloc,) like dist_spmv; returns
    the padded (p*mloc,) result sharded over rows."""
    from spblas_tpu.kernels.route2_kernel import route2_dispatch

    p, mloc, nloc = plan.p, plan.mloc, plan.nloc
    n = plan.shape[1]
    if x.shape[0] != p * nloc:
        raise ValueError(
            f"operand length {x.shape[0]} != padded n {p * nloc}; "
            "use partition_vector")
    interpret = not _on_tpu()

    def body(t, v, sb, yb, fl, xloc):
        xg = jax.lax.all_gather(xloc, ROW_AXIS).reshape(-1)[:n]
        x2 = jnp.pad(xg.astype(jnp.float32),
                     (0, plan.x_rows * LANES - n)
                     ).reshape(plan.x_rows, LANES)
        y2 = route2_dispatch(t[0], v[0], sb[0], yb[0], fl[0], x2,
                             g=plan.g, x_rows=plan.x_rows,
                             out_rows=plan.out_rows,
                             has_aux=plan.has_aux,
                             interpret=interpret)
        return jax.lax.slice(y2.reshape(-1), (0,),
                             (mloc,)).astype(x.dtype)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # metadata (same as parallel/banded.py)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(ROW_AXIS),) * 6,
        out_specs=P(ROW_AXIS), check_vma=False)
    return fn(plan.tile, plan.val, plan.slab_base, plan.y_base,
              plan.src_flag, x)
