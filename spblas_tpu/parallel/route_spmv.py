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
    dist_max: int = dataclasses.field(default=7,
                                      metadata=dict(static=True))
    # COMMON any-lane-publish flag across shards: the stacked SPMD
    # program compiles ONE kernel, so per-shard builders must agree
    # (round-3 regression: shard plans built with the auto gate could
    # pick any_lane=True while the dispatch defaulted False — wrong
    # values on starved shards).  Default False so old serialized
    # plans keep the legacy home-lane semantics.
    any_lane: bool = dataclasses.field(default=False,
                                       metadata=dict(static=True))
    # COMMON supercell height across shards (round 4) — same
    # flag-threading contract as any_lane
    row_window_mult: int = dataclasses.field(default=1,
                                             metadata=dict(static=True))

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
    from spblas_tpu.kernels.route2 import (ROW_WINDOW, SLOTS,
                                           pick_window_g)
    g = pick_window_g(mloc, n, max(nnz // p, 1))

    # COMMON publish geometry across shards — every shard must pack
    # with the SAME semantics as the one compiled kernel (the round-3
    # any_lane regression lesson, VERDICT r3 #1).  Supercells take
    # precedence (the single-chip round-4 rule: e_cell * W >= 8192,
    # W <= 8, home-lane); any-lane is the fallback gate when the
    # native packer is unavailable.
    from spblas_tpu.kernels.route2 import pick_row_window_mult
    window = g * SLOTS
    e_cell_min = min(
        (int(rowptr[min((d + 1) * mloc, m)] - rowptr[min(d * mloc, m)])
         * window / max(mloc * n, 1) * ROW_WINDOW)
        for d in range(p))
    ww = pick_row_window_mult(e_cell_min, max_rows=mloc)
    any_lane = False
    if ww == 1:
        votes = 0
        for d in range(p):
            r0, r1 = d * mloc, min((d + 1) * mloc, m)
            nnz_d = int(rowptr[min(r1, m)] - rowptr[min(r0, m)])
            if nnz_d * window / max(mloc * n, 1) * ROW_WINDOW < 768.0:
                votes += 1
        any_lane = votes * 2 > p

    from spblas_tpu.parallel.rowblock import local_rowptr
    plans = []
    for d in range(p):
        lo, hi, sub_rp = local_rowptr(rowptr, d, mloc, m)
        # hub_deg pinned off (DistRoutePlan carries no hub field)
        # rotate pinned off: DistRoutePlan carries no rho stream and
        # the stacked SPMD kernel compiles without the un-rotation
        # (same COMMON-flag contract as any_lane/row_window_mult)
        plans.append(build_route2_plan(
            sub_rp, colind[lo:hi], values[lo:hi], (mloc, n), hi - lo,
            g=g, any_lane=any_lane, row_window_mult=ww, hub_deg=0,
            rotate=False))

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
        x_rows=x_rows, out_rows=out_rows, has_aux=has_aux,
        dist_max=max(pl.dist_max for pl in plans),
        any_lane=any_lane, row_window_mult=ww)


def dist_route_spmv(plan: DistRoutePlan, x: jax.Array, mesh: Mesh
                    ) -> jax.Array:
    """y = A @ x with x block-sharded (p*nloc,) like dist_spmv; returns
    the padded (p*mloc,) result sharded over rows."""
    from spblas_tpu.kernels.route2_kernel import route2_dispatch

    p, mloc, nloc = plan.p, plan.mloc, plan.nloc
    from spblas_tpu.parallel.mesh import check_mesh_matches
    check_mesh_matches(p, mesh, "dist_route_spmv")
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
                             interpret=interpret,
                             dist_max=plan.dist_max,
                             any_lane=plan.any_lane,
                             row_window_mult=plan.row_window_mult)
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


# ------------------------------------------------------------------ #
# distributed unstructured SpMM: per-shard SELL plans
# ------------------------------------------------------------------ #

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistSellPlan:
    """Stacked per-device SELL plans with a UNIFORM bucket geometry
    (bucket widths = union over devices, per-bucket row counts padded
    to the device maximum; pad rows gather B row 0 with value 0)."""

    bucket_values: Tuple[jax.Array, ...]   # each (p, mb, Wb)
    bucket_cols: Tuple[jax.Array, ...]     # each (p, mb, Wb) int32
    pos: jax.Array                         # (p, mloc) int32 concat slot
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))
    nloc: int = dataclasses.field(metadata=dict(static=True))

    @property
    def p(self) -> int:
        return int(self.pos.shape[0])


def partition_sell(a, mesh: Mesh) -> DistSellPlan:
    """Host inspect step: one SELL bucketing per row block, padded to a
    uniform SPMD geometry."""
    from spblas_tpu.kernels.sell import build_sell_plan
    from spblas_tpu.formats.csr import CSR

    a = to_csr(a)
    p = mesh.devices.size
    m, n = a.shape
    mloc = -(-m // p)
    nloc = -(-n // p)
    nnz = int(a.nnz)
    rowptr = np.minimum(np.asarray(a.rowptr).astype(np.int64), nnz)
    colind = np.asarray(a.colind)[:nnz]
    values = np.asarray(a.values)[:nnz]

    from spblas_tpu.parallel.rowblock import local_rowptr
    plans = []
    for d in range(p):
        lo, hi, sub_rp = local_rowptr(rowptr, d, mloc, m)
        sub = CSR.from_arrays(values[lo:hi], sub_rp, colind[lo:hi],
                              (mloc, n), nnz=hi - lo)
        plans.append(build_sell_plan(sub))

    widths = sorted({b.width for q in plans for b in q.buckets})
    bucket_values, bucket_cols = [], []
    # per device: map its buckets by width, pad row counts to the max
    per_dev = [{b.width: b for b in q.buckets} for q in plans]
    mb_of = {w: max((int(d[w].values.shape[0]) for d in per_dev
                     if w in d), default=1) for w in widths}
    pos = np.zeros((p, mloc), np.int64)
    for w in widths:
        mb = mb_of[w]
        vs = np.zeros((p, mb, w), np.float32)
        cs = np.zeros((p, mb, w), np.int32)
        for d in range(p):
            b = per_dev[d].get(w)
            if b is None:
                continue
            nv = np.asarray(b.values)
            vs[d, : nv.shape[0]] = nv
            cs[d, : nv.shape[0]] = np.asarray(b.cols)
        bucket_values.append(vs)
        bucket_cols.append(cs)
    # per-device pos: bucket-concat offsets differ per device in the
    # single-device plan; recompute against the UNIFORM geometry
    total = sum(mb_of[w] for w in widths)
    for d in range(p):
        q = plans[d]
        qpos = np.asarray(q.pos).astype(np.int64)
        # map each device-local concat slot -> uniform concat slot
        remap = np.full(sum(int(b.values.shape[0])
                            for b in q.buckets) + 1, total, np.int64)
        off_local = 0
        off_uniform = 0
        for w in widths:
            b = per_dev[d].get(w)
            nb = int(b.values.shape[0]) if b is not None else 0
            remap[off_local: off_local + nb] = \
                off_uniform + np.arange(nb)
            off_local += nb
            off_uniform += mb_of[w]
        pos[d] = remap[np.minimum(qpos, len(remap) - 1)]

    sharding = NamedSharding(mesh, P(ROW_AXIS))
    put = lambda arr: jax.device_put(arr, sharding)
    return DistSellPlan(
        bucket_values=tuple(put(v) for v in bucket_values),
        bucket_cols=tuple(put(c) for c in bucket_cols),
        pos=put(pos.astype(np.int32)),
        shape=(m, n), mloc=mloc, nloc=nloc)


def dist_sell_spmm(plan: DistSellPlan, b: jax.Array, mesh: Mesh
                   ) -> jax.Array:
    """C = A @ B for dense B (p*nloc, k) row-sharded; C is (p*mloc, k)
    row-sharded.  Local compute is the accumulated-row-gather SELL form
    (kernels/sell.py) over the all-gathered B."""
    p, mloc, nloc = plan.p, plan.mloc, plan.nloc
    from spblas_tpu.parallel.mesh import check_mesh_matches
    check_mesh_matches(p, mesh, "dist_sell_spmm")
    n = plan.shape[1]
    if b.shape[0] != p * nloc:
        raise ValueError(
            f"operand leading dim {b.shape[0]} != padded n {p * nloc}")

    def body(pos, bloc, *buckets):
        k = bloc.shape[-1]
        nb = len(buckets) // 2
        vals = buckets[:nb]
        cols = buckets[nb:]
        bg = jax.lax.all_gather(bloc, ROW_AXIS).reshape(-1, k)[:n]
        from spblas_tpu.kernels.sell import bucket_matmul
        parts = [bucket_matmul(vv[0], cc[0], bg).astype(jnp.float32)
                 for vv, cc in zip(vals, cols)]
        parts.append(jnp.zeros((1, k), jnp.float32))
        stacked = jnp.concatenate(parts, axis=0)
        return stacked[pos[0]].astype(b.dtype)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(ROW_AXIS),) * (2 + 2 * len(plan.bucket_values)),
        out_specs=P(ROW_AXIS), check_vma=False)
    return fn(plan.pos, b, *plan.bucket_values, *plan.bucket_cols)
