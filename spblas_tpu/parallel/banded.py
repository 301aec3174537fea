"""Distributed banded SpMV: halo exchange + local Pallas band panels.

The BASELINE.json north-star configuration: a row-partitioned banded
matrix where device d's rows touch only columns
[d*mloc - h, (d+1)*mloc + h) — so the only communication per multiply is
a ppermute of the h-wide x edges with the two ring neighbors, which XLA
overlaps with the local panel sweep.  Compare `dist_csr.DistCSR`'s
general rotation pipeline: the banded structure shrinks the exchanged
volume from O(n) to O(h) per device.

The local compute is the measured-roofline banded-panel kernel
(spblas_tpu.kernels.banded); no gather/scatter anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spblas_tpu.formats.convert import to_csr
from spblas_tpu.kernels.banded import _G, _R, band_halfwidth, \
    band_spmm_padded, band_spmv_padded
from spblas_tpu.parallel.mesh import ROW_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistBandPlan:
    """panels (p, nblk_loc*128, w) sharded over the row axis; device d's
    panel block i covers global rows d*mloc + [i*128, (i+1)*128) and
    global columns d*mloc + i*128 + [−h, 128+h)."""

    panels: jax.Array
    h: int = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def p(self) -> int:
        return int(self.panels.shape[0])

    @property
    def width(self) -> int:
        return int(self.panels.shape[2])


def partition_band(a, mesh: Mesh) -> DistBandPlan:
    """Host inspect: partition a banded square matrix into per-device
    dense panels (the distributed analogue of build_band_plan)."""
    a = to_csr(a)
    m, n = a.shape
    if m != n:
        raise ValueError("distributed band requires a square matrix")
    p = mesh.devices.size
    h = band_halfwidth(a)
    mloc = -(-m // p)
    mloc = -(-mloc // (_G * _R)) * (_G * _R)   # uniform static block count
    if h > mloc:
        raise ValueError(
            f"band half-width {h} exceeds local rows {mloc}; "
            "use fewer devices or the general DistCSR path")
    w = -(-(_R + 2 * h) // 8) * 8   # 8-aligned (Mosaic slice tiling)
    nblk = mloc // _R
    nnz = int(a.nnz)
    from spblas_tpu.formats.csr import host_row_ids
    rows = host_row_ids(a.rowptr, nnz, m)
    cols = np.asarray(a.colind)[:nnz]
    vals = np.asarray(a.values)[:nnz]

    panels = np.zeros((p, nblk * _R, w), dtype=vals.dtype)
    dev = rows // mloc
    r_loc = rows % mloc
    # panel-local column: global col - (dev*mloc + blk*128 - h)
    c_loc = cols - dev * mloc - (r_loc // _R) * _R + h
    if not ((c_loc >= 0) & (c_loc < w)).all():
        raise ValueError("entry outside band window")
    panels[dev, r_loc, c_loc] = vals
    shard = NamedSharding(mesh, P(ROW_AXIS, None, None))
    return DistBandPlan(panels=jax.device_put(jnp.asarray(panels), shard),
                        h=h, mloc=mloc, shape=(m, n))


def dist_band_spmv(plan: DistBandPlan, x: jax.Array, mesh: Mesh
                   ) -> jax.Array:
    """y = A @ x with x/y block-sharded (padded length p*mloc).

    Per device and step: one ppermute of each h-wide edge (left and
    right), then the local panel sweep over [left | local | right].
    Boundary devices receive zeros (ppermute semantics), matching the
    zero padding of the single-device kernel.
    """
    p, mloc, h = plan.p, plan.mloc, plan.h
    from spblas_tpu.parallel.mesh import check_mesh_matches
    check_mesh_matches(p, mesh, "dist_band_spmv")
    if x.shape[0] != p * mloc:
        raise ValueError(
            f"x length {x.shape[0]} != padded {p * mloc}; "
            "use partition_band_vector")
    w = plan.width
    nblk = mloc // _R
    tail = nblk * _R + w - _R  # required xp length for the panel sweep

    def body(panels, xl):
        panels = panels[0]
        # halo exchange: device d sends its tail right / head left
        left = jax.lax.ppermute(
            xl[mloc - h:], ROW_AXIS,
            [(i, i + 1) for i in range(p - 1)]) if h else \
            jnp.zeros((0,), xl.dtype)
        right = jax.lax.ppermute(
            xl[:h], ROW_AXIS,
            [(i + 1, i) for i in range(p - 1)]) if h else \
            jnp.zeros((0,), xl.dtype)
        xwin = jnp.concatenate([left, xl, right])
        xp = jnp.pad(xwin, (0, tail - xwin.shape[0]))
        # cast back like the single-device band_spmv: the chooser's
        # band/route kinds must agree on output dtype (round-4 review)
        return band_spmv_padded(panels, xp).astype(
            jnp.result_type(panels.dtype, xl.dtype))

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the jax 0.9 checker would otherwise reject
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(ROW_AXIS, None, None), P(ROW_AXIS)),
                       out_specs=P(ROW_AXIS), check_vma=False)
    return fn(plan.panels, x)


def dist_band_spmm(plan: DistBandPlan, b: jax.Array, mesh: Mesh
                   ) -> jax.Array:
    """C = A @ B for dense B (p*mloc, k) row-sharded: the SpMM variant
    of the halo pipeline — each device exchanges only its (h, k) edge
    panels with ring neighbors."""
    p, mloc, h = plan.p, plan.mloc, plan.h
    from spblas_tpu.parallel.mesh import check_mesh_matches
    check_mesh_matches(p, mesh, "dist_band_spmm")
    if b.shape[0] != p * mloc:
        raise ValueError(
            f"B rows {b.shape[0]} != padded {p * mloc}; "
            "use partition_band_vector")
    k = b.shape[1]
    w = plan.width
    nblk = mloc // _R
    tail = nblk * _R + w - _R

    def body(panels, bl):
        panels = panels[0]
        left = jax.lax.ppermute(
            bl[mloc - h:], ROW_AXIS,
            [(i, i + 1) for i in range(p - 1)]) if h else \
            jnp.zeros((0, k), bl.dtype)
        right = jax.lax.ppermute(
            bl[:h], ROW_AXIS,
            [(i + 1, i) for i in range(p - 1)]) if h else \
            jnp.zeros((0, k), bl.dtype)
        bwin = jnp.concatenate([left, bl, right])
        bp = jnp.pad(bwin, ((0, tail - bwin.shape[0]), (0, 0)))
        return band_spmm_padded(panels, bp).astype(
            jnp.result_type(panels.dtype, bl.dtype))

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(ROW_AXIS, None, None),
                                 P(ROW_AXIS, None)),
                       out_specs=P(ROW_AXIS, None), check_vma=False)
    return fn(plan.panels, b)


def partition_band_vector(x, plan: DistBandPlan, mesh: Mesh) -> jax.Array:
    x = jnp.asarray(x)
    tgt = plan.p * plan.mloc
    if x.shape[0] < tgt:
        pad = [(0, tgt - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    spec = P(ROW_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
