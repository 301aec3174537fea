"""Row-partitioned distributed sparse matrix container.

No reference counterpart (SURVEY.md §2.6 — the reference is strictly
single-device); specified by BASELINE.json's north-star distributed
SpMV/SpGEMM configs.  Design:

* **Rows are block-partitioned** over a 1-D mesh: device d owns rows
  [d*mloc, (d+1)*mloc).  Global row count is padded to p*mloc (padding rows
  are empty).
* Each device's local rows are additionally **column-blocked** into p
  blocks matching the row partition of the operand vector x, and the
  blocks are stored **rotation-scheduled**: position s on device d holds
  the block for columns of device (d+s) % p.  The ring-pipelined SpMV then
  indexes blocks with the *static* step counter — no dynamic slicing on
  device id — while ``ppermute`` rotates x chunks around the ring.
* Block layout is COO-of-blocks with a uniform padded capacity so every
  device runs the same static-shape program (SPMD).

The local block format deliberately stores ``rowloc`` explicitly (COO)
rather than rowptr: the hot op per block is gather·mul·segment-sum and the
sentinel ``mloc`` row id makes padding vanish in the reduction.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spblas_tpu import types as _t
from spblas_tpu.formats.csr import CSR
from spblas_tpu.formats.convert import to_csr
from spblas_tpu.parallel.mesh import ROW_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistCSR:
    """Row-partitioned sparse matrix over a 1-D device mesh.

    Stacked per-device arrays (leading axis = device, sharded over
    ``rows``):

      values  (p, p, bcap)  [d, s] = entries of device d's rows with
                            columns in block (d+s) % p
      rowloc  (p, p, bcap)  local row id in [0, mloc); sentinel mloc = pad
      colloc  (p, p, bcap)  column id local to its block, in [0, nloc)
      nnz     ()            total live entries (host metadata mirror)

    shape is the *unpadded* global (m, n); mloc/nloc are padded block
    sizes (m <= p*mloc, n <= p*nloc).
    """

    values: jax.Array
    rowloc: jax.Array
    colloc: jax.Array
    nnz: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))
    nloc: int = dataclasses.field(metadata=dict(static=True))

    @property
    def p(self) -> int:
        return int(self.values.shape[0])

    @property
    def block_capacity(self) -> int:
        return int(self.values.shape[2])

    @property
    def dtype(self):
        return self.values.dtype


def partition_csr(a, mesh: Mesh, block_capacity: int | None = None
                  ) -> DistCSR:
    """Host-side inspect step: partition a CSR onto the mesh.

    This is the distributed analogue of plan building — a one-time cost
    amortized over many multiplies (the inspector-executor split of the
    two-phase protocol applied to distribution).
    """
    a = to_csr(a)
    p = mesh.devices.size
    m, n = a.shape
    mloc = -(-m // p)
    nloc = -(-n // p)
    nnz = int(a.nnz)
    rows = np.asarray(a.row_ids())[:nnz].astype(np.int64)
    cols = np.asarray(a.colind)[:nnz].astype(np.int64)
    vals = np.asarray(a.values)[:nnz]

    dev = rows // mloc                      # owning device of each entry
    blk = cols // nloc                      # column block of each entry
    slot = (blk - dev) % p                  # rotation-scheduled position
    # count per (device, slot) to find the uniform block capacity
    counts = np.zeros((p, p), dtype=np.int64)
    np.add.at(counts, (dev, slot), 1)
    cap = int(counts.max()) if nnz else 1
    cap = max(_t.quantize_capacity(cap), 1)
    if block_capacity is not None:
        if block_capacity < cap:
            raise ValueError(
                f"block_capacity {block_capacity} < required {cap}")
        cap = int(block_capacity)

    values = np.zeros((p, p, cap), dtype=vals.dtype)
    rowloc = np.full((p, p, cap), mloc, dtype=np.int32)
    colloc = np.zeros((p, p, cap), dtype=np.int32)
    # stable order inside each block: sort entries by (dev, slot)
    order = np.lexsort((cols, rows, slot, dev))
    dev_s, slot_s = dev[order], slot[order]
    # per-(dev,slot) running offset via grouped cumcount (equal keys are
    # consecutive after the lexsort)
    key = dev_s * p + slot_s
    if nnz:
        first = np.concatenate([[True], key[1:] != key[:-1]])
        grp_start = np.flatnonzero(first)
        pos = np.arange(nnz) - np.repeat(
            grp_start, np.diff(np.append(grp_start, nnz)))
    else:
        pos = np.zeros(0, dtype=np.int64)
    values[dev_s, slot_s, pos] = vals[order]
    rowloc[dev_s, slot_s, pos] = (rows[order] % mloc).astype(np.int32)
    colloc[dev_s, slot_s, pos] = (cols[order] % nloc).astype(np.int32)

    shard = NamedSharding(mesh, P(ROW_AXIS, None, None))
    return DistCSR(
        values=jax.device_put(jnp.asarray(values), shard),
        rowloc=jax.device_put(jnp.asarray(rowloc), shard),
        colloc=jax.device_put(jnp.asarray(colloc), shard),
        nnz=jnp.asarray(nnz, dtype=jnp.int32),
        shape=(m, n), mloc=mloc, nloc=nloc)


def partition_vector(x, dist: DistCSR, mesh: Mesh, axis: str = "cols"
                     ) -> jax.Array:
    """Pad x to p*nloc (or p*mloc for axis='rows') and shard over the mesh."""
    x = jnp.asarray(x)
    p = dist.p
    tgt = p * (dist.nloc if axis == "cols" else dist.mloc)
    if x.shape[0] < tgt:
        pad = [(0, tgt - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    shard = NamedSharding(mesh, P(ROW_AXIS, *([None] * (x.ndim - 1))))
    return jax.device_put(x, shard)


def gather_result(y: jax.Array, dist: DistCSR) -> jax.Array:
    """Strip row padding from a distributed result vector/matrix."""
    return y[: dist.shape[0]]


def to_local_csr(dist: DistCSR) -> CSR:
    """Reassemble the global CSR on host (testing / IO utility)."""
    p, mloc, nloc = dist.p, dist.mloc, dist.nloc
    values = np.asarray(dist.values)
    rowloc = np.asarray(dist.rowloc)
    colloc = np.asarray(dist.colloc)
    rows, cols, vals = [], [], []
    for d in range(p):
        for s in range(p):
            live = rowloc[d, s] < mloc
            rows.append(rowloc[d, s][live] + d * mloc)
            cols.append(colloc[d, s][live] + ((d + s) % p) * nloc)
            vals.append(values[d, s][live])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    m, n = dist.shape
    rowptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(rowptr[1:], rows, 1)
    rowptr = np.cumsum(rowptr)
    return CSR.from_arrays(vals, rowptr, cols, (m, n), nnz=len(vals))
