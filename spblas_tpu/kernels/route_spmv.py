"""ROUTE SpMV Pallas kernel: unstructured CSR at in-register gather speed.

Executes the :class:`~spblas_tpu.kernels.route_plan.RoutePlan` layout in a
single Pallas dispatch (reference capability bar: the vendor CSR SpMV
kernels, include/spblas/vendor/cusparse/detail/spmv_impl.hpp:26-102).

Kernel structure (one grid step per (8,128) chunk, bsr_pallas-style
manual double-buffered DMA — the platform's proven scalar-prefetch
pattern; blocked-input PrefetchScalarGridSpec hangs this Mosaic version):

  x       VMEM-resident (x_rows,128) f32; per chunk a dynamic 8G-sublane
          slab slice; gather = G-way elementwise select of lane
          ``take_along_axis`` ops (measured ~5 ns/tile on v5e — the only
          fast gather on this platform; PERF_NOTES.md round 2).
  chunk   tile1/tile3/val live in HBM (pl.ANY) and stream through a
          2-slot VMEM scratch via make_async_copy, next chunk's DMA
          overlapping this chunk's compute.
  reduce  3-phase in-register permutation -> in-column *segmented*
          prefix (3 sublane-shift adds masked by within-segment
          distance; Mosaic has no cumsum) -> second 3-phase permutation
          of the segment-end sums to y-window slots -> dynamic (8,128)
          y accumulate.

y stays VMEM-resident for the whole dispatch, so chunk order is free and
rows split across chunks just accumulate.  VMEM budget: x + y + scratch;
the chooser keeps (x_rows + y_rows) * 512 B under ~12 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.kernels.route_plan import LANES, SUBS, RoutePlan
from spblas_tpu.types import on_tpu as _on_tpu, no_x64


CB = 8          # chunks per grid step (amortizes grid/DMA overhead)


def _chunk_body(a, b, val, slab_fn, g):
    """One (8,128) chunk: gather, permute, reduce.  Returns (RS*vA, yb
    handled by caller)."""
    # gather
    l = (a >> 3) & 127
    oct_ = (a >> 10) & 7
    slab = slab_fn()
    vx = jnp.zeros((SUBS, LANES), jnp.float32)
    for gg in range(g):
        ug = jnp.take_along_axis(slab[gg * SUBS:(gg + 1) * SUBS], l,
                                 axis=1)
        vx = jnp.where(oct_ == gg, ug, vx)
    c = vx * val

    # permute 1: gather layout -> scatter layout
    c = jnp.take_along_axis(c, (a >> 13) & 7, axis=0)
    c = jnp.take_along_axis(c, (a >> 16) & 127, axis=1)
    c = jnp.take_along_axis(c, (a >> 23) & 7, axis=0)

    # in-column segmented prefix over 8 sublanes: static sublane
    # rotate + dist mask (dist >= d implies sublane >= d, so wrapped
    # rows self-mask; a dynamic take here measured ~8 ns/step slower)
    dist = b & 7
    P = c
    for d in (1, 2, 4):
        shifted = jnp.roll(P, d, axis=0)
        P = P + jnp.where(dist >= d, shifted, 0.0)

    vA = ((b >> 3) & 1).astype(jnp.float32)

    # permute 2: segment ends -> y window slots
    RS = jnp.take_along_axis(P, (b >> 4) & 7, axis=0)
    RS = jnp.take_along_axis(RS, (b >> 7) & 127, axis=1)
    RS = jnp.take_along_axis(RS, (b >> 14) & 7, axis=0)
    return RS * vA


def _route_kernel(sb_ref, yb_ref, t1_hbm, t3_hbm, val_hbm, x_ref, y_ref,
                  t1_buf, t3_buf, val_buf, t1_sem, t3_sem, val_sem, *,
                  g: int):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    def dmas(slot, e):
        return (
            pltpu.make_async_copy(t1_hbm.at[pl.ds(e * CB, CB)],
                                  t1_buf.at[slot], t1_sem.at[slot]),
            pltpu.make_async_copy(t3_hbm.at[pl.ds(e * CB, CB)],
                                  t3_buf.at[slot], t3_sem.at[slot]),
            pltpu.make_async_copy(val_hbm.at[pl.ds(e * CB, CB)],
                                  val_buf.at[slot], val_sem.at[slot]),
        )

    @pl.when(k == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)
        for d in dmas(0, 0):
            d.start()

    slot = jax.lax.rem(k, 2)

    @pl.when(k + 1 < nk)
    def _():
        for d in dmas(1 - slot, k + 1):
            d.start()

    for d in dmas(slot, k):
        d.wait()

    for i in range(CB):
        ci = k * CB + i
        a = t1_buf[slot, i]
        b = t3_buf[slot, i]
        val = val_buf[slot, i]
        upd = _chunk_body(
            a, b, val,
            lambda: x_ref[pl.ds(sb_ref[ci], SUBS * g), :], g)
        yb = yb_ref[ci]
        y_ref[pl.ds(yb, SUBS), :] = y_ref[pl.ds(yb, SUBS), :] + upd


@no_x64
@functools.partial(jax.jit, static_argnames=("interpret",))
def route_spmv(plan: RoutePlan, x: jax.Array,
               interpret: bool | None = None) -> jax.Array:
    """y = A @ x through a ROUTE plan (single Pallas dispatch)."""
    if interpret is None:
        interpret = not _on_tpu()
    m, n = plan.shape
    g = plan.g
    xdt = x.dtype
    flat = jnp.pad(x.astype(jnp.float32),
                   (0, plan.x_rows * LANES - n))
    nhot = plan.hot_cols.shape[0]
    if nhot:
        # hot-column replicas: one copy per sublane class (small scatter)
        hv = x.astype(jnp.float32)[plan.hot_cols]
        t = jnp.arange(nhot, dtype=jnp.int32)
        pos = plan.n_pad + (t // LANES) * (SUBS * LANES) + (t % LANES)
        idx = (pos[None, :]
               + LANES * jnp.arange(SUBS, dtype=jnp.int32)[:, None]
               ).reshape(-1)
        flat = flat.at[idx].set(jnp.broadcast_to(hv, (SUBS, nhot)
                                                 ).reshape(-1))
    x2 = flat.reshape(plan.x_rows, LANES)

    # pad the chunk streams to a CB multiple (pad chunks have vA=0 and
    # contribute nothing; their slab/y bases point at row 0)
    nc = plan.nchunks
    nsteps = -(-nc // CB)
    pad = nsteps * CB - nc
    t1 = jnp.pad(plan.tile1, ((0, pad), (0, 0), (0, 0)))
    t3 = jnp.pad(plan.tile3, ((0, pad), (0, 0), (0, 0)))
    val = jnp.pad(plan.val, ((0, pad), (0, 0), (0, 0)))
    sb = jnp.pad(plan.slab_base, (0, pad))
    yb = jnp.pad(plan.y_base, (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # slab_base, y_base
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # tile1
            pl.BlockSpec(memory_space=pl.ANY),      # tile3
            pl.BlockSpec(memory_space=pl.ANY),      # val
            pl.BlockSpec((plan.x_rows, LANES), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y2 = pl.pallas_call(
        functools.partial(_route_kernel, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.pane_rows, LANES),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * CB * SUBS * LANES,
            bytes_accessed=nsteps * CB * SUBS * LANES * 12
            + (plan.x_rows + plan.pane_rows) * LANES * 4,
            transcendentals=0,
        ),
    )(sb, yb, t1, t3, val, x2)
    y = y2.reshape(-1)[:m]
    if plan.aux_plan is not None:
        aux = jax.lax.dynamic_slice(
            y2.reshape(-1), (plan.y_rows * LANES,), (plan.aux_len,))
        y = y + route_spmv(plan.aux_plan, aux, interpret=interpret)
    return y.astype(xdt)
