"""Pallas executor for RouteMulPlan — the SpGEMM numeric hot path.

One dispatch computes c_values[slot] += A_arr[src_a] * B_arr[src_b] for
the whole expansion stream (see kernels/route_mul.py for the layout and
reference citations).  Structure mirrors kernels/route_spmv.py: batched
chunk DMA, two in-register gathers, permute/prefix/diff/permute, dynamic
output-window accumulate; A/B/out panes stay VMEM-resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.kernels.route_mul import RouteMulPlan
from spblas_tpu.kernels.route_plan import LANES, SUBS
from spblas_tpu.types import on_tpu as _on_tpu, no_x64

CB = 8


def _mul_chunk(a, b2, b, slabA_fn, slabB_fn, g_a, g_b):

    # B gather (elementwise; tile sublane == s7_b)
    l_b = a & 127
    o_b = (a >> 7) & 7
    slabB = slabB_fn()
    vb = jnp.zeros((SUBS, LANES), jnp.float32)
    for gg in range(g_b):
        ug = jnp.take_along_axis(slabB[gg * SUBS:(gg + 1) * SUBS], l_b,
                                 axis=1)
        vb = jnp.where(o_b == gg, ug, vb)

    # A gather (column-constant 2-step)
    l_a = b2 & 127
    o_a = (b2 >> 7) & 7
    s7a = (b2 >> 10) & 7
    slabA = slabA_fn()
    ua = jnp.zeros((SUBS, LANES), jnp.float32)
    for gg in range(g_a):
        ug = jnp.take_along_axis(slabA[gg * SUBS:(gg + 1) * SUBS], l_a,
                                 axis=1)
        ua = jnp.where(o_a == gg, ug, ua)
    va = jnp.take_along_axis(ua, s7a, axis=0)

    c = va * vb
    c = jnp.take_along_axis(c, (a >> 13) & 7, axis=0)
    c = jnp.take_along_axis(c, (a >> 16) & 127, axis=1)
    c = jnp.take_along_axis(c, (a >> 23) & 7, axis=0)

    dist = b & 7
    P = c
    for d in (1, 2, 4):
        # static rotate + dist mask (dist >= d implies sublane >= d)
        shifted = jnp.roll(P, d, axis=0)
        P = P + jnp.where(dist >= d, shifted, 0.0)

    vA = ((b >> 3) & 1).astype(jnp.float32)
    RS = jnp.take_along_axis(P, (b >> 4) & 7, axis=0)
    RS = jnp.take_along_axis(RS, (b >> 7) & 127, axis=1)
    RS = jnp.take_along_axis(RS, (b >> 14) & 7, axis=0)
    return RS * vA


def _mul_kernel(ab_ref, bb_ref, ob_ref, t1_hbm, t2_hbm, t3_hbm, a_ref,
                b_ref, o_ref, t1_buf, t2_buf, t3_buf, s1, s2, s3, *,
                g_a: int, g_b: int):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    def dmas(slot, e):
        return (
            pltpu.make_async_copy(t1_hbm.at[pl.ds(e * CB, CB)],
                                  t1_buf.at[slot], s1.at[slot]),
            pltpu.make_async_copy(t2_hbm.at[pl.ds(e * CB, CB)],
                                  t2_buf.at[slot], s2.at[slot]),
            pltpu.make_async_copy(t3_hbm.at[pl.ds(e * CB, CB)],
                                  t3_buf.at[slot], s3.at[slot]),
        )

    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
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
        upd = _mul_chunk(
            t1_buf[slot, i], t2_buf[slot, i], t3_buf[slot, i],
            lambda: a_ref[pl.ds(ab_ref[ci], SUBS * g_a), :],
            lambda: b_ref[pl.ds(bb_ref[ci], SUBS * g_b), :],
            g_a, g_b)
        ob = ob_ref[ci]
        o_ref[pl.ds(ob, SUBS), :] = o_ref[pl.ds(ob, SUBS), :] + upd


@no_x64
@functools.partial(jax.jit, static_argnames=("interpret",))
def route_mul(plan: RouteMulPlan, a_arr: jax.Array, b_arr: jax.Array,
              interpret: bool | None = None) -> jax.Array:
    """c_values (capacity,) = segment-sums of A_arr[src]*B_arr[src]."""
    if interpret is None:
        interpret = not _on_tpu()
    A = jnp.pad(a_arr.astype(jnp.float32),
                (0, plan.a_rows * LANES - a_arr.shape[0])
                ).reshape(plan.a_rows, LANES)
    B = jnp.pad(b_arr.astype(jnp.float32),
                (0, plan.b_rows * LANES - b_arr.shape[0])
                ).reshape(plan.b_rows, LANES)

    nc = plan.nchunks
    nsteps = -(-nc // CB)
    pad = nsteps * CB - nc
    t1 = jnp.pad(plan.tile1, ((0, pad), (0, 0), (0, 0)))
    t2 = jnp.pad(plan.tile2, ((0, pad), (0, 0), (0, 0)))
    t3 = jnp.pad(plan.tile3, ((0, pad), (0, 0), (0, 0)))
    ab = jnp.pad(plan.a_base, (0, pad))
    bb = jnp.pad(plan.b_base, (0, pad))
    ob = jnp.pad(plan.o_base, (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((plan.a_rows, LANES), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.b_rows, LANES), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    O = pl.pallas_call(
        functools.partial(_mul_kernel, g_a=plan.g_a, g_b=plan.g_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.out_rows, LANES),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * CB * SUBS * LANES,
            bytes_accessed=nsteps * CB * SUBS * LANES * 12
            + (plan.a_rows + plan.b_rows + plan.out_rows) * LANES * 4,
            transcendentals=0,
        ),
    )(ab, bb, ob, t1, t2, t3, A, B)
    return O.reshape(-1)[: plan.capacity]
