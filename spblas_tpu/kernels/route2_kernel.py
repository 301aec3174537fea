"""Pallas executor for Route2Plan — one-lane-gather-per-chunk SpMV.

Executes :class:`spblas_tpu.kernels.route2.Route2Plan` in a single
dispatch (reference capability bar: vendor CSR SpMV kernels,
include/spblas/vendor/cusparse/detail/spmv_impl.hpp:26-102).  See
kernels/route2.py for the layout derivation and the measured v5e op
costs that shaped it (lane gather ~10-14 ns; sublane gather / select /
mul ~1 ns).

Structure per grid step (CB chunks, double-buffered DMA as in
kernels/route_spmv.py): tile+val stream from HBM; x pane and output
pane are VMEM-resident.  Aux chunks (src_flag=1) gather from the
output pane itself — the sequential TPU grid makes earlier chunks'
writes visible — so hub-row spill reduction needs no second dispatch.
Chunk groups are flag-homogeneous (the builder pads to CB boundaries);
the per-group flag picks the slab source via predication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.kernels.route2 import (B2_LF, B2_R2, B2_SD2,
                                       B_DIST, B_LF, B_LSRC, B_PEND,
                                       B_R2, B_SD2, B_SEL, B_SUBW,
                                       B_VA, LANES, SUBS, Route2MulPlan,
                                       Route2Plan)
from spblas_tpu.types import on_tpu as _on_tpu, no_x64

CB = 8          # chunks per grid step (the builder aligns flag groups;
                # CB=16 measured only ~2% faster on uniform 300k)


def _r2_route(r2, slab, g):
    """t1[a,l] = slab[r2[a,l], l]: per octant of the materialized
    (8g,128) slab, one sublane gather by (r2 & 7) + one select on
    (r2 >> 3) == gg.  (Mosaic's gather lowering requires index shape ==
    source shape, so a single take across (8g,128) cannot lower; and
    slicing the g octants straight off the pane ref measured ~30%
    slower than one materialized slab copy.)  The full-row index
    removes the old sel table's col-mod-1024 class constraint."""
    if g == 1:
        return jnp.take_along_axis(slab, r2 & 7, axis=0)
    lo = r2 & 7
    hi = r2 >> 3
    t1 = jnp.zeros((SUBS, LANES), jnp.float32)
    for gg in range(g):
        part = jnp.take_along_axis(slab[gg * SUBS:(gg + 1) * SUBS], lo,
                                   axis=0)
        t1 = jnp.where(hi == gg, part, t1)
    return t1


def _chunk_body(t, val, slab, g, dist_max, any_lane=False):
    """One (8,128) chunk: r2 slab-row route, lane gather, depth drop,
    multiply, segmented prefix, publish.  The prefix compiles only the
    steps the plan needs (dist_max static): uniform plans have
    dist <= 1-2, so 1-2 of 3 roll+mask+add triples drop out.

    ``any_lane`` (plan-static): publishes read their segment sum from
    an arbitrary accumulation lane through the B_LSRC carrier — one
    extra lane gather buys the packer freedom from the per-lane depth-8
    Poisson wall (fill ~0.37 -> ~0.7+ on uniform patterns, round 3)."""
    t1 = _r2_route((t >> B_R2) & 255, slab, g)
    t2 = jnp.take_along_axis(t1, (t >> B_LF) & 127, axis=1)   # THE lane op
    t3 = jnp.take_along_axis(t2, (t >> B_SD2) & 7, axis=0)
    c = t3 * val

    dist = (t >> B_DIST) & 7
    P = c
    for d in (1, 2, 4):
        if d > dist_max:
            break
        # static sublane rotate + mask (cheaper than a dynamic gather);
        # wrapped rows are safe: dist >= d implies sublane >= d
        shifted = jnp.roll(P, d, axis=0)
        P = P + jnp.where(dist >= d, shifted, 0.0)

    RS = jnp.take_along_axis(P, (t >> B_PEND) & 7, axis=0)
    if any_lane:
        # G[s,l] = P[pend[s,l], l] landed each lane's selected depth;
        # the publish slot's lsrc then gathers its value from its
        # accumulation lane: RS[s,l] = P[pend[s, lsrc], lsrc] with the
        # pend CARRIER at (s_pub, acc_lane) and lsrc at the publish
        # slot (kernels/route2.py bit-layout note)
        RS = jnp.take_along_axis(RS, (t >> B_LSRC) & 127, axis=1)
    vA = ((t >> B_VA) & 1).astype(jnp.float32)
    return RS * vA


def _hub_chunk_body(t, val, slab, g):
    """Flag-2 hub chunk: elements sit at identity lanes (no lane
    gather, no prefix) and the whole tile reduces to ONE scalar —
    published at the single B_VA slot.  Hub rows thus pack at fill ~1
    with no coloring constraints (round 4, VERDICT r3 #4)."""
    t1 = _r2_route((t >> B_R2) & 255, slab, g)
    s = jnp.sum(t1 * val)
    vA = ((t >> B_VA) & 1).astype(jnp.float32)
    return vA * s


def _unrotate(tile, rhi):
    """Destination-indexed SUBLANE roll of an (8,128) tile by the
    traced scalar rhi: T[i,j] = tile[(i + rhi) & 7, j] — one sublane
    gather (~1 ns).  The packer emits sublane-aligned rotations only
    (rho a multiple of 128): the packing sim showed full-position and
    sublane-only rotations reach the SAME fill, and this form skips
    the ~12 ns lane gather + carry select of the general roll
    (benchmarks/dev/rot_publish_ab.py, rho_pack_sim.py)."""
    ii = jnp.broadcast_to(jnp.arange(SUBS)[:, None], (SUBS, LANES))
    return jnp.take_along_axis(tile, (ii + rhi) & 7, axis=0)


def _route2_kernel(sb_ref, yb_ref, fl_ref, rho_ref, t_hbm, v_hbm,
                   x_ref, y_ref,
                   t_buf, v_buf, t_sem, v_sem, *, g: int,
                   has_aux: bool, init_from_x: bool = False,
                   dist_max: int = 7, any_lane: bool = False,
                   ww: int = 1, has_hub: bool = False,
                   rotated: bool = False):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    def dmas(slot, e):
        return (
            pltpu.make_async_copy(t_hbm.at[pl.ds(e * CB, CB)],
                                  t_buf.at[slot], t_sem.at[slot]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(e * CB, CB)],
                                  v_buf.at[slot], v_sem.at[slot]),
        )

    @pl.when(k == 0)
    def _():
        if init_from_x:
            # solve mode: the output pane starts at y0 = b/(alpha*d)
            y_ref[...] = x_ref[...]
        else:
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

    def publish(t, upd, ci):
        yb = yb_ref[ci]
        if rotated:
            # per-chunk d=2 publish rotations (round 5): move each
            # publish from its rotated slot back to its true position;
            # the two rotation classes (sel bit) un-rotate separately —
            # two same-destination publishes in one chunk necessarily
            # used different sels, so their values AND their subw
            # fields must ride separate ladders
            rho = rho_ref[ci]
            r0 = (rho >> 7) & 7         # sublane-aligned rotations
            r1 = (rho >> 17) & 7
            sel = (t >> B_SEL) & 1
            u0 = _unrotate(jnp.where(sel == 0, upd, 0.0), r0)
            u1 = _unrotate(jnp.where(sel == 1, upd, 0.0), r1)
            if ww == 1:
                upd2 = u0 + u1
                y_ref[pl.ds(yb, SUBS), :] = \
                    y_ref[pl.ds(yb, SUBS), :] + upd2
            else:
                s0 = (_unrotate(jnp.where(sel == 0, t, 0),
                                r0) >> B_SUBW) & 7
                s1 = (_unrotate(jnp.where(sel == 1, t, 0),
                                r1) >> B_SUBW) & 7
                wide = jnp.concatenate(
                    [jnp.where(s0 == sw, u0, 0.0)
                     + jnp.where(s1 == sw, u1, 0.0)
                     for sw in range(ww)], axis=0)
                y_ref[pl.ds(yb, ww * SUBS), :] = \
                    y_ref[pl.ds(yb, ww * SUBS), :] + wide
        elif ww == 1:
            y_ref[pl.ds(yb, SUBS), :] = y_ref[pl.ds(yb, SUBS), :] + upd
        else:
            # supercell publish: route the (8,128) publish tile to its
            # sub-window via a select ladder + ONE (8ww,128) RMW
            # (A/B'd cost-neutral vs the plain publish — benchmarks/
            # dev/subwindow_publish_ab.py: wide 112.3 vs base 111.9
            # ns/chunk; 8 masked RMWs were +22 ns)
            subw = (t >> B_SUBW) & 7
            wide = jnp.concatenate(
                [jnp.where(subw == sw, upd, 0.0)
                 for sw in range(ww)], axis=0)
            y_ref[pl.ds(yb, ww * SUBS), :] = \
                y_ref[pl.ds(yb, ww * SUBS), :] + wide

    def group(src_ref):
        for i in range(CB):
            ci = k * CB + i
            t = t_buf[slot, i]
            slab = src_ref[pl.ds(sb_ref[ci], SUBS * g), :]
            upd = _chunk_body(t, v_buf[slot, i], slab, g,
                              dist_max, any_lane)
            publish(t, upd, ci)

    def hub_group():
        for i in range(CB):
            ci = k * CB + i
            t = t_buf[slot, i]
            slab = x_ref[pl.ds(sb_ref[ci], SUBS * g), :]
            publish(t, _hub_chunk_body(t, v_buf[slot, i], slab, g), ci)

    fl = fl_ref[k * CB]
    if has_hub and has_aux:
        @pl.when(fl == 0)
        def _():
            group(x_ref)

        @pl.when(fl == 2)
        def _():
            hub_group()

        @pl.when(fl == 1)
        def _():
            group(y_ref)
    elif has_hub:
        @pl.when(fl == 0)
        def _():
            group(x_ref)

        @pl.when(fl == 2)
        def _():
            hub_group()
    elif has_aux:
        @pl.when(fl == 0)
        def _():
            group(x_ref)

        @pl.when(fl != 0)
        def _():
            group(y_ref)
    else:
        group(x_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def route2_spmv(plan: Route2Plan, x: jax.Array,
                interpret: bool | None = None) -> jax.Array:
    """y = A @ x through a ROUTE2 plan (single Pallas dispatch)."""
    if interpret is None:
        interpret = not _on_tpu()
    m, n = plan.shape
    g = plan.g
    xdt = x.dtype
    xf = x.astype(jnp.float32)
    next_ = plan.ext_cols.shape[0]
    if next_:
        # extension region: class-rebalanced column copies (one gather)
        flat = jnp.concatenate([
            jnp.pad(xf, (0, plan.nat_slots - n)),
            xf[plan.ext_cols],
        ])
    else:
        flat = xf
    x2 = jnp.pad(flat, (0, plan.x_rows * LANES - flat.shape[0])
                 ).reshape(plan.x_rows, LANES)

    # the output pane doubles as the aux gather source; keep it at
    # least one slab tall so padded/aux chunk slab slices stay in range
    out_rows = max(plan.pane_rows, SUBS * g)
    y2 = route2_dispatch(plan.tile, plan.val, plan.slab_base,
                         plan.y_base, plan.src_flag, x2, g=g,
                         x_rows=plan.x_rows, out_rows=out_rows,
                         has_aux=plan.n_aux_chunks > 0,
                         interpret=interpret, dist_max=plan.dist_max,
                         any_lane=plan.any_lane,
                         row_window_mult=plan.row_window_mult,
                         has_hub=plan.has_hub,
                         rho=plan.rho, rotated=plan.rotated)
    return jax.lax.slice(y2.reshape(-1), (0,), (m,)).astype(xdt)


@no_x64
def route2_dispatch(tile, val, slab_base, y_base, src_flag, x2, *,
                    g: int, x_rows: int, out_rows: int, has_aux: bool,
                    interpret: bool, init_from_x: bool = False,
                    dist_max: int = 7, any_lane: bool = False,
                    row_window_mult: int = 1, has_hub: bool = False,
                    rho=None, rotated: bool = False):
    """The raw ROUTE2 pallas dispatch over plan arrays — shared by
    route2_spmv, route2_solve and the distributed per-shard executor
    (parallel/route_spmv.py), which cannot pass plan pytrees through
    shard_map."""
    nc = int(tile.shape[0])
    nsteps = -(-nc // CB)
    pad = nsteps * CB - nc
    t = jnp.pad(tile, ((0, pad), (0, 0), (0, 0)))
    v = jnp.pad(val, ((0, pad), (0, 0), (0, 0)))
    sb = jnp.pad(slab_base, (0, pad))
    yb = jnp.pad(y_base, (0, pad))
    fl = jnp.pad(src_flag, (0, pad), mode="edge")
    if rho is None:
        rh = jnp.zeros((nc + pad,), jnp.int32)
    else:
        rh = jnp.pad(rho, (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # slab_base, y_base, src_flag, rho
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # tile
            pl.BlockSpec(memory_space=pl.ANY),      # val
            pl.BlockSpec((x_rows, LANES), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_route2_kernel, g=g, has_aux=has_aux,
                          init_from_x=init_from_x, dist_max=dist_max,
                          any_lane=any_lane, ww=row_window_mult,
                          has_hub=has_hub, rotated=rotated),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * CB * SUBS * LANES,
            bytes_accessed=nsteps * CB * SUBS * LANES * 8
            + (x_rows + out_rows) * LANES * 4,
            transcendentals=0,
        ),
    )(sb, yb, fl, rh, t, v, x2)


# SMEM holds 3 x 4 B of chunk scalars per chunk (~1 MB scalar memory);
# deeper solves chain dispatches, each re-seeding the pane from the
# previous one's output (round 4 — lifts the old ~85k-chunk cap)
_SOLVE_CHUNKS_PER_DISPATCH = 60_000


@functools.partial(jax.jit, static_argnames=("interpret",))
def route2_solve(plan: Route2Plan, y0: jax.Array,
                 interpret: bool | None = None) -> jax.Array:
    """x = level-scheduled triangular substitution over a plan from
    kernels.route2.build_route2_solve_plan: the output pane starts at
    y0 and every chunk gathers from it (chunks are packed in
    dependency-level order, so earlier grid steps' publishes are
    visible to later gathers).  One Pallas dispatch within the SMEM
    chunk budget; beyond it the chunk stream splits at CB boundaries
    into chained dispatches over the same pane."""
    if interpret is None:
        interpret = not _on_tpu()
    m = plan.shape[0]
    rows = max(plan.pane_rows, plan.x_rows)
    y0dt = y0.dtype
    pane = jnp.pad(y0.astype(jnp.float32),
                   (0, rows * LANES - y0.shape[0])).reshape(rows, LANES)

    nc = plan.nchunks
    seg = _SOLVE_CHUNKS_PER_DISPATCH - _SOLVE_CHUNKS_PER_DISPATCH % CB
    lo = 0
    while True:
        hi = min(nc, lo + seg)
        pane = route2_dispatch(
            plan.tile[lo:hi], plan.val[lo:hi], plan.slab_base[lo:hi],
            plan.y_base[lo:hi], plan.src_flag[lo:hi], pane, g=plan.g,
            x_rows=rows, out_rows=rows, has_aux=True,
            interpret=interpret, init_from_x=True,
            dist_max=plan.dist_max, any_lane=plan.any_lane)
        lo = hi
        if lo >= nc:
            break
    return jax.lax.slice(pane.reshape(-1), (0,), (m,)).astype(y0dt)


# ------------------------------------------------------------------ #
# ROUTE2-mul: fused SpGEMM numeric (dual gather chains)
# ------------------------------------------------------------------ #

def _gather_chain(t, slab, g, b_r2, b_lf, b_sd2):
    u = _r2_route((t >> b_r2) & 255, slab, g)
    u = jnp.take_along_axis(u, (t >> b_lf) & 127, axis=1)
    return jnp.take_along_axis(u, (t >> b_sd2) & 7, axis=0)


def _mul_chunk_body(t1, t2, slabA, slabB, g_a, g_b, dist_max):
    tA = _gather_chain(t2, slabA, g_a, B2_R2, B2_LF, B2_SD2)
    tB = _gather_chain(t1, slabB, g_b, B_R2, B_LF, B_SD2)
    c = tA * tB
    dist = (t1 >> B_DIST) & 7
    P = c
    for d in (1, 2, 4):
        if d > dist_max:
            break
        shifted = jnp.roll(P, d, axis=0)
        P = P + jnp.where(dist >= d, shifted, 0.0)
    RS = jnp.take_along_axis(P, (t1 >> B_PEND) & 7, axis=0)
    vA = ((t1 >> B_VA) & 1).astype(jnp.float32)
    return RS * vA


def _route2_mul_kernel(ab_ref, bb_ref, yb_ref, fl_ref, t1_hbm, t2_hbm,
                       a_ref, b_ref, y_ref, t1_buf, t2_buf, s1, s2, *,
                       g_a: int, g_b: int, has_aux: bool,
                       dist_max: int = 7):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    def dmas(slot, e):
        return (
            pltpu.make_async_copy(t1_hbm.at[pl.ds(e * CB, CB)],
                                  t1_buf.at[slot], s1.at[slot]),
            pltpu.make_async_copy(t2_hbm.at[pl.ds(e * CB, CB)],
                                  t2_buf.at[slot], s2.at[slot]),
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

    def group(srcB_ref):
        for i in range(CB):
            ci = k * CB + i
            slabA = a_ref[pl.ds(ab_ref[ci], SUBS * g_a), :]
            slabB = srcB_ref[pl.ds(bb_ref[ci], SUBS * g_b), :]
            upd = _mul_chunk_body(t1_buf[slot, i], t2_buf[slot, i],
                                  slabA, slabB, g_a, g_b, dist_max)
            yb = yb_ref[ci]
            y_ref[pl.ds(yb, SUBS), :] = y_ref[pl.ds(yb, SUBS), :] + upd

    if has_aux:
        @pl.when(fl_ref[k * CB] == 0)
        def _():
            group(b_ref)

        @pl.when(fl_ref[k * CB] != 0)
        def _():
            group(y_ref)
    else:
        group(b_ref)


@no_x64
@functools.partial(jax.jit, static_argnames=("interpret",))
def route2_mul(plan: Route2MulPlan, a_arr: jax.Array, b_arr: jax.Array,
               interpret: bool | None = None) -> jax.Array:
    """c_values (capacity,) = slot-segment sums of A_arr[sa]*B_arr[sb]
    in one dispatch (values fresh from the panes — no update step)."""
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
    ab = jnp.pad(plan.a_base, (0, pad))
    bb = jnp.pad(plan.b_base, (0, pad))
    yb = jnp.pad(plan.y_base, (0, pad))
    fl = jnp.pad(plan.src_flag, (0, pad), mode="edge")

    out_rows = max(plan.pane_rows, SUBS * plan.g_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=[
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
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y2 = pl.pallas_call(
        functools.partial(_route2_mul_kernel, g_a=plan.g_a,
                          g_b=plan.g_b,
                          has_aux=plan.n_aux_chunks > 0,
                          dist_max=plan.dist_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * CB * SUBS * LANES,
            bytes_accessed=nsteps * CB * SUBS * LANES * 8
            + (plan.a_rows + plan.b_rows + out_rows) * LANES * 4,
            transcendentals=0,
        ),
    )(ab, bb, yb, fl, t1, t2, A, B)
    return jax.lax.slice(y2.reshape(-1), (0,), (plan.capacity,))
