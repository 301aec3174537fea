"""Paned ROUTE2-mul: beyond-VMEM fused SpGEMM numeric (round 4).

The resident mul engine (kernels/route2_kernel.py ``route2_mul``) keeps
the A pane, the B pane and the whole output pane VMEM-resident, capping
it at a_len + b_len + capacity ≲ 2.3M entries and the expansion at 8M
(ops/spgemm.py round-3 gate).  This executor lifts the output and
expansion caps the way round 3's paned SpMV lifted the x cap
(kernels/route_paned.py):

  * output slots are split into PANELS — each panel is one Pallas
    dispatch whose y panel (plus its aux region) is VMEM-resident; the
    expansion stream is slot-sorted, so panels are contiguous slices;
  * the B pane streams HBM -> VMEM through a double buffer, one pane
    ahead, scheduled by the same per-group DMA event streams as the
    paned SpMV (flag-0 chunks re-sorted B-pane-major inside each
    panel);
  * the A pane stays VMEM-resident (the chunk sort is B-window-major,
    so A windows change fastest — streaming A would thrash); operands
    past the A gate fall back to the XLA numeric.

Chunk geometry, bit layout and the dual gather chains are unchanged —
panels reuse ``route2._build_route2_mul_arrays`` on slot slices with a
COMMON (g_a, g_b), so fill matches a hypothetical all-resident plan.

Reference capability bar: rocSPARSE's reuse state handles any problem
size with a grow-only workspace
(include/spblas/vendor/rocsparse/multiply_spgemm.hpp:101-105,:150-214).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.kernels.route2 import (ROW_WINDOW,
                                       _build_route2_mul_arrays,
                                       mul_pane_g)
from spblas_tpu.kernels.route2_kernel import CB, _mul_chunk_body
from spblas_tpu.kernels.route_plan import LANES, SLOTS, SUBS
from spblas_tpu.types import on_tpu as _on_tpu, no_x64

# per-chunk scalar prefetch: ab/bb/yb/fl = 16 B + event streams ~2 B —
# keep one dispatch well under the ~1 MB SMEM
_CHUNKS_PER_DISPATCH = 45_000
# streamed B pane: 4096 sublane rows = 2 MB f32 (x2 buffers), multiple
# of SUBS * 32 so B slabs never straddle a pane boundary
_PANE_ROWS = 4096
# default output panel: 1M slots = 8192 pane rows = 4 MB f32 + aux
_PANEL_SLOTS = 1 << 20


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MulPanedPanel:
    """One output-slot panel = one Pallas dispatch."""

    t1: jax.Array        # (nc, 8, 128) int32  B chain + common fields
    t2: jax.Array        # (nc, 8, 128) int32  A chain
    ab: jax.Array        # (nc,) int32 — A slab base (A pane resident)
    bb: jax.Array        # (nc,) int32 — pane-RELATIVE B slab base
                         #   (flag 0) / out-pane slab base (flag 1)
    yb: jax.Array        # (nc,) int32 — out window base (panel-relative)
    fl: jax.Array        # (nc,) int32 — 0: gather B pane, 1: y panel
    eva: jax.Array       # (ng,) int32 — pane*2+slot to DMA-start, or -1
    evb: jax.Array       # (ng,) int32 — second start slot (group 0)
    evw: jax.Array       # (ng,) int32 — buffer slot to DMA-wait, or -1
    evs: jax.Array       # (ng,) int32 — buffer slot this group reads
    slots: int = dataclasses.field(metadata=dict(static=True))
    out_rows: int = dataclasses.field(metadata=dict(static=True))
    has_aux: bool = dataclasses.field(metadata=dict(static=True))
    dist_max: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Route2MulPanedPlan:
    """Paned fused SpGEMM numeric plan (values gathered fresh from the
    A/B panes every call — reuse needs no update step, matching
    Route2MulPlan)."""

    panels: Tuple[MulPanedPanel, ...]
    g_a: int = dataclasses.field(metadata=dict(static=True))
    g_b: int = dataclasses.field(metadata=dict(static=True))
    a_rows: int = dataclasses.field(metadata=dict(static=True))
    b_rows_pad: int = dataclasses.field(metadata=dict(static=True))
    pane_rows: int = dataclasses.field(metadata=dict(static=True))
    capacity: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))

    @property
    def nchunks(self) -> int:
        return sum(int(p.t1.shape[0]) for p in self.panels)


def build_route2_mul_paned_plan(slots, src_a, src_b, a_len: int,
                                b_len: int, capacity: int,
                                panel_slots: int = _PANEL_SLOTS,
                                pane_rows: int = _PANE_ROWS
                                ) -> Route2MulPanedPlan:
    """Inspector: per-panel mul packs + B-pane-major chunk regroup.

    ``slots`` must be nondecreasing (the expansion stream from
    ops/spgemm is slot-sorted).  ``panel_slots`` adapts downward when a
    panel would exceed the per-dispatch chunk budget.
    """
    import time as _time
    from spblas_tpu.utils.profiling import record_phase
    _t0 = _time.perf_counter()
    slots = np.asarray(slots, np.int64)
    src_a = np.asarray(src_a, np.int64)
    src_b = np.asarray(src_b, np.int64)
    g_a = mul_pane_g(a_len)
    g_b = mul_pane_g(b_len)
    assert pane_rows % (SUBS * g_b) == 0, "B slabs must not straddle panes"

    last_slot = int(slots[-1]) if len(slots) else 0
    panel_slots = max(ROW_WINDOW,
                      (panel_slots // ROW_WINDOW) * ROW_WINDOW)
    host_panels = []
    total_slots_packed = 0
    s0 = 0
    while s0 <= last_slot:
        cap_p = min(panel_slots, capacity - s0)
        lo = int(np.searchsorted(slots, s0, side="left"))
        hi = int(np.searchsorted(slots, s0 + cap_p, side="left"))
        sub = _build_route2_mul_arrays(
            slots[lo:hi] - s0, src_a[lo:hi], src_b[lo:hi],
            a_len, b_len, cap_p, g_a=g_a, g_b=g_b)
        if (sub["t1"].shape[0] > _CHUNKS_PER_DISPATCH
                and cap_p > ROW_WINDOW):
            panel_slots = max(ROW_WINDOW,
                              (cap_p // 2 // ROW_WINDOW) * ROW_WINDOW)
            continue
        host_panels.append(_regroup_mul_by_pane(sub, pane_rows, cap_p))
        total_slots_packed += sub["t1"].shape[0] * SLOTS
        s0 += cap_p

    a_rows = -(-max(a_len, 1) // LANES)
    a_rows = -(-a_rows // (SUBS * g_a)) * (SUBS * g_a)
    b_rows = -(-max(b_len, 1) // LANES)
    b_rows = -(-b_rows // (SUBS * g_b)) * (SUBS * g_b)
    b_rows_pad = -(-b_rows // pane_rows) * pane_rows

    # host-pack vs upload split (VERDICT r4 #3: BENCH_r04's pack_s
    # folded the multi-GB stream-ordered upload issue into the host
    # figure — through the tunnel that is tens of seconds and must be
    # attributable separately)
    record_phase("route2_mul", "host_pack_s",
                 _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()
    from spblas_tpu.utils.placement import device_put_batch
    flat = device_put_batch(*[a for hp in host_panels
                              for a in hp["arrays"]])
    record_phase("route2_mul", "upload_issue_s",
                 _time.perf_counter() - _t0)
    panels = []
    for i, hp in enumerate(host_panels):
        (t1, t2, ab, bb, yb, fl, eva, evb, evw, evs) = \
            flat[10 * i: 10 * i + 10]
        panels.append(MulPanedPanel(
            t1=t1, t2=t2, ab=ab, bb=bb, yb=yb, fl=fl, eva=eva, evb=evb,
            evw=evw, evs=evs, slots=hp["slots"],
            out_rows=hp["out_rows"], has_aux=hp["has_aux"],
            dist_max=hp["dist_max"]))
    return Route2MulPanedPlan(
        panels=tuple(panels), g_a=g_a, g_b=g_b, a_rows=a_rows,
        b_rows_pad=b_rows_pad, pane_rows=pane_rows, capacity=capacity,
        fill=len(slots) / max(total_slots_packed, 1))


def _regroup_mul_by_pane(sub: dict, pane_rows: int, cap_p: int) -> dict:
    """Sort flag-0 chunks B-pane-major, pad every (pane, flag) run to
    CB groups, rebase B slab offsets pane-relative, and emit the
    per-group DMA event streams (mirrors route_paned._regroup_by_pane;
    the mul panel streams TWO tile planes and gathers values from the
    panes, so there is no val tile)."""
    t1, t2 = sub["t1"], sub["t2"]
    ab, bb, yb, fl = sub["ab"], sub["bb"], sub["yb"], sub["flags"]
    idx0 = np.flatnonzero(fl == 0)
    idx1 = np.flatnonzero(fl != 0)
    pane = bb[idx0] // pane_rows
    order = np.argsort(pane, kind="stable")
    idx0, pane = idx0[order], pane[order]

    used = np.unique(pane) if len(pane) else np.zeros(0, np.int64)
    slot_of = {int(p): i & 1 for i, p in enumerate(used)}
    next_of = {int(p): (int(used[i + 1]) if i + 1 < len(used) else -1)
               for i, p in enumerate(used)}

    # vectorized layout: one selection index per output chunk position
    # (-1 = zero padding), runs padded to whole CB groups (the per-chunk
    # python appends were the round-4 build hot spot at ~300k chunks)
    bounds = np.flatnonzero(np.diff(pane)) + 1 if len(pane) else []
    starts = (np.concatenate([[0], bounds]) if len(pane)
              else np.zeros(0, np.int64)).astype(np.int64)
    ends = (np.concatenate([bounds, [len(pane)]]) if len(pane)
            else np.zeros(0, np.int64)).astype(np.int64)
    cnt = ends - starts
    pad_cnt = -(-cnt // CB) * CB
    off = np.concatenate([[0], np.cumsum(pad_cnt)])
    total0 = int(off[-1])
    n1 = len(idx1)
    total1 = -(-n1 // CB) * CB if n1 else 0
    total = total0 + total1
    sel = np.full(max(total, CB), -1, np.int64)
    for r in range(len(starts)):            # one iteration PER PANE RUN
        sel[off[r]: off[r] + cnt[r]] = idx0[starts[r]: ends[r]]
    if n1:
        sel[total0: total0 + n1] = idx1
    total = len(sel)

    good = sel >= 0
    gi = np.maximum(sel, 0)
    out_t1 = np.where(good[:, None, None], t1[gi], 0).astype(np.int32)
    out_t2 = np.where(good[:, None, None], t2[gi], 0).astype(np.int32)
    out_ab = np.where(good, ab[gi], 0).astype(np.int32)
    out_yb = np.where(good, yb[gi], 0).astype(np.int32)
    # flag-0 chunks get pane-relative B slab bases; aux (flag 1) keep
    # their out-pane offsets; padding keeps its run's flag so groups
    # stay flag-homogeneous
    bb_adj = bb.astype(np.int64).copy()
    bb_adj[idx0] = bb[idx0] - pane * pane_rows
    out_bb = np.where(good, bb_adj[gi], 0).astype(np.int32)
    out_fl = np.zeros(total, np.int32)
    if n1:
        out_fl[total0:] = 1
        out_fl[np.flatnonzero(good)] = fl[sel[good]]

    # per-group event streams
    ng = total // CB
    eva = np.full(ng, -1, np.int32)
    evb = np.full(ng, -1, np.int32)
    evw = np.full(ng, -1, np.int32)
    evs = np.zeros(ng, np.int32)
    first_pane = True
    for r in range(len(starts)):
        p = int(pane[starts[r]])
        slot = slot_of[p]
        g0 = int(off[r]) // CB
        g1 = int(off[r + 1]) // CB
        evs[g0:g1] = slot
        nxt = next_of[p]
        start_next = (nxt * 2 + slot_of[nxt]) if nxt >= 0 else -1
        if first_pane:
            eva[g0] = p * 2 + slot
            evb[g0] = start_next
            first_pane = False
        else:
            eva[g0] = start_next
        evw[g0] = slot

    g_b = sub["g_b"]
    out_rows = max(sub["y_rows"] + sub["aux_rows"], SUBS * g_b)
    out_rows = -(-out_rows // (SUBS * g_b)) * (SUBS * g_b)
    return dict(
        arrays=(out_t1, out_t2, out_ab, out_bb, out_yb, out_fl,
                eva, evb, evw, evs),
        slots=cap_p, out_rows=out_rows, has_aux=n1 > 0,
        dist_max=sub["dist_max"])


# ------------------------------------------------------------------ #
# executor
# ------------------------------------------------------------------ #

def _paned_mul_kernel(ab_ref, bb_ref, yb_ref, fl_ref, eva_ref, evb_ref,
                      evw_ref, evs_ref, t1_hbm, t2_hbm, a_ref, b_hbm,
                      y_ref, t1_buf, t2_buf, b_buf, s1, s2, sb_sem, *,
                      g_a: int, g_b: int, pane_rows: int,
                      has_aux: bool, dist_max: int):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    def tv_dmas(slot, e):
        return (
            pltpu.make_async_copy(t1_hbm.at[pl.ds(e * CB, CB)],
                                  t1_buf.at[slot], s1.at[slot]),
            pltpu.make_async_copy(t2_hbm.at[pl.ds(e * CB, CB)],
                                  t2_buf.at[slot], s2.at[slot]),
        )

    @pl.when(k == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)
        for d in tv_dmas(0, 0):
            d.start()

    slot = jax.lax.rem(k, 2)

    @pl.when(k + 1 < nk)
    def _():
        for d in tv_dmas(1 - slot, k + 1):
            d.start()

    def pane_event(ev):
        @pl.when(ev >= 0)
        def _():
            pane = ev >> 1
            ps = ev & 1
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(pl.multiple_of(pane * pane_rows,
                                              pane_rows), pane_rows), :],
                b_buf.at[ps], sb_sem.at[ps]).start()

    pane_event(eva_ref[k])
    pane_event(evb_ref[k])

    wv = evw_ref[k]

    @pl.when(wv >= 0)
    def _():
        sl = jnp.maximum(wv, 0)
        pltpu.make_async_copy(b_hbm.at[pl.ds(0, pane_rows), :],
                              b_buf.at[sl], sb_sem.at[sl]).wait()

    for d in tv_dmas(slot, k):
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

    us = evs_ref[k]
    if has_aux:
        @pl.when(fl_ref[k * CB] != 0)
        def _():
            group(y_ref)

        @pl.when((fl_ref[k * CB] == 0) & (us == 0))
        def _():
            group(b_buf.at[0])

        @pl.when((fl_ref[k * CB] == 0) & (us == 1))
        def _():
            group(b_buf.at[1])
    else:
        @pl.when(us == 0)
        def _():
            group(b_buf.at[0])

        @pl.when(us == 1)
        def _():
            group(b_buf.at[1])


@no_x64
def _paned_mul_dispatch(panel: MulPanedPanel, A2, B2, *, g_a: int,
                        g_b: int, pane_rows: int, interpret: bool):
    nc = int(panel.t1.shape[0])
    nsteps = nc // CB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # t1
            pl.BlockSpec(memory_space=pl.ANY),      # t2
            pl.BlockSpec((A2.shape[0], LANES), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # A resident
            pl.BlockSpec(memory_space=pl.ANY),      # B (HBM, paned)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, pane_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_paned_mul_kernel, g_a=g_a, g_b=g_b,
                          pane_rows=pane_rows, has_aux=panel.has_aux,
                          dist_max=panel.dist_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((panel.out_rows, LANES),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nc * SUBS * LANES,
            bytes_accessed=nc * SUBS * LANES * 8
            + panel.out_rows * LANES * 4,
            transcendentals=0,
        ),
    )(panel.ab, panel.bb, panel.yb, panel.fl, panel.eva, panel.evb,
      panel.evw, panel.evs, panel.t1, panel.t2, A2, B2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def route2_mul_paned(plan: Route2MulPanedPlan, a_arr: jax.Array,
                     b_arr: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """c_values (capacity,) = slot-segment sums of A_arr[sa]*B_arr[sb],
    one Pallas dispatch per output panel, B panes streamed."""
    if interpret is None:
        interpret = not _on_tpu()
    A2 = jnp.pad(a_arr.astype(jnp.float32),
                 (0, plan.a_rows * LANES - a_arr.shape[0])
                 ).reshape(plan.a_rows, LANES)
    B2 = jnp.pad(b_arr.astype(jnp.float32),
                 (0, plan.b_rows_pad * LANES - b_arr.shape[0])
                 ).reshape(plan.b_rows_pad, LANES)
    parts = []
    covered = 0
    for panel in plan.panels:
        yp = _paned_mul_dispatch(panel, A2, B2, g_a=plan.g_a,
                                 g_b=plan.g_b,
                                 pane_rows=plan.pane_rows,
                                 interpret=interpret)
        parts.append(jax.lax.slice(yp.reshape(-1), (0,),
                                   (panel.slots,)))
        covered += panel.slots
    out = jnp.concatenate(parts) if parts else \
        jnp.zeros((0,), jnp.float32)
    if covered < plan.capacity:
        out = jnp.pad(out, (0, plan.capacity - covered))
    return out
