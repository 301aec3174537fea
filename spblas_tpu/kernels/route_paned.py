"""Paned ROUTE2: beyond-VMEM unstructured SpMV (round 3, VERDICT #3).

The ROUTE2 executor (kernels/route2_kernel.py) keeps x and y
VMEM-resident, capping it at m + n ≲ 2.5M (kernels/plans.py
``_ROUTE_VMEM_ROWS``); past that the chooser used to fall to the
SELL element-gather wall (~0.02 Gnnz/s).  This executor lifts the cap:

  * rows are split into PANELS — each panel is one Pallas dispatch
    whose y panel (plus its aux region) is VMEM-resident;
  * columns are split into PANES of the x vector — chunks are
    re-sorted pane-major inside each panel and the kernel streams
    panes HBM -> VMEM through a double buffer, one pane DMA ahead
    (the same make_async_copy machinery as the tile/value streams);
  * aux (hub-spill reduction) chunks gather from the y panel itself
    and run at the end of their panel, after every feeder.

The chunk geometry, bit layout and per-chunk body are unchanged —
panels reuse the route2 builder (`route2._build_route2_arrays`) on row
slices, so fill is identical to a hypothetical all-resident plan.

Reference capability bar: vendor CSR SpMV handles any matrix size
(include/spblas/vendor/cusparse/detail/spmv_impl.hpp:26-102).
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

from spblas_tpu.kernels.route2 import (B_DIST, B_SUBW, MAX_G,
                                       ROW_WINDOW,
                                       _build_route2_arrays,
                                       pick_window_g)
from spblas_tpu.kernels.route2_kernel import CB, _chunk_body
from spblas_tpu.kernels.route_plan import LANES, SLOTS, SUBS
from spblas_tpu.types import on_tpu as _on_tpu, no_x64

# SMEM holds the per-chunk scalar prefetch (sb/yb/fl = 12 B/chunk plus
# ~1.5 B/chunk of group events) — cap one dispatch well under the ~1 MB
# scalar memory
_CHUNKS_PER_DISPATCH = 60_000
# default x pane: 4096 sublane rows = 2 MB f32 (x2 buffers), multiple of
# SUBS * MAX_G so slabs never straddle a pane boundary
_PANE_ROWS = 4096
# default panel: y panel + aux region stays ~<= 4 MB of the ~16 MB VMEM
_PANEL_ROWS = 524_288


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PanedPanel:
    """One row panel = one Pallas dispatch."""

    tile: jax.Array       # (nc, 8, 128) int32
    val: jax.Array        # (nc, 8, 128) f32
    sb: jax.Array         # (nc,) int32 — pane-RELATIVE slab base (flag 0)
    yb: jax.Array         # (nc,) int32 — y window base (panel-relative)
    fl: jax.Array         # (nc,) int32 — 0: gather x pane, 1: y panel
    eva: jax.Array        # (ng,) int32 — pane*2+slot to DMA-start, or -1
    evb: jax.Array        # (ng,) int32 — second start slot (group 0)
    evw: jax.Array        # (ng,) int32 — buffer slot to DMA-wait, or -1
    evs: jax.Array        # (ng,) int32 — buffer slot this group reads
    rows: int = dataclasses.field(metadata=dict(static=True))
    out_rows: int = dataclasses.field(metadata=dict(static=True))
    has_aux: bool = dataclasses.field(metadata=dict(static=True))
    dist_max: int = dataclasses.field(metadata=dict(static=True))
    # values-refresh streams (rocSPARSE optimize-handle reuse contract):
    # flat positions of entry slots in val and their global CSR entry
    # index — live slots only, ~8 B/nnz vs 4 B/slot for a full val_src
    src_pos: Optional[jax.Array] = None   # (L,) int32
    src_idx: Optional[jax.Array] = None   # (L,) int32
    # any-lane publish (B_LSRC carriers, kernels/route2.py round 3)
    any_lane: bool = dataclasses.field(default=False,
                                       metadata=dict(static=True))
    # per-chunk publish rotations (round 5, kernels/route2.py): rho0 |
    # rho1 << 10 per chunk; panels on starved supercell grids pack with
    # them (the shared route2 gate decides per panel)
    rho: Optional[jax.Array] = None
    rotated: bool = dataclasses.field(default=False,
                                      metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RoutePanedPlan:
    panels: Tuple[PanedPanel, ...]
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    g: int = dataclasses.field(metadata=dict(static=True))
    pane_rows: int = dataclasses.field(metadata=dict(static=True))
    x_rows_pad: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))
    # supercell height (round 4): common across panels; panels with
    # ww > 1 pack home-lane (the sub-window shares the lsrc bits)
    row_window_mult: int = dataclasses.field(default=1,
                                             metadata=dict(static=True))

    @property
    def nchunks(self) -> int:
        return sum(int(p.tile.shape[0]) for p in self.panels)

    def update_values(self, values: jax.Array) -> "RoutePanedPlan":
        """Re-target at new CSR values, same sparsity (vendor
        optimize-handle reuse contract, mirrors
        ``Route2Plan.update_values``): one gather + scatter per panel;
        aux/padding slots keep their baked coefficients."""
        values = jnp.asarray(values)
        new_panels = []
        for p in self.panels:
            v_live = values[p.src_idx].astype(jnp.float32)
            flat = p.val.reshape(-1).at[p.src_pos].set(v_live)
            new_panels.append(dataclasses.replace(
                p, val=flat.reshape(p.val.shape)))
        return dataclasses.replace(self, panels=tuple(new_panels))


def _paned_g(m: int, n: int, nnz: int) -> int:
    """Window factor for paned plans: same ~2k-elements/cell target as
    pick_window_g but allowed up to MAX_G=32 — at beyond-VMEM sizes the
    cells are starvation-bound, so doubling the window halves the chunk
    count (and the plan's device footprint) for ~equal chunk cost."""
    want = max(1, (2 * m * n) // (max(nnz, 1) * SLOTS) + 1)
    g = 1
    while g < want and g < MAX_G:
        g *= 2
    return g


def estimate_paned_bytes(m: int, n: int, nnz: int,
                         g: Optional[int] = None) -> int:
    """Plan-stream size estimate (tile+val = 8 KB/chunk) for the
    chooser's memory/upload budget — chunks ~= occupied cells plus the
    element mass."""
    if g is None:
        g = _paned_g(m, n, nnz)
    stripes = -(-m // ROW_WINDOW)
    windows = -(-n // (g * SLOTS))
    cells = stripes * windows
    # occupied-cell count for nnz balls in `cells` bins
    occ = cells * (1.0 - np.exp(-nnz / max(cells, 1)))
    est_chunks = occ + nnz / SLOTS
    return int(est_chunks * SLOTS * 8)


def build_route_paned_plan(rowptr, colind, values, shape: Tuple[int, int],
                           nnz: int, g: Optional[int] = None,
                           panel_rows: int = _PANEL_ROWS,
                           pane_rows: int = _PANE_ROWS,
                           row_window_mult: Optional[int] = None
                           ) -> RoutePanedPlan:
    """Inspector: per-panel route2 builds + pane-major chunk regroup.

    ``panel_rows`` adapts downward when a panel would exceed the
    per-dispatch chunk budget (SMEM scalar prefetch).
    """
    m, n = shape
    rowptr = np.asarray(rowptr).astype(np.int64)
    colind = np.asarray(colind).astype(np.int64)[:nnz]
    values = np.asarray(values)[:nnz]
    if g is None:
        g = _paned_g(m, n, nnz)
    assert pane_rows % (SUBS * g) == 0, "panes must hold whole slabs"

    # supercell height (round 4): same gate as the resident builder —
    # beyond-VMEM sizes are starvation-bound, so the 8x-taller cells
    # cut both chunk count AND the 8/fill-B-per-nnz plan footprint
    # (VERDICT r3 weak #3)
    window = g * SLOTS
    e_cell = nnz * window * ROW_WINDOW / max(m * n, 1)
    ww = row_window_mult
    if ww is None:
        from spblas_tpu.kernels.route2 import pick_row_window_mult
        ww = pick_row_window_mult(e_cell, max_rows=panel_rows)
    row_window = ROW_WINDOW * ww

    panel_rows = max(row_window,
                     (panel_rows // row_window) * row_window)
    host_panels = []
    x_rows = None
    total_slots = 0
    r0 = 0
    while r0 < m:
        rows_p = min(panel_rows, m - r0)
        sub = _panel_arrays(rowptr, colind, values, r0, rows_p, n, g,
                            ww=ww)
        if (sub["tiles"].shape[0] > _CHUNKS_PER_DISPATCH
                and rows_p > row_window):
            # too many chunks for one dispatch: halve this panel
            panel_rows = max(row_window,
                             (rows_p // 2 // row_window) * row_window)
            continue
        host_panels.append(
            _regroup_by_pane(sub, pane_rows, rows_p))
        x_rows = sub["x_rows"]
        total_slots += sub["tiles"].shape[0] * SLOTS
        r0 += rows_p

    x_rows_pad = -(-x_rows // pane_rows) * pane_rows
    # one batched placement for every panel's arrays (a compact
    # live-slots-only upload + device scatter-expand measured SLOWER
    # than the plain batched upload — benchmarks/dev/
    # tpu_compact_upload_ab.py, PERF_NOTES round 3)
    from spblas_tpu.utils.placement import device_put_batch
    flat = device_put_batch(*[a for hp in host_panels
                              for a in hp["arrays"]])
    panels = []
    for i, hp in enumerate(host_panels):
        (t, v, sb, yb, fl, eva, evb, evw, evs,
         pos, idx, rho) = flat[12 * i: 12 * i + 12]
        panels.append(PanedPanel(
            tile=t, val=v, sb=sb, yb=yb, fl=fl, eva=eva, evb=evb,
            evw=evw, evs=evs, rows=hp["rows"], out_rows=hp["out_rows"],
            has_aux=hp["has_aux"], dist_max=hp["dist_max"],
            src_pos=pos, src_idx=idx, any_lane=hp["any_lane"],
            rho=rho, rotated=hp["rotated"]))
    return RoutePanedPlan(
        panels=tuple(panels), shape=(m, n), g=g, pane_rows=pane_rows,
        x_rows_pad=x_rows_pad,
        fill=float(nnz) / max(total_slots, 1), row_window_mult=ww)


def _panel_arrays(rowptr, colind, values, r0, rows_p, n, g, ww=1):
    e0 = int(min(rowptr[r0], len(colind)))
    e1 = int(min(rowptr[r0 + rows_p], len(colind)))
    sub_rp = rowptr[r0:r0 + rows_p + 1] - rowptr[r0]
    sub = _build_route2_arrays(sub_rp, colind[e0:e1], values[e0:e1],
                               (rows_p, n), e1 - e0, g=g,
                               row_window_mult=ww,
                               any_lane=False if ww > 1 else None,
                               hub_deg=0, rotate=None)
    sub["e0"] = e0
    return sub


def _regroup_by_pane(sub: dict, pane_rows: int, rows_p: int) -> dict:
    """Sort flag-0 chunks pane-major, pad every (pane, flag) run to CB
    groups, rebase slab offsets pane-relative, and emit the per-group
    DMA event streams.

    Vectorized (round 4): the per-chunk python append loop + np.stack
    was ~5 s of the m=4M build.  The final chunk order is expressed as
    one gather index array (``-1`` = pad chunk) driving a threaded
    native tile gather; the values-refresh streams come from the
    source chunks' nonneg entries mapped through the same order, so
    the src tiles are never materialized per output chunk."""
    tiles, vals, srcs = sub["tiles"], sub["vals"], sub["srcs"]
    sb, yb, fl = sub["sb"], sub["yb"], sub["flags"]
    rho_in = sub["rho"]
    idx0 = np.flatnonzero(fl == 0)
    idx1 = np.flatnonzero(fl != 0)
    pane = sb[idx0] // pane_rows
    order = np.argsort(pane, kind="stable")
    idx0, pane = idx0[order], pane[order]

    used = np.unique(pane) if len(pane) else np.zeros(0, np.int64)
    slot_of = {int(p): i & 1 for i, p in enumerate(used)}
    next_of = {int(p): (int(used[i + 1]) if i + 1 < len(used) else -1)
               for i, p in enumerate(used)}

    # gather segments: per pane run [chunk indices..., pads], aux run,
    # final pad.  gidx -1 = zero pad chunk.
    seg_idx, seg_sb, seg_yb = [], [], []
    eva, evb, evw, evs = [], [], [], []
    bounds = np.flatnonzero(np.diff(pane)) + 1 if len(pane) else []
    starts = np.concatenate([[0], bounds]) if len(pane) else []
    ends = np.concatenate([bounds, [len(pane)]]) if len(pane) else []
    first_pane = True
    ntot = 0
    for s0, s1 in zip(starts, ends):
        p = int(pane[s0])
        slot = slot_of[p]
        first_g = ntot // CB           # CB-aligned after prior padding
        run = idx0[s0:s1]
        seg_idx.append(run.astype(np.int32))
        seg_sb.append((sb[run] - p * pane_rows).astype(np.int32))
        seg_yb.append(yb[run].astype(np.int32))
        pad = (-len(run)) % CB
        if pad:
            seg_idx.append(np.full(pad, -1, np.int32))
            seg_sb.append(np.zeros(pad, np.int32))
            seg_yb.append(np.zeros(pad, np.int32))
        ntot += len(run) + pad
        while len(eva) < ntot // CB:
            eva.append(-1); evb.append(-1); evw.append(-1)
            evs.append(slot)
        # events on the FIRST group of this pane's run: wait this
        # pane's DMA and start the next pane's into the other slot;
        # the very first group additionally warm-starts THIS pane
        nxt = next_of[p]
        start_next = (nxt * 2 + slot_of[nxt]) if nxt >= 0 else -1
        if first_pane:
            eva[first_g] = p * 2 + slot
            evb[first_g] = start_next
            first_pane = False
        else:
            eva[first_g] = start_next
            evb[first_g] = -1
        evw[first_g] = slot

    # aux chunks at the end (they read the y panel, no pane events)
    n_flag0 = ntot
    if len(idx1):
        seg_idx.append(idx1.astype(np.int32))
        seg_sb.append(sb[idx1].astype(np.int32))
        seg_yb.append(yb[idx1].astype(np.int32))
        ntot += len(idx1)
    pad = (-ntot) % CB
    if pad:
        seg_idx.append(np.full(pad, -1, np.int32))
        seg_sb.append(np.zeros(pad, np.int32))
        seg_yb.append(np.zeros(pad, np.int32))
        ntot += pad
    while len(eva) < ntot // CB:
        eva.append(-1); evb.append(-1); evw.append(-1); evs.append(0)

    if ntot == 0:                      # empty panel: one zero group
        seg_idx.append(np.full(CB, -1, np.int32))
        seg_sb.append(np.zeros(CB, np.int32))
        seg_yb.append(np.zeros(CB, np.int32))
        ntot = CB
        eva.append(-1); evb.append(-1); evw.append(-1); evs.append(0)

    gidx = np.concatenate(seg_idx)
    out_sb = np.concatenate(seg_sb)
    out_yb = np.concatenate(seg_yb)
    out_fl = np.zeros(ntot, np.int32)
    if len(idx1):
        out_fl[n_flag0:] = 1
    if n_flag0 == 0 and ntot:
        # an all-empty panel's pad group must read the ZERO-initialized
        # y panel, not the never-DMA'd x scratch: stale VMEM bits that
        # decode as NaN would survive the vA=0 mask as 0*NaN = NaN
        # (round-4 review)
        out_fl[:] = 1
    out_t = _gather_tiles_pad(tiles, gidx,
                              np.zeros((SUBS, LANES), np.int32))
    out_v = _gather_tiles_pad(vals, gidx,
                              np.zeros((SUBS, LANES), np.float32))

    out_rows = max(sub["y_rows"] + sub["aux_rows"], SUBS * sub["g"])
    out_rows = -(-out_rows // (SUBS * sub["g"])) * (SUBS * sub["g"])
    # values-refresh streams: entry slots' flat position + global CSR
    # entry index (panel srcs are panel-local; offset by e0).  Mapped
    # per source chunk: output slot i with gidx[i] = c contributes
    # c's nonneg src entries at flat positions i*1024 + offset.
    nc = tiles.shape[0]
    src_flat = srcs.reshape(nc, SLOTS)
    sp = np.flatnonzero(src_flat.reshape(-1) >= 0)
    sp_ent = src_flat.reshape(-1)[sp]
    sp_off = (sp % SLOTS).astype(np.int64)
    cnt = np.zeros(nc + 1, np.int64)
    np.add.at(cnt, (sp // SLOTS) + 1, 1)
    cstart = np.cumsum(cnt)
    live = gidx >= 0
    out_cnt = np.where(live, cstart[np.maximum(gidx, 0) + 1]
                       - cstart[np.maximum(gidx, 0)], 0)
    total = int(out_cnt.sum())
    out_slot = np.repeat(np.arange(ntot, dtype=np.int64), out_cnt)
    base = np.concatenate([[0], np.cumsum(out_cnt)])[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(base, out_cnt)
    src_off = cstart[np.maximum(gidx, 0)][out_slot] + within
    pos = (out_slot * SLOTS + sp_off[src_off]).astype(np.int32)
    idx = (sp_ent[src_off] + sub["e0"]).astype(np.int32)
    out_rho = np.where(gidx >= 0, rho_in[np.maximum(gidx, 0)],
                       0).astype(np.int32)
    return dict(
        arrays=(out_t, out_v, out_sb, out_yb, out_fl,
                np.array(eva, np.int32), np.array(evb, np.int32),
                np.array(evw, np.int32), np.array(evs, np.int32),
                pos, idx, out_rho),
        # has_aux also covers the all-empty panel whose pad group was
        # re-flagged to read the y panel (the kernel only dispatches on
        # flags when has_aux is set)
        rows=rows_p, out_rows=out_rows,
        has_aux=len(idx1) > 0 or n_flag0 == 0,
        dist_max=sub["dist_max"], any_lane=sub["any_lane"],
        rotated=sub["rotated"])


def _gather_tiles_pad(src: np.ndarray, gidx: np.ndarray,
                      fill_tile: np.ndarray) -> np.ndarray:
    """``src[gidx]`` with ``gidx < 0`` producing ``fill_tile`` — native
    threaded when available."""
    from spblas_tpu import native
    out = native.gather_tiles_fill(gidx, src, fill_tile)
    if out is not None:
        return out
    out = src[np.maximum(gidx, 0)]
    out[gidx < 0] = fill_tile
    return out


# ------------------------------------------------------------------ #
# executor
# ------------------------------------------------------------------ #

def _paned_kernel(sb_ref, yb_ref, fl_ref, eva_ref, evb_ref, evw_ref,
                  evs_ref, rho_ref, t_hbm, v_hbm, x_hbm, y_ref, t_buf,
                  v_buf, x_buf, t_sem, v_sem, x_sem, *, g: int,
                  pane_rows: int,
                  has_aux: bool, dist_max: int, any_lane: bool,
                  ww: int = 1, rotated: bool = False):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    def tv_dmas(slot, e):
        return (
            pltpu.make_async_copy(t_hbm.at[pl.ds(e * CB, CB)],
                                  t_buf.at[slot], t_sem.at[slot]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(e * CB, CB)],
                                  v_buf.at[slot], v_sem.at[slot]),
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
                x_hbm.at[pl.ds(pl.multiple_of(pane * pane_rows,
                                              pane_rows), pane_rows), :],
                x_buf.at[ps], x_sem.at[ps]).start()

    pane_event(eva_ref[k])
    pane_event(evb_ref[k])

    wv = evw_ref[k]

    @pl.when(wv >= 0)
    def _():
        sl = jnp.maximum(wv, 0)
        pltpu.make_async_copy(x_hbm.at[pl.ds(0, pane_rows), :],
                              x_buf.at[sl], x_sem.at[sl]).wait()

    for d in tv_dmas(slot, k):
        d.wait()

    def group(src_ref):
        for i in range(CB):
            ci = k * CB + i
            t = t_buf[slot, i]
            slab = src_ref[pl.ds(sb_ref[ci], SUBS * g), :]
            upd = _chunk_body(t, v_buf[slot, i], slab, g,
                              dist_max, any_lane)
            yb = yb_ref[ci]
            if rotated:
                # per-chunk sublane publish rotations (round 5) —
                # mirrors route2_kernel's rotated publish
                from spblas_tpu.kernels.route2_kernel import _unrotate
                from spblas_tpu.kernels.route2 import B_SEL
                rho = rho_ref[ci]
                r0 = (rho >> 7) & 7
                r1 = (rho >> 17) & 7
                sel = (t >> B_SEL) & 1
                u0 = _unrotate(jnp.where(sel == 0, upd, 0.0), r0)
                u1 = _unrotate(jnp.where(sel == 1, upd, 0.0), r1)
                if ww == 1:
                    y_ref[pl.ds(yb, SUBS), :] = \
                        y_ref[pl.ds(yb, SUBS), :] + (u0 + u1)
                else:
                    s0 = (_unrotate(jnp.where(sel == 0, t, 0), r0)
                          >> B_SUBW) & 7
                    s1 = (_unrotate(jnp.where(sel == 1, t, 0), r1)
                          >> B_SUBW) & 7
                    wide = jnp.concatenate(
                        [jnp.where(s0 == sw, u0, 0.0)
                         + jnp.where(s1 == sw, u1, 0.0)
                         for sw in range(ww)], axis=0)
                    y_ref[pl.ds(yb, ww * SUBS), :] = \
                        y_ref[pl.ds(yb, ww * SUBS), :] + wide
            elif ww == 1:
                y_ref[pl.ds(yb, SUBS), :] = \
                    y_ref[pl.ds(yb, SUBS), :] + upd
            else:
                # supercell publish (round 4): select-ladder into one
                # (8ww,128) RMW — same as route2_kernel
                subw = (t >> B_SUBW) & 7
                wide = jnp.concatenate(
                    [jnp.where(subw == sw, upd, 0.0)
                     for sw in range(ww)], axis=0)
                y_ref[pl.ds(yb, ww * SUBS), :] = \
                    y_ref[pl.ds(yb, ww * SUBS), :] + wide

    us = evs_ref[k]
    if has_aux:
        @pl.when(fl_ref[k * CB] != 0)
        def _():
            group(y_ref)

        @pl.when((fl_ref[k * CB] == 0) & (us == 0))
        def _():
            group(x_buf.at[0])

        @pl.when((fl_ref[k * CB] == 0) & (us == 1))
        def _():
            group(x_buf.at[1])
    else:
        @pl.when(us == 0)
        def _():
            group(x_buf.at[0])

        @pl.when(us == 1)
        def _():
            group(x_buf.at[1])


@no_x64
def _paned_dispatch(panel: PanedPanel, x2, *, g: int, pane_rows: int,
                    interpret: bool, ww: int = 1):
    nc = int(panel.tile.shape[0])
    nsteps = nc // CB
    rho = panel.rho
    if rho is None:
        rho = jnp.zeros((nc,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # tile
            pl.BlockSpec(memory_space=pl.ANY),      # val
            pl.BlockSpec(memory_space=pl.ANY),      # x2 (HBM, paned)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.float32),
            pltpu.VMEM((2, pane_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_paned_kernel, g=g, pane_rows=pane_rows,
                          has_aux=panel.has_aux,
                          dist_max=panel.dist_max,
                          any_lane=panel.any_lane, ww=ww,
                          rotated=panel.rotated),
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
    )(panel.sb, panel.yb, panel.fl, panel.eva, panel.evb, panel.evw,
      panel.evs, rho, panel.tile, panel.val, x2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def route_paned_spmv(plan: RoutePanedPlan, x: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """y = A @ x, one Pallas dispatch per row panel, x panes streamed."""
    if interpret is None:
        interpret = not _on_tpu()
    m, n = plan.shape
    xdt = x.dtype
    xf = x.astype(jnp.float32)
    x2 = jnp.pad(xf, (0, plan.x_rows_pad * LANES - n)).reshape(
        plan.x_rows_pad, LANES)
    parts = []
    for panel in plan.panels:
        yp = _paned_dispatch(panel, x2, g=plan.g,
                             pane_rows=plan.pane_rows,
                             interpret=interpret,
                             ww=plan.row_window_mult)
        parts.append(jax.lax.slice(yp.reshape(-1), (0,), (panel.rows,)))
    return jnp.concatenate(parts).astype(xdt)
