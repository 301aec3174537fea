"""ROUTE-mul plan: fused gather-gather-multiply-reduce for SpGEMM numeric.

The rocSPARSE reuse contract (vendor/rocsparse/multiply_spgemm.hpp:178-214)
is that the numeric re-run with unchanged sparsity is *fast*.  Round 1's
numeric phase was XLA gather + scatter-add (~0.13 G elem/s on v5e); this
plan runs the whole expansion stream

    c_values[slot] += A_arr[src_a] * B_arr[src_b]

through one Pallas dispatch using the ROUTE chunk machinery
(kernels/route_plan.py): (8,128) chunks, two in-register gathers, a
3-phase permutation to slot-segment layout, in-column prefix-difference
reduction, and a second permutation into the VMEM-resident output.

Gather roles (both sources VMEM-resident as (rows,128) panes):
  src_b   scattered (B rows jump around): *elementwise* gather — the
          element's tile sublane equals (src_b slab sublane & 7), lane
          and octant are free per element.
  src_a   clustered (A entries repeat over consecutive slots):
          column-constant 2-step gather — each lane-column is dedicated
          to one (lane, octant) of the A slab, the per-element 3-bit
          s7_a picks the slab sublane.

Packed metadata (3 int32 tiles = 12 B/slot; no value tile — values come
from the gathers):

  tile1: l_b(7) | oct_b(3) | q1(3) | q2(7) | q3(3)
  tile2: l_a(7) | oct_a(3) | s7_a(3)
  tile3: dist(3) | vA(1) | p1(3) | p2(7) | p3(3)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from spblas_tpu.kernels.route_plan import (LANES, SLOTS, SUBS,
                                           _route_permutation)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RouteMulPlan:
    tile1: jax.Array        # (nchunks, 8, 128) int32
    tile2: jax.Array        # (nchunks, 8, 128) int32
    tile3: jax.Array        # (nchunks, 8, 128) int32
    a_base: jax.Array       # (nchunks,) int32  A slab offset (sublanes)
    b_base: jax.Array       # (nchunks,) int32  B slab offset (sublanes)
    o_base: jax.Array       # (nchunks,) int32  out window offset
    g_a: int = dataclasses.field(metadata=dict(static=True))
    g_b: int = dataclasses.field(metadata=dict(static=True))
    a_rows: int = dataclasses.field(metadata=dict(static=True))
    b_rows: int = dataclasses.field(metadata=dict(static=True))
    out_rows: int = dataclasses.field(metadata=dict(static=True))
    capacity: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))

    @property
    def nchunks(self) -> int:
        return int(self.tile1.shape[0])


def _pick_g(n: int, max_g: int = 8) -> int:
    # v1 semantics: any integer g (see route_plan._pick_g's note on
    # why this must NOT be unified with route2's power-of-two search)
    for g in range(1, max_g + 1):
        if g * SLOTS >= n:
            return g
    return max_g


def build_route_mul_plan(slots, src_a, src_b, a_len: int, b_len: int,
                         capacity: int) -> RouteMulPlan:
    """Build from the (slot-sorted, valid-only) expansion stream.

    slots monotone non-decreasing; duplicates of a slot are the entries
    that sum into it.  a_len/b_len size the resident source panes.
    """
    slots = np.asarray(slots, np.int64)
    src_a = np.asarray(src_a, np.int64)
    src_b = np.asarray(src_b, np.int64)
    g_a = _pick_g(a_len)
    g_b = _pick_g(b_len)
    win_a = g_a * SLOTS
    win_b = g_b * SLOTS

    # cells: (1024-slot window) x (src_b window) x (src_a window), in
    # slot order within each cell
    key = ((slots // SLOTS) * ((b_len // win_b) + 2)
           + src_b // win_b) * ((a_len // win_a) + 2) + src_a // win_a
    order = np.lexsort((slots, key))
    slots, src_a, src_b = slots[order], src_a[order], src_b[order]
    kys = key[order]

    out = _MulAccum()
    if len(slots):
        bounds = np.flatnonzero(np.diff(kys)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(slots)]])
        if not _pack_all_mul_native(slots, src_a, src_b, starts,
                                    win_a, win_b, out):
            for a, b in zip(starts, ends):
                _emit_mul_cell(slots[a:b], src_a[a:b], src_b[a:b],
                               win_a, win_b, g_a, g_b, out)
    if not out.t1:
        out.append_empty()

    a_rows = (a_len + LANES - 1) // LANES + SUBS * g_a
    b_rows = (b_len + LANES - 1) // LANES + SUBS * g_b
    out_rows = (capacity + LANES - 1) // LANES + SUBS
    fill = len(slots) / max(len(out.t1) * SLOTS, 1)
    return RouteMulPlan(
        tile1=jnp.asarray(np.stack(out.t1)),
        tile2=jnp.asarray(np.stack(out.t2)),
        tile3=jnp.asarray(np.stack(out.t3)),
        a_base=jnp.asarray(np.array(out.ab, np.int32)),
        b_base=jnp.asarray(np.array(out.bb, np.int32)),
        o_base=jnp.asarray(np.array(out.ob, np.int32)),
        g_a=g_a, g_b=g_b, a_rows=a_rows, b_rows=b_rows,
        out_rows=out_rows, capacity=capacity, fill=float(fill))


def _pack_all_mul_native(slots, src_a, src_b, starts, win_a, win_b,
                         out: "_MulAccum") -> bool:
    """Pack the whole stream with the native C++ packer; fills `out` and
    returns True, or returns False when the library is unavailable (the
    caller then runs the per-cell python packer)."""
    from spblas_tpu import native

    ne = len(slots)
    ncells = len(starts)
    cell_start = np.concatenate([starts, [ne]]).astype(np.int64)
    lo = (slots % SLOTS).astype(np.int32)
    la = (src_a % win_a).astype(np.int32)
    lb = (src_b % win_b).astype(np.int32)
    nat = native.route_mul_pack(ne, ncells, cell_start, lo, la, lb)
    if nat is None:
        return False
    nch, t1, t2, t3, chunk_cell = nat
    cell_ab = ((src_a[starts] // win_a)
               * (win_a // LANES)).astype(np.int64)
    cell_bb = ((src_b[starts] // win_b)
               * (win_b // LANES)).astype(np.int64)
    cell_ob = ((slots[starts] // SLOTS)
               * (SLOTS // LANES)).astype(np.int64)
    out.t1.extend(t1)
    out.t2.extend(t2)
    out.t3.extend(t3)
    out.ab.extend(cell_ab[chunk_cell].tolist())
    out.bb.extend(cell_bb[chunk_cell].tolist())
    out.ob.extend(cell_ob[chunk_cell].tolist())
    return True


class _MulAccum:
    def __init__(self):
        self.t1, self.t2, self.t3 = [], [], []
        self.ab, self.bb, self.ob = [], [], []

    def append_empty(self):
        self.t1.append(np.zeros((SUBS, LANES), np.int32))
        self.t2.append(np.zeros((SUBS, LANES), np.int32))
        self.t3.append(np.zeros((SUBS, LANES), np.int32))
        self.ab.append(0)
        self.bb.append(0)
        self.ob.append(0)


def _emit_mul_cell(slots, src_a, src_b, win_a, win_b, g_a, g_b,
                   out: _MulAccum):
    n = len(slots)
    a_base = int((src_a[0] // win_a) * (win_a // LANES))
    b_base = int((src_b[0] // win_b) * (win_b // LANES))
    o_base = int((slots[0] // SLOTS) * (SLOTS // LANES))
    la = src_a - (src_a[0] // win_a) * win_a
    lb = src_b - (src_b[0] // win_b) * win_b
    lo_slot = slots - (slots[0] // SLOTS) * SLOTS

    # segments: runs of one slot, <=8 entries
    chg = np.empty(n, bool)
    chg[0] = True
    chg[1:] = lo_slot[1:] != lo_slot[:-1]
    pos = np.arange(n) - np.maximum.accumulate(
        np.where(chg, np.arange(n), 0))
    new_seg = chg | (pos % SUBS == 0)
    seg_id = np.cumsum(new_seg) - 1
    seg_start = np.flatnonzero(new_seg)
    nseg = len(seg_start)
    seg_end = np.concatenate([seg_start[1:], [n]])
    seg_len = seg_end - seg_start
    seg_slot = lo_slot[seg_start]

    remaining = list(range(nseg))
    while remaining:
        lane_fill = np.zeros(LANES, np.int64)      # scatter stacks
        slots_used = set()
        # gather layout state: per lane-column, its (l_a, oct_a) key and
        # an 8-bit sublane occupancy mask (sublane = s7_b)
        col_key = {}
        col_occ = np.zeros(LANES, np.int64)
        cols_of_key = {}
        next_col = 0
        chosen, place_lane, place_off = [], [], []
        placements = {}
        leftover = []
        for s_ in remaining:
            sl = int(seg_len[s_])
            if int(seg_slot[s_]) in slots_used:
                leftover.append(s_)
                continue
            # tentative gather placement for every entry of the segment
            ent = range(seg_start[s_], seg_end[s_])
            occ2 = col_occ.copy()
            nc2 = next_col
            newcols = {}
            good = True
            epos = []
            for e in ent:
                keyg = (int(la[e]) % LANES, (int(la[e]) // LANES) // SUBS)
                sub = (int(lb[e]) // LANES) % SUBS
                cand = cols_of_key.get(keyg, []) + newcols.get(keyg, [])
                col = -1
                for cc in cand:
                    if not (occ2[cc] >> sub) & 1:
                        col = cc
                        break
                if col < 0:
                    if nc2 >= LANES:
                        good = False
                        break
                    col = nc2
                    nc2 += 1
                    newcols.setdefault(keyg, []).append(col)
                occ2[col] |= 1 << sub
                epos.append((e, sub, col))
            if not good:
                leftover.append(s_)
                continue
            fit = np.flatnonzero(lane_fill + sl <= SUBS)
            if not len(fit):
                leftover.append(s_)
                continue
            lane = int(fit[0])
            place_lane.append(lane)
            place_off.append(int(lane_fill[lane]))
            lane_fill[lane] += sl
            col_occ = occ2
            next_col = nc2
            for keyg, cl in newcols.items():
                cols_of_key.setdefault(keyg, []).extend(cl)
            for e, sub, col in epos:
                placements[e] = (sub, col)
            slots_used.add(int(seg_slot[s_]))
            chosen.append(s_)
        assert chosen, "mul chunk packing made no progress"
        _emit_mul_chunk(lo_slot, la, lb, seg_start, seg_end, seg_slot,
                        chosen, place_lane, place_off, placements, g_a,
                        g_b, out)
        out.ab.append(a_base)
        out.bb.append(b_base)
        out.ob.append(o_base)
        remaining = leftover


def _emit_mul_chunk(lo_slot, la, lb, seg_start, seg_end, seg_slot,
                    chosen, place_lane, place_off, placements, g_a, g_b,
                    out: _MulAccum):
    t1 = np.zeros((SUBS, LANES), np.int64)
    t2 = np.zeros((SUBS, LANES), np.int64)
    t3 = np.zeros((SUBS, LANES), np.int64)

    gat_pos, scat_pos = [], []
    col_la = np.zeros(LANES, np.int64)     # column-constant l_a
    col_oa = np.zeros(LANES, np.int64)     # column-constant oct_a
    for ci, s_ in enumerate(chosen):
        off = place_off[ci]
        lane = place_lane[ci]
        for k, e in enumerate(range(seg_start[s_], seg_end[s_])):
            sub, col = placements[e]
            gat_pos.append(sub * LANES + col)
            scat_pos.append((off + k) * LANES + lane)
            t1[sub, col] |= (int(lb[e]) % LANES) | \
                (((int(lb[e]) // LANES) // SUBS) << 7)
            t2[sub, col] = ((int(la[e]) % LANES)
                            | (((int(la[e]) // LANES) // SUBS) << 7)
                            | (((int(la[e]) // LANES) % SUBS) << 10))
            col_la[col] = int(la[e]) % LANES
            col_oa[col] = (int(la[e]) // LANES) // SUBS
    # broadcast the column-constant A fields down pad sublanes (the
    # 2-step gather reads l_a/oct_a at sublane s7_a, which may be a pad)
    base = col_la | (col_oa << 7)
    empty = t2 == 0
    t2[empty] = np.broadcast_to(base[None, :], (SUBS, LANES))[empty]

    gat_pos = np.array(gat_pos, np.int64)
    scat_pos = np.array(scat_pos, np.int64)
    allpos = np.arange(SLOTS)
    in_g = np.zeros(SLOTS, bool)
    in_g[gat_pos] = True
    in_s = np.zeros(SLOTS, bool)
    in_s[scat_pos] = True
    q1, q2, q3 = _route_permutation(
        np.concatenate([gat_pos, allpos[~in_g]]),
        np.concatenate([scat_pos, allpos[~in_s]]))
    t1 |= (q1.astype(np.int64) << 13) | (q2.astype(np.int64) << 16) \
        | (q3.astype(np.int64) << 23)

    nseg = len(chosen)
    seg_sizes = np.array([seg_end[s_] - seg_start[s_] for s_ in chosen],
                         np.int64)
    sl_arr = np.array(place_lane, np.int64)
    so_arr = np.array(place_off, np.int64)
    last_sub = so_arr + seg_sizes - 1
    # dist = within-segment position at every scatter slot
    dfield = np.zeros((SUBS, LANES), np.int64)
    su, sl2 = scat_pos // LANES, scat_pos % LANES
    within = np.concatenate(
        [np.arange(seg_end[s_] - seg_start[s_]) for s_ in chosen])
    dfield[su, sl2] = within

    tgt = np.array([seg_slot[s_] for s_ in chosen], np.int64)
    src2 = last_sub * LANES + sl_arr
    dst2 = tgt    # the permute-2 target IS the output slot index
    in_s2 = np.zeros(SLOTS, bool)
    in_s2[src2] = True
    in_d2 = np.zeros(SLOTS, bool)
    in_d2[dst2] = True
    p1, p2, p3 = _route_permutation(
        np.concatenate([src2, allpos[~in_s2]]),
        np.concatenate([dst2, allpos[~in_d2]]))
    vA = np.zeros((SUBS, LANES), np.int64)
    vA[dst2 // LANES, dst2 % LANES] = 1
    t3[:] = (dfield | (vA << 3) | (p1.astype(np.int64) << 4)
             | (p2.astype(np.int64) << 7) | (p3.astype(np.int64) << 14))

    out.t1.append(t1.astype(np.int32))
    out.t2.append(t2.astype(np.int32))
    out.t3.append(t3.astype(np.int32))


# ------------------------------------------------------------------ #
# numpy simulator
# ------------------------------------------------------------------ #

def _pack_pane(v: np.ndarray, rows: int) -> np.ndarray:
    p = np.zeros((rows, LANES), np.float32)
    p.reshape(-1)[: len(v)] = v
    return p


def route_mul_numpy(plan: RouteMulPlan, a_arr: np.ndarray,
                    b_arr: np.ndarray) -> np.ndarray:
    """Exact numpy mirror of the route_mul kernel."""
    A = _pack_pane(np.asarray(a_arr, np.float32), plan.a_rows)
    B = _pack_pane(np.asarray(b_arr, np.float32), plan.b_rows)
    O = np.zeros((plan.out_rows, LANES), np.float32)
    t1 = np.asarray(plan.tile1)
    t2 = np.asarray(plan.tile2)
    t3 = np.asarray(plan.tile3)
    ab = np.asarray(plan.a_base)
    bb = np.asarray(plan.b_base)
    ob = np.asarray(plan.o_base)
    jj = np.broadcast_to(np.arange(LANES)[None, :], (SUBS, LANES))
    ii = np.broadcast_to(np.arange(SUBS)[:, None], (SUBS, LANES))

    for k in range(plan.nchunks):
        a = t1[k]
        b2 = t2[k]
        b = t3[k]
        # B gather (elementwise; sublane = s7_b)
        l_b = a & 127
        o_b = (a >> 7) & 7
        slabB = B[bb[k]:bb[k] + SUBS * plan.g_b]
        vb = np.zeros((SUBS, LANES), np.float32)
        for gg in range(plan.g_b):
            ug = slabB[gg * SUBS:(gg + 1) * SUBS][ii, l_b]
            vb = np.where(o_b == gg, ug, vb)
        # A gather (column-constant 2-step)
        l_a = b2 & 127
        o_a = (b2 >> 7) & 7
        s7a = (b2 >> 10) & 7
        slabA = A[ab[k]:ab[k] + SUBS * plan.g_a]
        ua = np.zeros((SUBS, LANES), np.float32)
        for gg in range(plan.g_a):
            ug = slabA[gg * SUBS:(gg + 1) * SUBS][ii, l_a]
            ua = np.where(o_a == gg, ug, ua)
        va = ua[s7a, jj]
        c = va * vb
        # permute1 / prefix / diff / permute2 — identical to SpMV
        q1 = (a >> 13) & 7
        q2 = (a >> 16) & 127
        q3 = (a >> 23) & 7
        c = c[q1, jj]
        c = c[ii, q2]
        c = c[q3, jj]
        dist = b & 7
        P = c.copy()
        for d in (1, 2, 4):
            sh = np.roll(P, d, axis=0)
            sh[:d] = 0
            P = P + np.where(dist >= d, sh, 0.0)
        vA = (b >> 3) & 1
        p1 = (b >> 4) & 7
        p2 = (b >> 7) & 127
        p3 = (b >> 14) & 7
        RS = P
        RS = RS[p1, jj]
        RS = RS[ii, p2]
        RS = RS[p3, jj]
        O[ob[k]:ob[k] + SUBS] += RS * vA
    return O.reshape(-1)[: plan.capacity]
