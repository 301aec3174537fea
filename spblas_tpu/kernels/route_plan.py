"""ROUTE plan: chunked gather/permute/reduce layout for *unstructured* CSR.

This is the TPU answer to the reference's general CSR SpMV vendor kernels
(include/spblas/vendor/cusparse/detail/spmv_impl.hpp:26-102,
vendor/onemkl_sycl/detail/spmv_impl.hpp:38-120): a matrix with no band /
block structure still runs orders of magnitude above the XLA gather floor.

Design (round 2, from measured v5e facts in PERF_NOTES.md):

* In-kernel ``jnp.take_along_axis`` is a ~5 ns/(8,128)-tile hardware
  gather (lane axis; sublane axis for 8-deep tables).  XLA-level gathers
  remain ~0.13 G elem/s — all indexed traffic must happen inside one
  Pallas kernel.
* The matrix is cut into cells = (1024-row stripe) x (G*1024-col window).
  Each cell's nonzeros pack into (8,128) *chunks* carrying three layouts,
  connected by plan-precomputed in-register permutations:

  gather layout   an element sits at tile sublane == (its slab sublane
                  & 7); the per-element 7-bit lane index and 3-bit octant
                  then make the gather a G-way elementwise select of
                  lane-gathers — no placement constraint beyond 128 slots
                  per sublane class.  x is VMEM-resident as (n/128,128);
                  the slab is a dynamic 8G-sublane slice.
  scatter layout  lane-column = stack of row *segments* (<=8 elements of
                  one row, contiguous sublanes).  Per-row sums are
                  in-column *segmented* prefixes (shift-adds masked by
                  within-segment distance — no cross-segment
                  cancellation, no cross-lane scan, no MXU latency).
  y layout        row sums route to slot (row>>7 - y_base, row&127) of a
                  dynamically-sliced (8,128) window of the VMEM-resident
                  y; rows split across chunks accumulate via +=.

  Both permutations (gather->scatter, segment-ends->y) are arbitrary
  1024-slot bijections realized as 3 ``take_along_axis`` pulls (sublane,
  lane, sublane).  Routability for any bijection on the 8x128 grid is
  Hall's theorem; the builder finds the intermediate sublane assignment
  by 8-edge-coloring the src-lane -> dst-lane bipartite multigraph via
  Euler splitting (exactly 8-regular once pad slots are included, so the
  split is always possible).

Packed per-slot metadata (two int32 tiles + one f32 value tile,
12 B/slot; ~12/fill B/nnz of plan traffic vs the 8 B/nnz of raw CSR):

  tile1: -(3) | l(7) | oct(3) | q1(3) | q2(7) | q3(3)        gather+perm1
  tile3: dist(3) | vA(1) | p1(3) | p2(7) | p3(3)             reduce+perm2

:func:`route_spmv_numpy` is an exact numpy simulator of the kernel
semantics — the plan-level oracle used by tests (independent of the dense
oracle).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


LANES = 128
SUBS = 8
SLOTS = SUBS * LANES          # 1024 slots per chunk
ROW_WINDOW = SLOTS            # chunk rows live in one 1024-row window


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RoutePlan:
    """Device-resident ROUTE SpMV plan (pytree of packed chunk tiles)."""

    tile1: jax.Array        # (nchunks, 8, 128) int32  gather + permute1
    tile3: jax.Array        # (nchunks, 8, 128) int32  reduce + permute2
    val: jax.Array          # (nchunks, 8, 128) f32    values, gather layout
    slab_base: jax.Array    # (nchunks,) int32  x slab offset (sublane rows)
    y_base: jax.Array       # (nchunks,) int32  y window offset (sublane rows)
    val_src: jax.Array      # (nchunks, 8, 128) int32  CSR entry idx (-1 pad)
    g: int = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    y_rows: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))

    @property
    def nchunks(self) -> int:
        return int(self.tile1.shape[0])

    def update_values(self, values: jax.Array) -> "RoutePlan":
        """Re-target the plan at new CSR values, same sparsity (the
        vendor optimize-handle reuse contract).  One XLA gather, only on
        value change — the apply path reads ``val`` directly."""
        src = jnp.maximum(self.val_src, 0)
        v = values[src] * (self.val_src >= 0)
        return dataclasses.replace(self, val=v.astype(self.val.dtype))


# ------------------------------------------------------------------ #
# Euler-split 8-edge-coloring (the 3-phase permutation router)
# ------------------------------------------------------------------ #

def _euler_split(src: np.ndarray, dst: np.ndarray,
                 edge_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split a 2d-regular bipartite multigraph into two d-regular halves.

    Nodes: left 0..127 (src lanes), right 128..255 (dst lanes, shifted).
    Repeatedly walks closed trails (all degrees even, so a trail from any
    node always returns to it) and alternates edge colors along the walk;
    bipartite closed trails have even length, so every node ends with
    exactly half its edges in each color class.
    """
    ne = len(edge_ids)
    u = src.astype(np.int64)
    v = dst.astype(np.int64) + LANES
    # linked lists of incident half-edges: half-edge 2k lives at u[k],
    # half-edge 2k+1 at v[k]; lazy deletion via `used`
    nxt = np.full(2 * ne, -1, np.int64)
    head = np.full(2 * LANES, -1, np.int64)
    for k in range(ne):
        nxt[2 * k] = head[u[k]]
        head[u[k]] = 2 * k
        nxt[2 * k + 1] = head[v[k]]
        head[v[k]] = 2 * k + 1
    used = np.zeros(ne, bool)
    color = np.zeros(ne, np.int8)

    def take(node):
        """Pop an unused half-edge at node, or -1."""
        h = head[node]
        while h != -1 and used[h >> 1]:
            h = nxt[h]
        head[node] = h
        return h

    for start in range(2 * LANES):
        while True:
            h = take(start)
            if h == -1:
                break
            node = start
            flag = 0
            while True:
                e = h >> 1
                used[e] = True
                color[e] = flag
                flag ^= 1
                node = v[e] if (h & 1) == 0 else u[e]
                if node == start:
                    break
                h = take(node)
                assert h != -1, "euler walk stuck (degrees not even?)"
    a = edge_ids[color == 0]
    b = edge_ids[color == 1]
    return a, b


def _edge_color_regular(src_lane: np.ndarray,
                        dst_lane: np.ndarray) -> np.ndarray:
    """Proper 8-edge-coloring of an exactly-8-regular bipartite
    multigraph on 128+128 lane nodes, by 3 levels of Euler splitting."""
    ne = len(src_lane)
    assert ne == SLOTS, ne
    colors = np.zeros(ne, np.int32)
    groups: List[Tuple[np.ndarray, int]] = [(np.arange(ne), 0)]
    for _level in range(3):
        new_groups = []
        for ids, base in groups:
            a, b = _euler_split(src_lane[ids], dst_lane[ids], ids)
            new_groups.append((a, base * 2))
            new_groups.append((b, base * 2 + 1))
        groups = new_groups
    for ids, base in groups:
        colors[ids] = base
    return colors


def _route_permutation(src_pos: np.ndarray, dst_pos: np.ndarray):
    """3-phase pull indices realizing the bijection src_pos[k]->dst_pos[k]
    over all 1024 chunk slots (both arrays are full permutations of
    0..1023).  The kernel computes

      t  = c[q1[i,j], j]      (sublane pull, within source lane-column)
      t  = t[i, q2[i,j]]      (lane pull, within sublane-row)
      out= t[q3[i,j], j]      (sublane pull, within dest lane-column)

    and out[dst] == c[src] for every pair.
    """
    su, sl = src_pos // LANES, src_pos % LANES
    du, dl = dst_pos // LANES, dst_pos % LANES
    colors = _edge_color_regular(sl, dl)
    q1 = np.zeros((SUBS, LANES), np.int32)
    q2 = np.zeros((SUBS, LANES), np.int32)
    q3 = np.zeros((SUBS, LANES), np.int32)
    q1[colors, sl] = su
    q2[colors, dl] = sl
    q3[du, dl] = colors
    return q1, q2, q3


# ------------------------------------------------------------------ #
# builder
# ------------------------------------------------------------------ #

def _pick_g(n: int, max_g: int = 8) -> int:
    """Smallest G whose window covers all of n (fewer select steps),
    else max_g."""
    for g in range(1, max_g + 1):
        if g * SLOTS >= n:
            return g
    return max_g


def build_route_plan(rowptr, colind, values, shape: Tuple[int, int],
                     nnz: int, g: Optional[int] = None,
                     dtype=np.float32) -> RoutePlan:
    """Build the ROUTE plan from host CSR arrays (the inspector half of
    the two-phase protocol; O(nnz log nnz) host work)."""
    m, n = shape
    rowptr = np.asarray(rowptr).astype(np.int64)
    colind = np.asarray(colind).astype(np.int64)[:nnz]
    values = np.asarray(values)[:nnz]
    if g is None:
        g = _pick_g(n)
    window = g * SLOTS

    rows = np.repeat(np.arange(m, dtype=np.int64),
                     np.diff(np.minimum(rowptr, nnz)))
    cols = colind
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    ent = order.astype(np.int64)

    # cells: row-major over (stripe, window); within a cell keep
    # (row, col) order
    stripe = rows // ROW_WINDOW
    cellc = cols // window
    cell_order = np.lexsort((cols, rows, cellc, stripe))
    rows, cols, ent = rows[cell_order], cols[cell_order], ent[cell_order]

    out = _PlanAccum()
    ncells_cols = n // window + 1
    cell_key = stripe[cell_order] * ncells_cols + cellc[cell_order]
    if len(rows):
        bounds = np.flatnonzero(np.diff(cell_key)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(rows)]])
        for a, b in zip(starts, ends):
            r = rows[a:b]
            c = cols[a:b]
            sb = int((c[0] // window) * (window // LANES))
            yb = int((r[0] // ROW_WINDOW) * (ROW_WINDOW // LANES))
            _emit_cell(r - (r[0] // ROW_WINDOW) * ROW_WINDOW,
                       c - (c[0] // window) * window,
                       values[ent[a:b]] if len(values) else
                       np.zeros(0, dtype), ent[a:b], g, out, sb, yb)

    if not out.t1:
        out.append_empty()

    x_rows = (n + LANES - 1) // LANES + SUBS * g
    y_rows = (m + LANES - 1) // LANES + SUBS
    fill = nnz / max(len(out.t1) * SLOTS, 1)
    return RoutePlan(
        tile1=jnp.asarray(np.stack(out.t1)),
        tile3=jnp.asarray(np.stack(out.t3)),
        val=jnp.asarray(np.stack(out.val).astype(dtype)),
        slab_base=jnp.asarray(np.array(out.sb, np.int32)),
        y_base=jnp.asarray(np.array(out.yb, np.int32)),
        val_src=jnp.asarray(np.stack(out.src)),
        g=g, shape=(m, n), x_rows=x_rows, y_rows=y_rows, fill=float(fill))


class _PlanAccum:
    def __init__(self):
        self.t1, self.t3, self.val, self.src = [], [], [], []
        self.sb, self.yb = [], []

    def append_empty(self):
        self.t1.append(np.zeros((SUBS, LANES), np.int32))
        self.t3.append(np.zeros((SUBS, LANES), np.int32))
        self.val.append(np.zeros((SUBS, LANES), np.float32))
        self.src.append(np.full((SUBS, LANES), -1, np.int32))
        self.sb.append(0)
        self.yb.append(0)


def _emit_cell(r, c, v, ent, g, out: _PlanAccum, slab_base, y_base):
    """Pack one cell (local rows in [0,1024), local cols in [0, g*1024))
    into chunks: greedy segment packing under three budgets — slot count,
    one-segment-per-row, and the gather-side lane-run count."""
    ncell = len(r)
    # segments: runs of <=8 elements of one row (stream is row-major)
    row_change = np.empty(ncell, bool)
    row_change[0] = True
    row_change[1:] = r[1:] != r[:-1]
    pos_in_row = np.arange(ncell) - np.maximum.accumulate(
        np.where(row_change, np.arange(ncell), 0))
    new_seg = row_change | (pos_in_row % SUBS == 0)
    seg_id = np.cumsum(new_seg) - 1
    seg_start = np.flatnonzero(new_seg)
    nseg = len(seg_start)
    seg_end = np.concatenate([seg_start[1:], [ncell]])
    seg_len = seg_end - seg_start
    seg_row = r[seg_start]

    remaining = list(range(nseg))
    while remaining:
        # budgets: scatter = real first-fit into 128 lane-column stacks
        # of depth 8; gather = 128 slots per slab-sublane class
        class_cnt = np.zeros(SUBS, np.int64)
        lane_fill = np.zeros(LANES, np.int64)
        rows_used = set()
        chosen, place_lane, place_off = [], [], []
        leftover = []
        for s_ in remaining:
            sl = int(seg_len[s_])
            if int(seg_row[s_]) in rows_used:
                leftover.append(s_)
                continue
            cseg = c[seg_start[s_]:seg_end[s_]]
            cls = np.bincount((cseg // LANES) % SUBS, minlength=SUBS)
            if (class_cnt + cls > LANES).any():
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
            class_cnt += cls
            rows_used.add(int(seg_row[s_]))
            chosen.append(s_)
        assert chosen, "chunk packing made no progress"
        idx = np.concatenate([np.arange(seg_start[s_], seg_end[s_])
                              for s_ in chosen])
        seg_local = np.repeat(np.arange(len(chosen)),
                              seg_len[np.array(chosen)])
        _emit_chunk(r[idx], c[idx], v[idx], ent[idx], seg_local,
                    np.array(place_lane, np.int64),
                    np.array(place_off, np.int64), out)
        out.sb.append(slab_base)
        out.yb.append(y_base)
        remaining = leftover


def _emit_chunk(r, c, v, ent, seg, scat_lane, scat_off,
                out: _PlanAccum):
    """Pack one chunk (<=1024 elements, one segment per row); scatter
    placements (lane, depth offset per segment) come from the cell cut."""
    ne = len(r)
    nseg = int(seg[-1]) + 1

    seg_sizes = np.bincount(seg, minlength=nseg)
    seg_first = np.concatenate([[0], np.cumsum(seg_sizes)[:-1]])
    seg_rows = r[seg_first]

    within = np.arange(ne) - seg_first[seg]
    scat_pos = (scat_off[seg] + within) * LANES + scat_lane[seg]

    # ---- gather layout: bucket by x lane into <=8-deep runs ----------- #
    xl = c % LANES
    xs = c // LANES                      # slab sublane, [0, 8g)
    oct_ = xs // SUBS                    # slab octant, [0, g)
    s7 = xs % SUBS
    # gather layout: the element's tile SUBLANE equals its slab sublane
    # low bits (s7); the lane-gather then uses a fully per-element lane
    # index, and the octant select is elementwise — no column-constancy
    # constraint.  Capacity: 128 slots per sublane class (the cell cut
    # guarantees each class fits).
    gat_pos = np.zeros(ne, np.int64)
    class_fill = np.zeros(SUBS, np.int64)
    for k in range(ne):
        cls = int(s7[k])
        gat_pos[k] = cls * LANES + class_fill[cls]
        class_fill[cls] += 1
    assert class_fill.max() <= LANES, "gather class overflow"

    # ---- packed tiles ------------------------------------------------- #
    gu, gl = gat_pos // LANES, gat_pos % LANES
    lfield = np.zeros((SUBS, LANES), np.int64)
    ofield = np.zeros((SUBS, LANES), np.int64)
    vt = np.zeros((SUBS, LANES), np.float32)
    st = np.full((SUBS, LANES), -1, np.int32)
    lfield[gu, gl] = xl
    ofield[gu, gl] = oct_
    vt[gu, gl] = v
    st[gu, gl] = ent

    allpos = np.arange(SLOTS)
    in_g = np.zeros(SLOTS, bool)
    in_g[gat_pos] = True
    in_s = np.zeros(SLOTS, bool)
    in_s[scat_pos] = True
    q1, q2, q3 = _route_permutation(
        np.concatenate([gat_pos, allpos[~in_g]]),
        np.concatenate([scat_pos, allpos[~in_s]]))

    # ---- reduce fields (at scatter positions) ------------------------- #
    # dist = within-segment position: the segmented-prefix shift-add at
    # step d only adds the value d sublanes up when dist >= d
    dfield = np.zeros((SUBS, LANES), np.int64)
    su, sl_ = scat_pos // LANES, scat_pos % LANES
    dfield[su, sl_] = within
    last_sub = scat_off + seg_sizes - 1

    # ---- permute2: segment-end positions -> y slots ------------------- #
    src2 = last_sub * LANES + scat_lane
    dst2 = (seg_rows // LANES) * LANES + (seg_rows % LANES)
    in_s2 = np.zeros(SLOTS, bool)
    in_s2[src2] = True
    in_d2 = np.zeros(SLOTS, bool)
    in_d2[dst2] = True
    p1, p2, p3 = _route_permutation(
        np.concatenate([src2, allpos[~in_s2]]),
        np.concatenate([dst2, allpos[~in_d2]]))
    vA = np.zeros((SUBS, LANES), np.int64)
    vA[dst2 // LANES, dst2 % LANES] = 1

    t1 = ((lfield << 3) | (ofield << 10)
          | (q1.astype(np.int64) << 13) | (q2.astype(np.int64) << 16)
          | (q3.astype(np.int64) << 23))
    t3 = (dfield | (vA << 3) | (p1.astype(np.int64) << 4)
          | (p2.astype(np.int64) << 7) | (p3.astype(np.int64) << 14))
    out.t1.append(t1.astype(np.int32))
    out.t3.append(t3.astype(np.int32))
    out.val.append(vt)
    out.src.append(st)


# ------------------------------------------------------------------ #
# numpy simulator (kernel-semantics oracle)
# ------------------------------------------------------------------ #

def pack_x(x: np.ndarray, plan: RoutePlan) -> np.ndarray:
    """x (n,) -> padded (x_rows, 128) layout the kernel consumes."""
    n = plan.shape[1]
    x2 = np.zeros((plan.x_rows, LANES), np.asarray(x).dtype)
    x2.reshape(-1)[:n] = np.asarray(x)
    return x2


def route_spmv_numpy(plan: RoutePlan, x: np.ndarray) -> np.ndarray:
    """Exact numpy mirror of the Pallas kernel semantics."""
    m, n = plan.shape
    g = plan.g
    x2 = pack_x(x, plan).astype(np.float32)
    y2 = np.zeros((plan.y_rows, LANES), np.float32)

    t1 = np.asarray(plan.tile1)
    t3 = np.asarray(plan.tile3)
    val = np.asarray(plan.val)
    sb = np.asarray(plan.slab_base)
    yb = np.asarray(plan.y_base)
    jj = np.broadcast_to(np.arange(LANES)[None, :], (SUBS, LANES))
    ii = np.broadcast_to(np.arange(SUBS)[:, None], (SUBS, LANES))

    for k in range(plan.nchunks):
        a = t1[k]
        b = t3[k]
        l = (a >> 3) & 127
        oct_ = (a >> 10) & 7
        q1 = (a >> 13) & 7
        q2 = (a >> 16) & 127
        q3 = (a >> 23) & 7
        slab = x2[sb[k]:sb[k] + SUBS * g]
        vx = np.zeros((SUBS, LANES), np.float32)
        for gg in range(g):
            ug = slab[gg * SUBS:(gg + 1) * SUBS][ii, l]
            vx = np.where(oct_ == gg, ug, vx)
        c = vx * val[k]
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
        y2[yb[k]:yb[k] + SUBS] += RS * vA
    return y2.reshape(-1)[:m]
