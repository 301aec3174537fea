"""Single-cell packer diagnostic: per-chunk occupancy, native vs python.

One 1024-row x (g*1024)-col cell at a given element count; prints each
chunk's live-slot count plus the color-bound estimate
sum_lc min(#distinct cols at lane lc, 8).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spblas_tpu.kernels import route2 as r2


def one_cell(E, g, seed=0, use_native=True):
    rng = np.random.default_rng(seed)
    m, n = 1024, g * 1024
    # E distinct (row, col) pairs
    flat = rng.choice(m * n, size=E, replace=False)
    rows = np.sort(flat // n).astype(np.int64)
    # resort by (row, col)
    cols = (flat % n).astype(np.int64)
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(E).astype(np.float64)
    ent = np.arange(E, dtype=np.int64)
    state = r2._BuildState(g, 8)
    if not use_native:
        from spblas_tpu import native
        orig = native.route2_pack
        native.route2_pack = lambda *a, **k: None
        try:
            r2._pack_stream(rows, cols, vals, ent, g, g * 1024, state,
                            rows)
        finally:
            native.route2_pack = orig
    else:
        r2._pack_stream(rows, cols, vals, ent, g, g * 1024, state, rows)
    occ = [int((s >= 0).sum()) for s in state.srcs]
    # color bound
    lc = cols & 127
    bound = 0
    for l in range(128):
        bound += min(len(set(cols[lc == l].tolist())), 8)
    return occ, bound


if __name__ == "__main__":
    E = int(os.environ.get("DIAG_E", 1118))
    g = int(os.environ.get("DIAG_G", 32))
    for nat in (True, False):
        occ, bound = one_cell(E, g, use_native=nat)
        print(f"native={nat} E={E} g={g} chunk1_color_bound={bound} "
              f"chunks={len(occ)} occ={occ} "
              f"fill={E / (1024 * max(len(occ), 1)):.3f}")


def trace_stray(E, g, seed=0):
    """Re-run the python packer with a traced try_place to explain the
    placement that opens chunk 3."""
    rng = np.random.default_rng(seed)
    m, n = 1024, g * 1024
    flat = rng.choice(m * n, size=E, replace=False)
    rows = np.sort(flat // n).astype(np.int64)
    cols = (flat % n).astype(np.int64)
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(E).astype(np.float64)
    ent = np.arange(E, dtype=np.int64)
    state = r2._BuildState(g, 8)

    orig_try = r2._Chunk.try_place
    orig_init = r2._Chunk.__init__
    counter = {"n": 0}

    def init2(self):
        orig_init(self)
        counter["n"] += 1
        self.chunk_id = counter["n"]

    def try2(self, lcs, row, publish_slot):
        ok = orig_try(self, lcs, row, publish_slot)
        if not ok and counter["n"] >= 2 and len(self.elems) < 1000:
            l_pub = int(publish_slot) & 127
            s_pub = int(publish_slot) >> 7
            # diagnose: depth at home lane, carrier, colors at lc
            lc0 = int(lcs[0]) & 127
            ncols = len([1 for c2 in self.col_colors
                         if (c2 & 127) == lc0])
            print(f"  FAIL chunk{self.chunk_id} n={len(self.elems)} "
                  f"row={row} len={len(lcs)} lcs={[int(x) for x in lcs]} "
                  f"lc0={lc0} depth[home]={int(self.depth[l_pub])} "
                  f"carrier_blocked={(s_pub, l_pub) in self.carrier} "
                  f"cols_at_lc0={ncols}")
        return ok

    r2._Chunk.__init__ = init2
    r2._Chunk.try_place = try2
    from spblas_tpu import native
    orig = native.route2_pack
    native.route2_pack = lambda *a, **k: None
    try:
        r2._pack_stream(rows, cols, vals, ent, g, g * 1024, state, rows)
    finally:
        native.route2_pack = orig
        r2._Chunk.try_place = orig_try
        r2._Chunk.__init__ = orig_init
    occ = [int((s >= 0).sum()) for s in state.srcs]
    print("occ:", occ)
