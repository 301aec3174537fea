"""Packing simulation for per-chunk publish-position rotation (round 5,
VERDICT r4 #5 — the supercell residual-wall analysis).

Models the m=1M deg-10 g=32 W=8 supercell geometry with the packer's
real constraints (per-lane depth 8, one publish per tile position,
<=8 distinct columns per source lane) and measures the fill under d
candidate rotations per chunk:

    d=1 (plain / single rho): fill 0.373 -> 0.42
    d=2:                      fill 0.56   (4.7 chunks/supercell)
    d=4:                      fill 0.60   (saturates on coloring/depth)

The rotation dissolves the 1024-class position-collision and lane
Poisson bounds into a birthday/matching problem, but the residual
coloring+depth ceiling is ~0.6 — combined with the measured kernel
cost of the un-rotation (benchmarks/dev/rot_publish_ab.py), the net
gain is at most ~flat vs the shipped W=8 supercells; recorded as the
measured dead end in PERF_NOTES round 5.

Run: python benchmarks/dev/rho_pack_sim.py  (host-only)
"""
import numpy as np

rng = np.random.default_rng(0)
W, SLOTS, LANES, SUBS = 8, 1024, 128, 8
window = 32 * 1024
m, n, nnz = 1_000_000, 1_000_000, 10_000_000
lam = nnz * window / (m * n)
rows_sc = SLOTS * W


def simulate(d, trials=3):
    tc = te = 0
    for _ in range(trials):
        deg = rng.poisson(lam, rows_sc)
        rows = np.repeat(np.arange(rows_sc), deg)
        cols = rng.integers(0, window, len(rows))
        E = len(rows)
        order = np.argsort(rows, kind="stable")
        rows, cols = rows[order], cols[order]
        chunks = []

        def try_place(ck, r, seg_cols):
            for sel in range(d):
                pos = ((r & (SLOTS - 1)) + ck["rho"][sel]) & (SLOTS - 1)
                jd = pos & 127
                if pos in ck["pos"]:
                    continue
                if ck["depth"][jd] + len(seg_cols) > SUBS:
                    continue
                bad = False
                for c in seg_cols:
                    sl = c & 127
                    if (c not in ck["srccols"][sl]
                            and len(ck["srccols"][sl]) >= 8):
                        bad = True
                        break
                if bad:
                    continue
                ck["depth"][jd] += len(seg_cols)
                ck["pos"].add(pos)
                for c in seg_cols:
                    ck["srccols"][c & 127].add(c)
                return True
            return False

        i = 0
        while i < E:
            r = rows[i]
            j = i
            while j < E and rows[j] == r:
                j += 1
            seg_cols = cols[i:j]
            i = j
            if not any(try_place(ck, r, seg_cols) for ck in chunks):
                ck = dict(depth=np.zeros(LANES, int), pos=set(),
                          rho=[int(rng.integers(0, 1024))
                               for _ in range(d)],
                          srccols=[set() for _ in range(LANES)])
                chunks.append(ck)
                assert try_place(ck, r, seg_cols)
        tc += len(chunks)
        te += E
    return te / (tc * SLOTS), tc / trials


if __name__ == "__main__":
    for d in (1, 2, 4):
        fill, nch = simulate(d)
        print(f"d={d}: fill {fill:.3f}  chunks/supercell {nch:.1f}")
