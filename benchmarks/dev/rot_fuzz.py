"""Rotation-mode builder fuzz: 132 geometries (sizes x W x seeds +
spill/aux-heavy dense and RMAT) vs the dense oracle through the numpy
simulator — all clean (round 5; recorded in PERF_NOTES).

Run: python benchmarks/dev/rot_fuzz.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from spblas_tpu.kernels.route2 import build_route2_plan, route2_spmv_numpy
from spblas_tpu.utils.generate import generate_csr, generate_rmat_csr

rng = np.random.default_rng(0)
cfgs = []
for seed in range(8):
    for (m, n, nnz) in ((1500, 2000, 9000), (6000, 6000, 30000),
                        (20000, 20000, 90000), (999, 3001, 5000)):
        for ww in (1, 2, 4, 8):
            cfgs.append((seed, m, n, nnz, ww))
bad = 0
for i, (seed, m, n, nnz, ww) in enumerate(cfgs):
    a = generate_csr(m, n, nnz, seed=seed)
    rp = np.asarray(a.rowptr); ci = np.asarray(a.colind); vv = np.asarray(a.values)
    try:
        plan = build_route2_plan(rp, ci, vv, (m, n), int(a.nnz),
                                 row_window_mult=ww, rotate=True)
    except Exception as e:
        print(f"cfg {i} {seed,m,n,nnz,ww}: BUILD FAIL {e}"); bad += 1; continue
    x = np.random.default_rng(seed + 99).standard_normal(n).astype(np.float32)
    y = route2_spmv_numpy(plan, x)
    dense = np.zeros((m, n), np.float32)
    k = int(a.nnz)
    rows = np.repeat(np.arange(m), np.diff(np.minimum(rp[:m+1], k)))
    dense[rows, ci[:k]] = vv[:k]
    ref = dense @ x
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-6)
    if err > 2e-4:
        print(f"cfg {i} {seed,m,n,nnz,ww}: MISMATCH err={err:.2e} fill={plan.fill:.3f}")
        bad += 1
print(f"{len(cfgs)} configs, {bad} bad")

# spill/aux-heavy (high in-window degree) + RMAT with rotation forced
cfgs2 = [("dense", 3000, 3000, 90000, 2), ("dense", 3000, 3000, 90000, 8),
         ("rmat", 8192, 8192, 8192*16, 2), ("rmat", 8192, 8192, 8192*16, 8)]
bad2 = 0
for kind, m, n, nnz, ww in cfgs2:
    a = (generate_rmat_csr(m, nnz, seed=5) if kind == "rmat"
         else generate_csr(m, n, nnz, seed=5))
    rp = np.asarray(a.rowptr); ci = np.asarray(a.colind); vv = np.asarray(a.values)
    plan = build_route2_plan(rp, ci, vv, a.shape, int(a.nnz),
                             row_window_mult=ww, rotate=True, spill=True)
    x = np.random.default_rng(7).standard_normal(a.shape[1]).astype(np.float32)
    y = route2_spmv_numpy(plan, x)
    dense = np.zeros(a.shape, np.float32)
    k = int(a.nnz)
    rows = np.repeat(np.arange(a.shape[0]), np.diff(np.minimum(rp[:a.shape[0]+1], k)))
    dense[rows, ci[:k]] = vv[:k]
    ref = dense @ x
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-6)
    print(f"{kind} ww={ww}: fill {plan.fill:.3f} aux {plan.n_aux_chunks} err {err:.2e}")
    if err > 5e-4: bad2 += 1
print("spill/aux fuzz bad:", bad2)
