import time, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from spblas_tpu.utils.generate import generate_csr
import spblas_tpu.kernels.route2 as r2

# wrap stages with timers
acc = {}
def wrap(mod, name):
    orig = getattr(mod, name)
    def f(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        acc[name] = acc.get(name, 0) + time.perf_counter() - t0
        return out
    setattr(mod, name, f)
wrap(r2, "_rebalance_classes")
wrap(r2, "_pack_cells_native")
import spblas_tpu.native as nat
wrap(nat, "route2_pack")

m, nnz = 1_000_000, 10_000_000
t0 = time.perf_counter()
a = generate_csr(m, m, nnz, seed=0)
rp, ci, vv = np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values)
print(f"gen {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
plan = r2.build_route2_plan(rp, ci, vv, (m, m), nnz)
tt = time.perf_counter() - t0
print(f"build {tt:.1f}s g={plan.g} fill={plan.fill:.3f} nchunks={plan.nchunks}")
for k, v in acc.items():
    print(f"  {k}: {v:.1f}s")
print(f"  other: {tt - acc['_rebalance_classes'] - acc['_pack_cells_native']:.1f}s  (native inside pack: {acc['route2_pack']:.1f}s)")
