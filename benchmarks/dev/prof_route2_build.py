import cProfile, pstats, io, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from spblas_tpu.utils.generate import generate_csr
from spblas_tpu.kernels.route2 import build_route2_plan
m, nnz = 1_000_000, 10_000_000
a = generate_csr(m, m, nnz, seed=0)
rp, ci, vv = np.asarray(a.rowptr), np.asarray(a.colind), np.asarray(a.values)
pr = cProfile.Profile()
pr.enable()
plan = build_route2_plan(rp, ci, vv, (m, m), nnz)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(18)
print(s.getvalue()[:3500])
