import os, sys, time, numpy as np
import jax, jax.numpy as jnp
eng = sys.argv[1] if len(sys.argv) > 1 else "1"
if eng == "2":
    os.environ["SPBLAS_ROUTE_SPGEMM"] = "2"
elif eng == "0":
    os.environ["SPBLAS_NO_ROUTE_SPGEMM"] = "1"
import spblas_tpu as sp
from spblas_tpu.utils.generate import generate_csr
from spblas_tpu.ops.spgemm import SpgemmState

m, nnz = 2000, 40_000
a = generate_csr(m, m, nnz, seed=0)
b = generate_csr(m, m, nnz, seed=1)
st = SpgemmState()
t0 = time.perf_counter()
info = st.symbolic_compute(a, b)
t_sym = time.perf_counter() - t0
plan = info.plan
print(f"engine={eng} symbolic {t_sym:.1f}s nnz={info.result_nnz} route={type(plan.route).__name__}", flush=True)
if plan.route is not None and hasattr(plan.route, "fill"):
    print(f"  route fill={plan.route.fill:.3f} nchunks={plan.route.nchunks}", flush=True)

# numeric reuse timing: distinct values per rep, chained
import dataclasses
from spblas_tpu.ops.spgemm import _numeric
av, bv = a.values, b.values
one = jnp.ones((), jnp.float32)

@jax.jit
def chain(plan, av, bv, iters=50):
    def body(_, carry):
        s, av2 = carry
        out = _numeric(plan, av2, bv, None, one, one)
        return (s + out[0], av2 * jnp.float32(1.0000001))
    return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), av))

t0 = time.perf_counter()
jax.block_until_ready(chain(plan, av, bv))
print(f"  numeric compile+run {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for r in range(3):
    av2 = av * (1 + 1e-4 * (r + 1))
    jax.block_until_ready(av2)
    t0 = time.perf_counter()
    out = chain(plan, av2, bv)
    jax.block_until_ready(out)
    float(out[0])
    best = min(best, time.perf_counter() - t0)
per = best / 50
flops = 2 * int(np.asarray(plan.valid).sum())
print(f"  numeric {per*1e3:.2f} ms/run  ({info.result_nnz/per/1e9:.2f} Gnnz_out/s)", flush=True)
