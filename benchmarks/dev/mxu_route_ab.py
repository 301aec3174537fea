"""MXU one-hot routing A/B (VERDICT r2 weak #1b) + window-g sweep.

Question 1: can the ROUTE chunk's in-register gather be replaced by
8-deep batched one-hot contractions on the MXU?  A chunk's lane gather
t2[a, j] = t1[a, lf[a, j]] is, per sublane a, a (1,128) x (128,128)
one-hot matmul; batched over the 8 sublanes it is one dot_general with
a batch dim.  Measure ns/chunk-equivalent against the ~55 ns VPU chunk.

Question 2: fill vs window size — g=8/16/32 at m=300k deg 10 (fill is
throughput; bigger windows fight cell starvation but pay a longer
octant ladder).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 300


def time_chained(step, params, x0, iters=ITERS, reps=3):
    @jax.jit
    def chain(params, x):
        return jax.lax.fori_loop(0, iters, lambda _, v: step(params, v), x)

    jax.block_until_ready(chain(params, x0))
    best = float("inf")
    for r in range(reps):
        xr = x0 + jnp.asarray(1e-3 * (r + 1), x0.dtype)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(params, xr)
        jax.block_until_ready(out)
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def mxu_onehot_ab(nchunks=4096):
    """One grid of chunks: per chunk, 8-deep batched one-hot (128,128)
    contraction (the lane-gather replacement), chained so XLA can
    schedule them back-to-back on the MXU."""
    rng = np.random.default_rng(0)
    # one-hot G per (chunk, sublane): (nc, 8, 128, 128) would be 2 GB;
    # reuse 64 distinct G banks round-robin (MXU timing is oblivious)
    G = jnp.asarray(
        np.eye(128, dtype=np.float32)[rng.integers(0, 128, (64, 8, 128))]
        .transpose(0, 1, 3, 2))       # (64, 8, 128, 128) one-hot cols

    def step(G, x):
        # x: (8, 128) working tile; apply nchunks batched contractions
        def body(i, t):
            g = G[i % 64]
            # t2[a, j] = sum_l t[a, l] g[a, l, j]  — batch dim a
            t2 = jax.lax.dot_general(
                t[:, None, :], g,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]
            return t2 * 1.0000001
        return jax.lax.fori_loop(0, nchunks, body, x)

    dt = time_chained(step, G, jnp.ones((8, 128), jnp.float32), iters=30)
    ns = dt / nchunks * 1e9
    print(f"MXU 8-deep batched one-hot contraction: {ns:7.1f} ns/chunk "
          f"(VPU chunk: ~55 ns)", flush=True)


def g_sweep(m=300_000, deg=10):
    from spblas_tpu.kernels.route2 import build_route2_plan
    from spblas_tpu.kernels.route2_kernel import route2_spmv
    from spblas_tpu.utils.generate import generate_csr

    a = generate_csr(m, m, m * deg, seed=3)
    rp, ci, vv = (np.asarray(a.rowptr), np.asarray(a.colind),
                  np.asarray(a.values))
    for g in (8, 16, 32):
        plan = build_route2_plan(rp, ci, vv, (m, m), int(a.nnz), g=g)

        def step(p, x):
            y = route2_spmv(p, x)
            return y * jax.lax.rsqrt(jnp.sum(y * y) / m + 1e-9)

        dt = time_chained(step, plan, jnp.ones((m,), jnp.float32))
        print(f"g={g:2d}: fill={plan.fill:.3f} chunks={plan.nchunks:6d} "
              f"{m*deg/dt/1e9:5.2f} Gnnz/s "
              f"({dt/plan.nchunks*1e9:5.1f} ns/chunk)", flush=True)


if __name__ == "__main__":
    mxu_onehot_ab()
    g_sweep()
