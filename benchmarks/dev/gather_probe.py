"""Row-gather rate vs index order/dtype/k — the SpMM speed-of-light
probe (round 3).  B (100k, k); 1M row gathers.

Question: does index locality change XLA's gather rate on this chip?
If sorted/near-sorted indices gather much faster than random, SELL can
sort bucket rows by column (free: pos un-permutes) and ride it.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 100_000
NNZ = 1_000_000
ITERS = 20
REPS = 3


def time_chained(step, params, x0):
    @jax.jit
    def chain(params, x):
        return jax.lax.fori_loop(0, ITERS,
                                 lambda _, v: step(params, v), x)

    jax.block_until_ready(chain(params, x0))
    best = float("inf")
    for r in range(REPS):
        xr = x0 + jnp.asarray(1e-3 * (r + 1), x0.dtype)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = chain(params, xr)
        jax.block_until_ready(out)
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def probe(name, idx, k, dtype=jnp.float32):
    deg = NNZ // N
    idx = jnp.asarray(idx, jnp.int32)

    def step(idx, b):
        g = b.astype(dtype)[idx].astype(jnp.float32)
        return g.reshape(deg, N, k).sum(0) * 1e-3 + 0.5

    b0 = jnp.ones((N, k), jnp.float32)
    dt = time_chained(step, idx, b0)
    nbytes = NNZ * k * jnp.dtype(dtype).itemsize
    print(f"{name:38s} k={k:4d} {dt*1e3:8.2f} ms  "
          f"{nbytes/dt/1e9:7.1f} GB/s  {NNZ/dt/1e6:7.1f} Mrows/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    rand = rng.integers(0, N, NNZ)
    srt = np.sort(rand)
    # near-sorted: sorted blocks of the full range with +-500 jitter
    jit500 = np.clip(srt + rng.integers(-500, 500, NNZ), 0, N - 1)
    jit5k = np.clip(srt + rng.integers(-5000, 5000, NNZ), 0, N - 1)

    for k in (256, 64):
        probe("random", rand, k)
        probe("sorted", srt, k)
        probe("sorted +-500 jitter", jit500, k)
        probe("sorted +-5000 jitter", jit5k, k)
    probe("random bf16 rows", rand, 256, jnp.bfloat16)
    probe("sorted bf16 rows", srt, 256, jnp.bfloat16)
    # half the rows, double width: same bytes, fewer indices
    rand_h = rng.integers(0, N // 2, NNZ // 2)
    idx = jnp.asarray(rand_h, jnp.int32)

    def step(idx, b):
        g = b.reshape(N // 2, 512)[idx]
        return (g.reshape(10, N // 2, 512).sum(0) * 1e-3
                + 0.5).reshape(N, 256)

    b0 = jnp.ones((N, 256), jnp.float32)
    dt = time_chained(step, idx, b0)
    print(f"{'random 500k x 2KB rows':38s} k=512 {dt*1e3:8.2f} ms  "
          f"{NNZ//2*512*4/dt/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
