"""A/B general-SpMM formulations on the real chip (round 3, VERDICT #4).

Hypothesis: SELL's 49 GF (vs ~139 GF gather bound, k=256 uniform 100k)
is accumulator traffic — each of the W gather+add passes reads+writes
the (mb, k) acc in HBM.  Candidates below try to keep acc local.

Methodology per PERF_NOTES.md / bench.py: jitted fori chains whose
output feeds back as the next input (defeats memoization), scalar
readback after block_until_ready, operands built on device.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spblas_tpu.utils import generate as gen
from spblas_tpu.kernels.sell import build_sell_plan, sell_spmm

M = N = 100_000
DEG = 10
K = 256
NNZ = M * DEG
ITERS = 20
REPS = 3


def time_chained(step, params, x0, iters=ITERS, reps=REPS):
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


def report(name, dt):
    gf = 2 * NNZ * K / dt / 1e9
    print(f"{name:34s} {dt*1e3:8.2f} ms  {gf:7.1f} GFLOP/s", flush=True)


def feedback(c):
    return c * 1e-3 + 0.5


def main():
    a = gen.generate_csr(M, N, NNZ, seed=0)
    plan = build_sell_plan(a)
    print("buckets:", [(b.values.shape[0], b.width) for b in plan.buckets],
          flush=True)
    b0 = jnp.ones((N, K), jnp.float32)

    vl = tuple(bb.values for bb in plan.buckets)
    cl = tuple(bb.cols for bb in plan.buckets)
    pos = plan.pos

    # A: current SELL
    dt = time_chained(lambda p, b: feedback(sell_spmm(p, b)), plan, b0)
    report("A sell_spmm (current)", dt)

    # B: per-bucket tree reduction of the W gather terms
    def tree_parts(vals, cols, b):
        terms = [vals[:, w, None] * b[cols[:, w]]
                 for w in range(vals.shape[1])]
        while len(terms) > 1:
            nxt = [terms[i] + terms[i + 1]
                   for i in range(0, len(terms) - 1, 2)]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    def tree_spmm(p, b):
        vals_list, cols_list, pos = p
        parts = [tree_parts(v, c, b)
                 for v, c in zip(vals_list, cols_list)]
        parts.append(jnp.zeros((1, K), jnp.float32))
        return feedback(jnp.concatenate(parts, axis=0)[pos])

    dt = time_chained(tree_spmm, (vl, cl, pos), b0)
    report("B tree-reassociated", dt)

    # C: row-blocked lax.map (acc per 4096-row block)
    def blocked_spmm(p, b):
        vals_list, cols_list, pos = p
        parts = []
        for vals, cols in zip(vals_list, cols_list):
            mb, w = vals.shape
            blk = 4096
            mb_pad = -(-mb // blk) * blk
            vp = jnp.pad(vals, ((0, mb_pad - mb), (0, 0)))
            cp = jnp.pad(cols, ((0, mb_pad - mb), (0, 0)))

            def one(args):
                v, c = args
                acc = jnp.zeros((blk, K), jnp.float32)
                for i in range(w):
                    acc = acc + v[:, i, None] * b[c[:, i]]
                return acc

            out = jax.lax.map(one, (vp.reshape(-1, blk, w),
                                    cp.reshape(-1, blk, w)))
            parts.append(out.reshape(mb_pad, K)[:mb])
        parts.append(jnp.zeros((1, K), jnp.float32))
        return feedback(jnp.concatenate(parts, axis=0)[pos])

    dt = time_chained(blocked_spmm, (vl, cl, pos), b0)
    report("C row-blocked lax.map 4096", dt)

    # D: flat 3D gather + einsum (known-bad control)
    def einsum_spmm(p, b):
        vals_list, cols_list, pos = p
        parts = [jnp.einsum("mw,mwk->mk", vals, b[cols],
                            precision=jax.lax.Precision.HIGHEST)
                 for vals, cols in zip(vals_list, cols_list)]
        parts.append(jnp.zeros((1, K), jnp.float32))
        return feedback(jnp.concatenate(parts, axis=0)[pos])

    dt = time_chained(einsum_spmm, (vl, cl, pos), b0)
    report("D einsum 3D (control)", dt)

    # E: bf16 B rows (half the gather bytes), f32 accumulate
    def bf16_spmm(p, b):
        vals_list, cols_list, pos = p
        bh = b.astype(jnp.bfloat16)
        parts = []
        for vals, cols in zip(vals_list, cols_list):
            acc = jnp.zeros((vals.shape[0], K), jnp.float32)
            for w in range(vals.shape[1]):
                acc = acc + vals[:, w, None] * bh[cols[:, w]].astype(
                    jnp.float32)
            parts.append(acc)
        parts.append(jnp.zeros((1, K), jnp.float32))
        return feedback(jnp.concatenate(parts, axis=0)[pos])

    dt = time_chained(bf16_spmm, (vl, cl, pos), b0)
    report("E bf16-B gathers", dt)

    # F: bf16 + tree
    def bf16_tree(p, b):
        vals_list, cols_list, pos = p
        bh = b.astype(jnp.bfloat16)
        parts = []
        for vals, cols in zip(vals_list, cols_list):
            terms = [vals[:, w, None] * bh[cols[:, w]].astype(jnp.float32)
                     for w in range(vals.shape[1])]
            while len(terms) > 1:
                nxt = [terms[i] + terms[i + 1]
                       for i in range(0, len(terms) - 1, 2)]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            parts.append(terms[0])
        parts.append(jnp.zeros((1, K), jnp.float32))
        return feedback(jnp.concatenate(parts, axis=0)[pos])

    dt = time_chained(bf16_tree, (vl, cl, pos), b0)
    report("F bf16 + tree", dt)

    # G: raw gather-rate probe at this shape (the bound's numerator)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, N, NNZ), jnp.int32)

    def just_gather(idx, b):
        g = b[idx]
        # reduce back to (N, K) so the chain type-checks: strided sum
        return feedback(g.reshape(DEG, N, K).sum(0) * 1e-3)

    dt = time_chained(just_gather, idx, b0)
    gbs = NNZ * K * 4 / dt / 1e9
    print(f"G gather+strided-reduce            {dt*1e3:8.2f} ms  "
          f"{gbs:7.1f} GB/s of gathered rows", flush=True)


if __name__ == "__main__":
    main()
