"""A/B (recorded DEAD END, round 3): plain batched upload of
(tile,val) chunk streams vs a compact live-slots-only scatter-expand
path, at paned-plan fill.  Synthetic parts (no plan build) so the
delta is pure placement.

Measured on v5e through the axon tunnel:
  compact#1: 25.9 s (incl. expand-jit compile)  compact#2: 22.7 s
  plain    : 19.6 s for the same 1.97 GB padded streams (~100 MB/s)
The 4x upload-byte saving is eaten by the host flatnonzero over the
padded streams plus the device scatter-expand; the plain batched
device_put stays the production path (utils/placement.py).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from spblas_tpu.utils.placement import device_put_batch

FILL = 0.08
CHUNKS = 60_000          # ~0.5 GB per part pair
PARTS = 4                # ~2 GB total (m=4M-plan scale)


def make_parts():
    rng = np.random.default_rng(0)
    out = []
    for i in range(PARTS):
        t = np.zeros((CHUNKS, 8, 128), np.int32)
        v = np.zeros((CHUNKS, 8, 128), np.float32)
        mask = rng.random((CHUNKS, 8, 128)) < FILL
        t[mask] = rng.integers(1, 1 << 20, int(mask.sum()))
        v[mask] = 1.5
        out.append((t, v))
    return out


def put_compact(parts):
    flat_t = [p[0].reshape(-1) for p in parts]
    flat_v = [p[1].reshape(-1) for p in parts]
    sizes = [t.size for t in flat_t]
    total = int(sum(sizes))
    live = [np.flatnonzero((t != 0) | (v != 0))
            for t, v in zip(flat_t, flat_v)]
    base = np.cumsum([0] + sizes[:-1])
    pos = np.concatenate([lp + b for lp, b in zip(live, base)]
                         ).astype(np.int32)
    tv = np.concatenate([t[lp] for t, lp in zip(flat_t, live)])
    vv = np.concatenate([v[lp] for v, lp in zip(flat_v, live)])
    pos_d, tv_d, vv_d = device_put_batch(pos, tv, vv)

    @jax.jit
    def expand(pos_d, tv_d, vv_d):
        t_all = jnp.zeros((total,), jnp.int32).at[pos_d].set(
            tv_d, mode="drop")
        v_all = jnp.zeros((total,), jnp.float32).at[pos_d].set(
            vv_d, mode="drop")
        return t_all, v_all

    t_all, v_all = expand(pos_d, tv_d, vv_d)
    out = []
    for sz, b, p in zip(sizes, base, parts):
        shape = p[0].shape
        out.append((jax.lax.slice(t_all, (int(b),), (int(b) + sz,)
                                  ).reshape(shape),
                    jax.lax.slice(v_all, (int(b),), (int(b) + sz,)
                                  ).reshape(shape)))
    return out


def put_plain(parts):
    flat = device_put_batch(*[a for p in parts for a in p])
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(len(parts))]


def run(tag, fn, parts):
    t0 = time.perf_counter()
    got = fn(parts)
    for t, v in got:
        t.block_until_ready()
        v.block_until_ready()
    t1 = time.perf_counter()
    gb = sum(p[0].nbytes + p[1].nbytes for p in parts) / 1e9
    print(f"{tag}: {t1 - t0:6.1f} s for {gb:.2f} GB padded "
          f"({gb / (t1 - t0):.3f} GB/s effective)", flush=True)
    ok = all(np.array_equal(np.asarray(t), p[0])
             for (t, _), p in zip(got, parts))
    print(f"  roundtrip ok={ok}", flush=True)


if __name__ == "__main__":
    parts = make_parts()
    run("compact#1", put_compact, parts)   # includes expand-jit compile
    run("compact#2", put_compact, parts)   # warm
    run("plain    ", put_plain, parts)
