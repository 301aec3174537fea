"""Measure host->device upload bandwidth through the axon tunnel:
device_put of 64/256/1024 MB arrays, block_until_ready, plus readback."""

import time

import numpy as np

import jax


def probe(mb):
    a = np.random.default_rng(0).integers(
        1, 1 << 20, mb * 1024 * 1024 // 4).astype(np.int32)
    t0 = time.perf_counter()
    d = jax.device_put(a)
    d.block_until_ready()
    t1 = time.perf_counter()
    _ = np.asarray(d[:1])
    t2 = time.perf_counter()
    print(f"{mb:5d} MB up: {t1 - t0:6.2f} s = {mb / (t1 - t0):7.1f} MB/s"
          f"  (readback 1 elem {t2 - t1:.3f} s)", flush=True)


if __name__ == "__main__":
    for mb in (16, 64, 256, 1024):
        probe(mb)
    # batched tuple vs singles
    parts = [np.ones(64 * 1024 * 1024 // 4, np.float32) * i
             for i in range(8)]
    t0 = time.perf_counter()
    ds = jax.device_put(tuple(parts))
    for d in ds:
        d.block_until_ready()
    t1 = time.perf_counter()
    print(f"tuple 8x64 MB: {t1 - t0:.2f} s = {512 / (t1 - t0):.1f} MB/s",
          flush=True)
