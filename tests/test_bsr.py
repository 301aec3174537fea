"""BSR container + Pallas block kernels (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spblas_tpu.formats.bsr import BSR
from spblas_tpu.kernels.bsr_pallas import bsr_spmm, bsr_spmv


def _block_dense(m, n, bh, bw, nblocks, seed):
    rng = np.random.default_rng(seed)
    dense = np.zeros((m, n), np.float32)
    for _ in range(nblocks):
        i, j = rng.integers(m // bh), rng.integers(n // bw)
        dense[i * bh:(i + 1) * bh, j * bw:(j + 1) * bw] = \
            rng.standard_normal((bh, bw))
    return dense


def test_bsr_roundtrip():
    dense = _block_dense(64, 256, 8, 128, 12, seed=0)
    a = BSR.from_dense(dense, (8, 128))
    np.testing.assert_allclose(np.asarray(a.todense()), dense)


def test_bsr_empty_rows():
    dense = np.zeros((32, 256), np.float32)
    dense[8:16, :128] = 1.0   # single block; other block rows empty
    a = BSR.from_dense(dense, (8, 128))
    b = np.ones((256, 128), np.float32)
    c = bsr_spmm(a, jnp.asarray(b), interpret=True)
    np.testing.assert_allclose(np.asarray(c), dense @ b, rtol=1e-5)


@pytest.mark.parametrize("k", [128, 256])
def test_bsr_spmm(k):
    dense = _block_dense(64, 512, 8, 128, 20, seed=1)
    a = BSR.from_dense(dense, (8, 128))
    rng = np.random.default_rng(2)
    b = rng.standard_normal((512, k)).astype(np.float32)
    c = bsr_spmm(a, jnp.asarray(b), interpret=True)
    np.testing.assert_allclose(np.asarray(c), dense @ b,
                               rtol=1e-4, atol=1e-4)


def test_bsr_spmv():
    dense = _block_dense(64, 512, 8, 128, 20, seed=3)
    a = BSR.from_dense(dense, (8, 128))
    rng = np.random.default_rng(4)
    x = rng.standard_normal(512).astype(np.float32)
    y = bsr_spmv(a, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y), dense @ x,
                               rtol=1e-4, atol=1e-4)
