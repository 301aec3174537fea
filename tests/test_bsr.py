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


def _blocky(m, n, bh, bw, nblocks, seed):
    rng = np.random.default_rng(seed)
    d = np.zeros((m, n), np.float32)
    for _ in range(nblocks):
        i, j = rng.integers(m // bh), rng.integers(n // bw)
        d[i*bh:(i+1)*bh, j*bw:(j+1)*bw] = rng.standard_normal((bh, bw))
    return d


def test_bsr_spgemm():
    from spblas_tpu.kernels.bsr_spgemm import bsr_spgemm
    da = _blocky(64, 512, 8, 128, 16, seed=1)
    db = _blocky(512, 384, 128, 128, 10, seed=2)
    a = BSR.from_dense(da, (8, 128))
    b = BSR.from_dense(db, (128, 128))
    c = bsr_spgemm(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(c.todense()), da @ db,
                               rtol=1e-4, atol=1e-4)


def test_bsr_spgemm_numeric_reuse():
    import dataclasses
    from spblas_tpu.kernels.bsr_spgemm import (bsr_spgemm_compute,
                                               bsr_spgemm_numeric)
    da = _blocky(32, 256, 8, 128, 8, seed=3)
    db = _blocky(256, 256, 128, 128, 4, seed=4)
    a = BSR.from_dense(da, (8, 128))
    b = BSR.from_dense(db, (128, 128))
    plan = bsr_spgemm_compute(a, b)
    c1 = bsr_spgemm_numeric(plan, a, b, interpret=True)
    a2 = dataclasses.replace(a, values=a.values * 3.0)
    c2 = bsr_spgemm_numeric(plan, a2, b, interpret=True)
    np.testing.assert_allclose(np.asarray(c2.todense()),
                               3.0 * np.asarray(c1.todense()),
                               rtol=1e-5, atol=1e-4)


def test_bsr_spgemm_block_mismatch_raises():
    import pytest
    from spblas_tpu.kernels.bsr_spgemm import bsr_spgemm_compute
    a = BSR.from_dense(_blocky(32, 256, 8, 128, 4, seed=5), (8, 128))
    b = BSR.from_dense(_blocky(256, 256, 8, 128, 4, seed=6), (8, 128))
    with pytest.raises(ValueError):
        bsr_spgemm_compute(a, b)   # A's bk=128 != B's bh=8


def test_multiply_routes_bsr_pair_to_block_spgemm():
    import spblas_tpu as sp
    da = _blocky(64, 256, 8, 128, 10, seed=7)
    db = _blocky(256, 256, 128, 128, 3, seed=8)
    a = BSR.from_dense(da, (8, 128))
    b = BSR.from_dense(db, (128, 128))
    c = sp.multiply(sp.scaled(2.0, a), b)
    assert isinstance(c, BSR)
    np.testing.assert_allclose(np.asarray(c.todense()), 2.0 * da @ db,
                               rtol=1e-4, atol=1e-4)
