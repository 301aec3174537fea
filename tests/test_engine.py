"""Unit tests for the sort-based kernel building blocks
(backend/engine.py — the SPA/hash-accumulator/csr_builder analogue)."""

import jax.numpy as jnp
import numpy as np

from spblas_tpu.backend import engine


def test_compress_coalesces_duplicates():
    # entries: (0,1)=1, (0,1)=2 (dup), (1,0)=3, sentinel-invalid tail
    rows = jnp.asarray([0, 0, 1, 2], jnp.int32)   # row 2 == m (invalid)
    cols = jnp.asarray([1, 1, 0, 0], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 3.0, 9.0], jnp.float32)
    valid = jnp.asarray([True, True, True, False])
    out_vals, out_rows, out_cols, rowptr, nnz = engine.compress(
        rows, cols, vals, valid, m=2, out_capacity=4)
    assert int(nnz) == 2
    np.testing.assert_array_equal(np.asarray(out_vals), [3.0, 3.0, 0, 0])
    np.testing.assert_array_equal(np.asarray(out_rows), [0, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(out_cols), [1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(rowptr), [0, 1, 2])


def test_symbolic_compress_counts():
    rows = jnp.asarray([0, 0, 1, 1], jnp.int32)
    cols = jnp.asarray([0, 0, 0, 1], jnp.int32)
    valid = jnp.asarray([True, True, True, True])
    rowptr, nnz = engine.symbolic_compress(rows, cols, valid, m=2)
    assert int(nnz) == 3
    np.testing.assert_array_equal(np.asarray(rowptr), [0, 1, 3])


def test_expansion_maps_enumerate_flops():
    # A: row0 -> cols {1}, row1 -> cols {0,1}; B row lengths [1, 2]
    a_rowptr = jnp.asarray([0, 1, 3], jnp.int32)
    a_colind = jnp.asarray([1, 0, 1], jnp.int32)
    a_mask = jnp.asarray([True, True, True])
    b_rowptr = jnp.asarray([0, 1, 3], jnp.int32)
    a_idx, b_idx, rows, valid = engine.expansion_maps(
        a_rowptr, a_colind, a_mask, b_rowptr,
        a_capacity=3, b_capacity=3, e_capacity=8, m=2)
    # flops: A(0,1)xB-row1 (2 entries) + A(1,0)xB-row0 (1) + A(1,1)x2
    assert int(valid.sum()) == 5
    np.testing.assert_array_equal(np.asarray(rows)[:5], [0, 0, 1, 1, 1])


def test_segment_ids_from_ptr_padding():
    ptr = jnp.asarray([0, 2, 2, 5], jnp.int32)
    ids = engine.segment_ids_from_ptr(ptr, capacity=7)
    np.testing.assert_array_equal(np.asarray(ids), [0, 0, 2, 2, 2, 3, 3])
