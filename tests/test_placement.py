"""Unit tests for the batched device-placement helper."""

import numpy as np

from spblas_tpu.utils.placement import device_put_batch


def test_device_put_batch_order_and_dtype():
    a = np.arange(5, dtype=np.int32)
    b = np.linspace(0, 1, 4, dtype=np.float32)
    da, db = device_put_batch(a, b)
    np.testing.assert_array_equal(np.asarray(da), a)
    np.testing.assert_array_equal(np.asarray(db), b)
    assert str(da.dtype) == "int32" and str(db.dtype) == "float32"


def test_device_put_batch_many_mixed():
    arrays = [np.full((3, 4), i, np.float32) for i in range(6)]
    arrays += [np.arange(i + 1, dtype=np.int32) for i in range(6)]
    out = device_put_batch(*arrays)
    assert len(out) == 12
    for got, want in zip(out, arrays):
        np.testing.assert_array_equal(np.asarray(got), want)
