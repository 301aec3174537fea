"""scale — eager alpha-scaling of a tensor's values.

Functional analogue of the reference's in-place ``scale``
(include/spblas/algorithms/scale_impl.hpp:12-30: ``values(t) *= alpha``):
returns a new container/array with scaled values.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from spblas_tpu.formats.csr import CSR
from spblas_tpu.formats.csc import CSC
from spblas_tpu.formats.coo import COO


def scale(alpha, t):
    alpha = jnp.asarray(alpha)
    if isinstance(t, (CSR, CSC, COO)):
        return dataclasses.replace(t, values=t.values * alpha)
    return jnp.asarray(t) * alpha
