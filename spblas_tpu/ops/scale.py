"""scale — eager alpha-scaling of a tensor's values.

Functional analogue of the reference's in-place ``scale``
(include/spblas/algorithms/scale_impl.hpp:12-30: ``values(t) *= alpha``):
returns a new container/array with scaled values.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

def scale(alpha, t):
    alpha = jnp.asarray(alpha)
    if dataclasses.is_dataclass(t) and hasattr(t, "values"):
        # every sparse container (CSR/CSC/COO/BSR/DCSR) stores all
        # numerics in .values
        return dataclasses.replace(t, values=t.values * alpha)
    return jnp.asarray(t) * alpha
