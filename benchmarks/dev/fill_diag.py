"""Fill diagnostic: native vs python route2 packers on uniform patterns.

Host-only (no device). Prints fill + chunk counts per case; optional
single-cell per-chunk occupancy dump with SPBLAS_DIAG_CELL=1.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spblas_tpu.kernels import route2 as r2
from spblas_tpu.utils.generate import generate_csr


def build(m, deg, g, use_native, seed=0):
    a = generate_csr(m, m, m * deg, seed=seed)
    rp, ci, v = (np.asarray(a.rowptr), np.asarray(a.colind),
                 np.asarray(a.values))
    if not use_native:
        from spblas_tpu import native
        orig = native.route2_pack
        native.route2_pack = lambda *a, **k: None
        try:
            A = r2._build_route2_arrays(rp, ci, v, (m, m), m * deg, g=g)
        finally:
            native.route2_pack = orig
    else:
        A = r2._build_route2_arrays(rp, ci, v, (m, m), m * deg, g=g)
    return A


if __name__ == "__main__":
    m = int(os.environ.get("DIAG_M", 300_000))
    deg = int(os.environ.get("DIAG_DEG", 10))
    g = int(os.environ.get("DIAG_G", 0)) or None
    for nat in (True, False):
        A = build(m, deg, g, nat)
        nch = len(A["tiles"])
        print(f"native={nat} m={m} deg={deg} g={A['g']} "
              f"fill={A['fill']:.3f} chunks={nch} "
              f"aux_chunks={A['n_aux_chunks']}")
