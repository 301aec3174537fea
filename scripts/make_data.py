"""Regenerate the checked-in benchmark matrices under data/.

Provenance for every data/ file (the bench environment has no network
egress, so the SuiteSparse-class set is generator exports round-tripped
through the Matrix Market IO path).  Only missing files are written —
delete one to regenerate it.

Run host-side:  JAX_PLATFORMS=cpu python scripts/make_data.py
"""

import gzip
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from spblas_tpu.utils import generate as gen
from spblas_tpu.utils.io import save_matrix_market

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "data")

RECIPES = {
    # mesh family (FEM triangulation graphs + 3D stencil) — seeds must
    # match tests/test_data_matrices.py, which asserts file == generator
    "fem2d_128": lambda: gen.generate_fem_graph_csr(128, 128, seed=9),
    "fem2d_512": lambda: gen.generate_fem_graph_csr(512, 512, seed=7),
    "stencil3d_32": lambda: gen.generate_stencil_csr((32, 32, 32)),
    # power-law web-graph stand-in
    "rmat_32k": lambda: gen.generate_rmat_csr(32_768, 32_768 * 16,
                                              seed=5),
    # scale-free + clustered (Holme-Kim) — genuinely non-mesh,
    # non-RMAT structure (round 5, VERDICT r4 #6)
    "powerlaw_64k": lambda: gen.generate_powerlaw_cluster_csr(
        65_536, attach=8, p_tri=0.5, seed=7),
}


def main():
    os.makedirs(DATA, exist_ok=True)
    for name, recipe in RECIPES.items():
        out = os.path.join(DATA, name + ".mtx.gz")
        if os.path.exists(out):
            print(f"{name}: exists, skipping")
            continue
        a = recipe()
        tmp = out[:-3]
        save_matrix_market(tmp, a)
        with open(tmp, "rb") as src, gzip.open(out, "wb") as dst:
            shutil.copyfileobj(src, dst)
        os.unlink(tmp)
        print(f"{name}: wrote {out} ({int(a.nnz)} nnz)")


if __name__ == "__main__":
    main()
