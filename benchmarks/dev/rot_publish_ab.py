"""A/B: kernel cost of per-chunk PUBLISH-POSITION ROTATION (round 5,
VERDICT r4 #5 — the supercell residual-wall attack, measured before
committing to the packer rework).

Design under test: each chunk carries a rotation scalar rho; publish
positions become ((lr & 1023) + rho) & 1023, re-hashing both the
1024-class position collisions AND the per-lane Poisson imbalance per
chunk.  The kernel must un-rotate the publish tile (and, at W>1, the
sub-window field tile) before the wide RMW: one lane gather + two
sublane gathers + a select per rotated tile.

This script measures that un-rotation's marginal ns/chunk on an
existing W=1 plan with rho=0 everywhere (numerics unchanged), next to
the production base and the W=8 wide ladder.  Combined with the
packing simulation (/tmp-class sim recorded in PERF_NOTES round 5):
fill 0.373 -> 0.42 (d=1 rotation) / 0.56 (d=2), so the attack pays
only if un-rotation costs well under ~15 ns (d=1) / ~35 ns (d=2).

Run: python benchmarks/dev/rot_publish_ab.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.kernels.route2 import (LANES, SUBS, build_route2_plan)
from spblas_tpu.kernels.route2_kernel import CB, _chunk_body
from spblas_tpu.utils.generate import generate_csr

B_SUBW = 29


def _unrotate(tile, rho):
    """Destination-indexed flat 1024-roll of an (8,128) tile by the
    traced scalar rho: T[p] = tile[(p + rho) & 1023]."""
    rlo = rho & 127
    rhi = rho >> 7
    jj = jnp.broadcast_to(jnp.arange(LANES)[None, :], (SUBS, LANES))
    ii = jnp.broadcast_to(jnp.arange(SUBS)[:, None], (SUBS, LANES))
    lane_src = (jj + rlo) & 127
    a1 = jnp.take_along_axis(tile, lane_src, axis=1)
    ta = jnp.take_along_axis(a1, (ii + rhi) & 7, axis=0)
    tb = jnp.take_along_axis(a1, (ii + rhi + 1) & 7, axis=0)
    return jnp.where((jj + rlo) >= LANES, tb, ta)


def _kernel(sb_ref, yb_ref, rho_ref, t_hbm, v_hbm, x_ref, y_ref,
            t_buf, v_buf, t_sem, v_sem, *, g, dist_max, variant):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    def dmas(slot, e):
        return (
            pltpu.make_async_copy(t_hbm.at[pl.ds(e * CB, CB)],
                                  t_buf.at[slot], t_sem.at[slot]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(e * CB, CB)],
                                  v_buf.at[slot], v_sem.at[slot]),
        )

    @pl.when(k == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)
        for d in dmas(0, 0):
            d.start()

    slot = jax.lax.rem(k, 2)

    @pl.when(k + 1 < nk)
    def _():
        for d in dmas(1 - slot, k + 1):
            d.start()

    for d in dmas(slot, k):
        d.wait()

    for i in range(CB):
        ci = k * CB + i
        t = t_buf[slot, i]
        slab = x_ref[pl.ds(sb_ref[ci], SUBS * g), :]
        upd = _chunk_body(t, v_buf[slot, i], slab, g, dist_max, False)
        yb = yb_ref[ci]
        if variant == "base":
            y_ref[pl.ds(yb, SUBS), :] = y_ref[pl.ds(yb, SUBS), :] + upd
        elif variant == "rot_w1":
            upd = _unrotate(upd, rho_ref[ci])
            y_ref[pl.ds(yb, SUBS), :] = y_ref[pl.ds(yb, SUBS), :] + upd
        elif variant == "wide8":
            subw = (t >> B_SUBW) & 7
            parts = [jnp.where(subw == sw, upd, 0.0) for sw in range(8)]
            wide = jnp.concatenate(parts, axis=0)
            y_ref[pl.ds(yb, 8 * SUBS), :] = (
                y_ref[pl.ds(yb, 8 * SUBS), :] + wide)
        elif variant == "rot_w8":
            rho = rho_ref[ci]
            upd = _unrotate(upd, rho)
            subw = _unrotate(t, rho) >> B_SUBW & 7
            parts = [jnp.where(subw == sw, upd, 0.0) for sw in range(8)]
            wide = jnp.concatenate(parts, axis=0)
            y_ref[pl.ds(yb, 8 * SUBS), :] = (
                y_ref[pl.ds(yb, 8 * SUBS), :] + wide)
        elif variant == "rot2_w8":
            # d=2 candidate rotations: publishes carry a 1-bit selector
            # (spare bit 28); both classes un-rotate separately
            rho = rho_ref[ci]
            sel = (t >> 28) & 1
            u0 = _unrotate(jnp.where(sel == 0, upd, 0.0), rho & 1023)
            u1 = _unrotate(jnp.where(sel == 1, upd, 0.0), rho >> 10)
            upd = u0 + u1
            subw = ((_unrotate(t, rho & 1023) >> B_SUBW) & 7)
            parts = [jnp.where(subw == sw, upd, 0.0) for sw in range(8)]
            wide = jnp.concatenate(parts, axis=0)
            y_ref[pl.ds(yb, 8 * SUBS), :] = (
                y_ref[pl.ds(yb, 8 * SUBS), :] + wide)


def dispatch(plan, rho, x2, variant, out_rows):
    nc = plan.nchunks
    nsteps = -(-nc // CB)
    pad = nsteps * CB - nc
    t = jnp.pad(plan.tile, ((0, pad), (0, 0), (0, 0)))
    v = jnp.pad(plan.val, ((0, pad), (0, 0), (0, 0)))
    sb = jnp.pad(plan.slab_base, (0, pad))
    yb = jnp.pad(plan.y_base, (0, pad))
    rhop = jnp.pad(rho, (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((plan.x_rows, LANES), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, CB, SUBS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, g=plan.g, dist_max=plan.dist_max,
                          variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32),
    )(sb, yb, rhop, t, v, x2)


def main():
    m = 300_000
    a = generate_csr(m, m, m * 10, seed=0)
    nnz = int(a.nnz)
    plan = build_route2_plan(np.asarray(a.rowptr), np.asarray(a.colind),
                             np.asarray(a.values), a.shape, nnz,
                             any_lane=False, row_window_mult=1)
    print(f"chunks {plan.nchunks} fill {plan.fill:.3f} g {plan.g} "
          f"aux {plan.n_aux_chunks}", flush=True)
    out_rows = max(plan.pane_rows, SUBS * plan.g) + 7 * SUBS
    rho = jnp.zeros((plan.nchunks,), jnp.int32)   # identity rotations
    x2 = jnp.zeros((plan.x_rows, LANES), jnp.float32)
    x2 = x2.at[0, 0].set(1.0)

    for variant in ("base", "rot_w1", "wide8", "rot_w8", "rot2_w8",
                    "base"):
        @jax.jit
        def chain(x2v):
            def body(_, c):
                s, xv = c
                y = dispatch(plan, rho, xv, variant, out_rows)
                return (s + y.sum(), xv * 1.0000001)
            return jax.lax.fori_loop(0, 100, body, (jnp.float32(0), x2v))

        jax.block_until_ready(chain(x2))
        best = float("inf")
        for r in range(3):
            xr = x2 + jnp.float32(r) * 1e-6
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            out = chain(xr)
            jax.block_until_ready(out)
            float(out[0])
            best = min(best, time.perf_counter() - t0)
        per_chunk = best / 100 / plan.nchunks
        print(f"{variant:8s}: {best/100*1e3:.3f} ms/iter "
              f"= {per_chunk*1e9:.1f} ns/chunk", flush=True)


if __name__ == "__main__":
    main()
