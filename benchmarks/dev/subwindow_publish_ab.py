"""A/B: marginal chunk cost of sub-window publish machinery (round 4).

The supercell design (ROW_WINDOW 1024 -> 8192 per chunk) needs each
publish slot to carry a 3-bit sub-window id and the kernel to scatter
the (8,128) publish tile into one of 8 stacked y windows.  Before
touching the packer, measure the kernel-side cost on an EXISTING
m=300k plan whose subw bits are all zero (numerics unchanged):

  base  — the production _chunk_body + single (8,128) RMW publish
  maskN — subw-predicated RMW per sub-window (8 masked adds)
  wide  — build a (64,128) update via select ladder, one RMW

Run: python benchmarks/dev/subwindow_publish_ab.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.kernels.route2 import (B_VA, LANES, SUBS,
                                       build_route2_plan)
from spblas_tpu.kernels.route2_kernel import CB, _chunk_body
from spblas_tpu.utils.generate import generate_csr

B_SUBW = 29   # candidate spare bits (home-lane plans use 25 of 32)


def _kernel(sb_ref, yb_ref, fl_ref, t_hbm, v_hbm, x_ref, y_ref,
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
        elif variant == "mask8":
            subw = (t >> B_SUBW) & 7
            for sw in range(8):
                part = jnp.where(subw == sw, upd, 0.0)
                y_ref[pl.ds(yb + sw * SUBS, SUBS), :] = (
                    y_ref[pl.ds(yb + sw * SUBS, SUBS), :] + part)
        elif variant == "wide":
            subw = (t >> B_SUBW) & 7
            parts = [jnp.where(subw == sw, upd, 0.0) for sw in range(8)]
            wide = jnp.concatenate(parts, axis=0)
            y_ref[pl.ds(yb, 8 * SUBS), :] = (
                y_ref[pl.ds(yb, 8 * SUBS), :] + wide)


def dispatch(plan, x2, variant, out_rows):
    nc = plan.nchunks
    nsteps = -(-nc // CB)
    pad = nsteps * CB - nc
    t = jnp.pad(plan.tile, ((0, pad), (0, 0), (0, 0)))
    v = jnp.pad(plan.val, ((0, pad), (0, 0), (0, 0)))
    sb = jnp.pad(plan.slab_base, (0, pad))
    yb = jnp.pad(plan.y_base, (0, pad))
    fl = jnp.pad(plan.src_flag, (0, pad), mode="edge")
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
    )(sb, yb, fl, t, v, x2)


def main():
    m = 300_000
    a = generate_csr(m, m, m * 10, seed=0)
    nnz = int(a.nnz)
    plan = build_route2_plan(np.asarray(a.rowptr), np.asarray(a.colind),
                             np.asarray(a.values), a.shape, nnz,
                             any_lane=False, row_window_mult=1)
    print(f"chunks {plan.nchunks} fill {plan.fill:.3f} g {plan.g} "
          f"aux {plan.n_aux_chunks}")
    assert plan.n_aux_chunks == 0 or True
    out_rows = max(plan.pane_rows, SUBS * plan.g) + 7 * SUBS  # wide slack
    x2 = jnp.zeros((plan.x_rows, LANES), jnp.float32)
    x2 = x2.at[0, 0].set(1.0)

    results = {}
    for variant in ("base", "mask8", "wide", "base"):
        @jax.jit
        def chain(x2v):
            def body(_, c):
                s, xv = c
                y = dispatch(plan, xv, variant, out_rows)
                return (s + y[0, 0], xv * 1.0000001)
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
        results[variant] = per_chunk
        print(f"{variant:6s}: {best/100*1e3:.3f} ms/iter "
              f"= {per_chunk*1e9:.1f} ns/chunk")


if __name__ == "__main__":
    main()
