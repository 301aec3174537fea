"""Banded-panel Pallas kernel: band SpMV/SpMM as dense MXU contractions.

Why this exists (measured on TPU v5e): XLA's per-element gather/scatter
runs ~0.13 G elem/s — three orders of magnitude under HBM roofline — so
any gather-based SpMV formulation is dead on arrival.  For banded
matrices the structure removes indices entirely: 128-row blocks of a
band with half-width h touch only columns [i*128 - h, i*128 + 127 + h],
so each block is a dense (128, W) panel (W = 128 + 2*ceil(h/64)*64,
windows 64-aligned) and SpMV becomes a stream of (128, W) @ (W,) MXU
contractions with x resident in VMEM.

Traffic ≈ W/(2h+1) * 4 bytes per true nonzero (≈10 B/nnz at h=50),
i.e. at or above the CSR 12 B/nnz roofline line that BASELINE.md tracks,
with zero index loads.  The Pallas grid pipeline double-buffers panel
loads automatically via the blocked input spec.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spblas_tpu.formats.csr import CSR, host_row_ids
from spblas_tpu.types import on_tpu as _on_tpu, no_x64

_R = 128  # rows per panel
_G = 8    # panels per grid program (amortizes per-program grid cost)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandPlan:
    """panels (nblk * 128, W): row-block i's dense band window;
    pad_l: left extent (64-aligned) such that panel column c maps to
    global column i*128 + c - pad_l."""

    panels: jax.Array
    pad_l: int = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def width(self) -> int:
        return int(self.panels.shape[1])

    @property
    def nblocks(self) -> int:
        return int(self.panels.shape[0]) // _R


def band_halfwidth(a: CSR) -> int:
    """Max |col - row| over live entries (host-side, numpy only)."""
    nnz = int(a.nnz)
    if nnz == 0:
        return 0
    rows = host_row_ids(a.rowptr, nnz, a.shape[0])
    cols = np.asarray(a.colind)[:nnz]
    return int(np.abs(cols - rows).max())


def build_band_plan(a: CSR, dtype=None) -> BandPlan:
    """Host inspect: re-lay the band into dense 128-row panels.

    nblk is padded to a multiple of 8 so the kernels can process 8
    panels per grid program (amortizing the ~1.5 us/program grid cost
    that would otherwise dominate this bandwidth-bound kernel).

    ``dtype`` overrides panel storage (e.g. jnp.bfloat16 halves the
    streamed bytes per nonzero; accumulation stays f32 in-kernel)."""
    m, n = a.shape
    nnz = int(a.nnz)
    h = band_halfwidth(a)
    # exact extent: window starts stay 128-aligned regardless of pad_l
    # because xp is shifted by pad_l, and the panel's lane dim may be any
    # size when the block spans the whole dimension
    pad_l = h
    # sublane-dim slice sizes must be 8-aligned on TPU (Mosaic tiling)
    w = -(-(_R + 2 * pad_l) // 8) * 8
    nblk = -(-m // _R)
    nblk = -(-nblk // _G) * _G
    panels = np.zeros((nblk * _R, w), dtype=np.asarray(a.values).dtype)
    rows = host_row_ids(a.rowptr, nnz, m)
    cols = np.asarray(a.colind)[:nnz]
    vals = np.asarray(a.values)[:nnz]
    # panel-local column: global col - (block_start - pad_l)
    c_loc = cols - (rows // _R) * _R + pad_l
    keep = (c_loc >= 0) & (c_loc < w)
    if not keep.all():
        raise ValueError("entry outside declared band window")
    panels[rows, c_loc] = vals
    if dtype is not None:
        # convert on host so the device upload moves the narrow type
        panels = panels.astype(jnp.dtype(dtype))
    return BandPlan(panels=jnp.asarray(panels), pad_l=pad_l,
                    shape=(m, n))


def _spmv_kernel(panel_ref, xp_ref, out_ref, *, w):
    # one program handles _G consecutive panels.  The inner op is VPU
    # elementwise + lane reduction, NOT a dot: an M=1 MXU matmul is
    # latency-bound (~1.3 us per panel measured), while the VPU form is
    # bandwidth-bound on the panel stream.
    i = pl.program_id(0)
    base = i * _G * _R
    for s in range(_G):
        xwin = xp_ref[0, pl.ds(base + s * _R, w)]       # (w,)
        panel = panel_ref[pl.ds(s * _R, _R), :].astype(jnp.float32)
        out_ref[s, :] = jnp.sum(panel * xwin[None, :], axis=1)




@no_x64
def band_spmv_padded(panels: jax.Array, xp: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """Core panel sweep over pre-padded x (len >= nblk*128 + w - 128).

    Exposed for the distributed path, where xp = [left halo | local x |
    right halo] arrives from ppermute instead of zero padding."""
    nblk = panels.shape[0] // _R
    w = panels.shape[1]
    if interpret is None:
        interpret = not _on_tpu()
    y = pl.pallas_call(
        functools.partial(_spmv_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((nblk, _R), jnp.float32),
        grid=(nblk // _G,),
        in_specs=[
            pl.BlockSpec((_G * _R, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_G, _R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(panels, xp[None, :].astype(jnp.float32))
    return y.reshape(nblk * _R)


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_spmv(plan: BandPlan, x: jax.Array,
              interpret: bool | None = None) -> jax.Array:
    """y = A @ x over the panel layout; x zero-padded into VMEM."""
    m, n = plan.shape
    w = plan.width
    nblk = plan.nblocks
    if interpret is None:
        interpret = not _on_tpu()
    # pad-or-trim so window [i*128, i*128 + w) is always in bounds;
    # for wide matrices (n > nblk*128 + w - pad_l) the tail columns can
    # hold no band entries, so trimming is exact
    L = nblk * _R - _R + w
    xp = jnp.pad(x, (plan.pad_l, max(0, L - plan.pad_l - n)))[:L]
    y = band_spmv_padded(plan.panels, xp, interpret=interpret)
    return y[:m].astype(jnp.result_type(plan.panels.dtype, x.dtype))


def _spmm_kernel(panel_ref, bp_ref, out_ref, *, w):
    i = pl.program_id(0)
    base = i * _G * _R
    for s in range(_G):
        bwin = bp_ref[pl.ds(base + s * _R, w), :]
        out_ref[pl.ds(s * _R, _R), :] = jax.lax.dot_general(
            panel_ref[pl.ds(s * _R, _R), :].astype(jnp.float32), bwin,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@no_x64
def band_spmm_padded(panels: jax.Array, bp: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """Core panel SpMM over pre-padded B (rows >= nblk*128 + w - 128) —
    the distributed path's entry point (halos arrive from ppermute)."""
    nblk = panels.shape[0] // _R
    w = panels.shape[1]
    k = bp.shape[1]
    if interpret is None:
        interpret = not _on_tpu()
    return pl.pallas_call(
        functools.partial(_spmm_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((nblk * _R, k), jnp.float32),
        grid=(nblk // _G,),
        in_specs=[
            pl.BlockSpec((_G * _R, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_G * _R, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(panels, bp.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_spmm(plan: BandPlan, b: jax.Array,
              interpret: bool | None = None) -> jax.Array:
    """C = A @ B (dense B) over the panel layout.

    B is padded and kept in VMEM whole — suitable while (n + w) * k * 4
    fits (~10 MB); larger operands should tile B (future work).
    """
    m, n = plan.shape
    w = plan.width
    k = b.shape[1]
    nblk = plan.nblocks
    if interpret is None:
        interpret = not _on_tpu()
    L = nblk * _R - _R + w
    bp = jnp.pad(b, ((plan.pad_l, max(0, L - plan.pad_l - n)),
                     (0, 0)))[:L]
    c = band_spmm_padded(plan.panels, bp, interpret=interpret)
    return c[:m].astype(jnp.result_type(plan.panels.dtype, b.dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PermutedBandPlan:
    """RCM-reordered band plan for general square matrices.

    On TPU, per-element gather runs ~0.13 G elem/s, so generic sparsity
    is restructured: the native RCM inspector (spblas_tpu.native.rcm)
    finds a low-bandwidth symmetric ordering P, the permuted matrix
    P·A·Pᵀ becomes dense band panels, and the two permutations are
    applied by `lax.sort` (vectorized keyed sort — NOT gather):
      x_p  = sort by rank  (rank[j] = new position of old j)
      y    = sort by perm  (perm[i] = old position of new i)
    """

    band: BandPlan
    perm: jax.Array   # (mp,) int32, padded with m..mp-1 identities
    rank: jax.Array   # (mp,) int32 inverse

    @property
    def shape(self):
        return self.band.shape


def build_permuted_band_plan(a: CSR, perm=None) -> PermutedBandPlan:
    from spblas_tpu import native

    m, n = a.shape
    if m != n:
        raise ValueError("permuted band plan requires a square matrix")
    nnz = int(a.nnz)
    rowptr = np.asarray(a.rowptr).astype(np.int64)
    colind = np.asarray(a.colind)[:nnz]
    if perm is None:
        perm, _ = native.rcm(m, nnz, rowptr, colind)
    perm = np.asarray(perm)
    rank = np.empty(m, np.int64)
    rank[perm] = np.arange(m)
    # permute the CSR on host (inspect-time cost)
    vals = np.asarray(a.values)[:nnz]
    new_rows = rank[host_row_ids(a.rowptr, nnz, m)]
    new_cols = rank[colind]
    order = np.lexsort((new_cols, new_rows))
    p_rowptr = np.zeros(m + 1, np.int64)
    np.add.at(p_rowptr[1:], new_rows, 1)
    p_rowptr = np.cumsum(p_rowptr)
    pa = CSR.from_arrays(vals[order], p_rowptr, new_cols[order], (m, m),
                         nnz=nnz)
    band = build_band_plan(pa)
    mp = band.nblocks * _R
    perm_p = np.concatenate([perm, np.arange(m, mp)])
    rank_p = np.concatenate([rank, np.arange(m, mp)])
    return PermutedBandPlan(band=band,
                            perm=jnp.asarray(perm_p, jnp.int32),
                            rank=jnp.asarray(rank_p, jnp.int32))


def _permute_by_sort(keys: jax.Array, values: jax.Array) -> jax.Array:
    """values reordered so output[keys[j]] = values[j] — a scatter/gather
    expressed as a keyed sort (fast on TPU where gather isn't)."""
    return jax.lax.sort((keys, values), num_keys=1)[1]


def permuted_band_spmv(plan: PermutedBandPlan, x: jax.Array,
                       interpret: bool | None = None) -> jax.Array:
    m, n = plan.shape
    mp = plan.perm.shape[0]
    x_p = _permute_by_sort(plan.rank, jnp.pad(x, (0, mp - n)))
    y_p = band_spmv(plan.band, x_p[:n], interpret=interpret)
    y = _permute_by_sort(plan.perm,
                         jnp.pad(y_p, (0, mp - y_p.shape[0])))
    return y[:m]


def band_plan_from_diags(diags: jax.Array, offsets, shape,
                         dtype=None) -> BandPlan:
    """Device-side plan construction from DIA storage — zero host
    traffic.

    diags[k, i] = A[i, i + offsets[k]] (0 where out of range).  The
    panel layout satisfies panel[g, r_loc + h + off] = diags[off][g]
    with r_loc = g % 128, i.e. each of the 128 row phases is a statically
    shifted copy of the diagonal block — 128 * (#contiguous offset runs)
    slice updates, all fused by XLA, no gather/scatter.  This is the
    fast path when a banded operator is generated or assembled on
    device (stencils, synthetic benchmarks).
    """
    offs = [int(o) for o in offsets]
    ndiag = len(offs)
    m, n = shape
    if diags.shape != (ndiag, m):
        raise ValueError(f"diags shape {diags.shape} != ({ndiag}, {m})")
    h = max(max(offs), -min(offs), 0)
    pad_l = h
    w = -(-(_R + 2 * h) // 8) * 8   # 8-aligned (Mosaic slice tiling)
    nblk = -(-m // _R)
    nblk = -(-nblk // _G) * _G
    mp = nblk * _R
    out_dtype = dtype or diags.dtype
    dt = jnp.pad(diags.T.astype(out_dtype), ((0, mp - m), (0, 0)))
    dt = dt.reshape(nblk, _R, ndiag)
    # contiguous runs of offsets → one slice update per (row-phase, run)
    runs = []
    s = 0
    for k in range(1, ndiag + 1):
        if k == ndiag or offs[k] != offs[k - 1] + 1:
            runs.append((s, k - s, offs[s]))
            s = k
    panels = jnp.zeros((nblk, _R, w), dtype=out_dtype)
    for r in range(_R):
        for (si, ln, off0) in runs:
            c0 = r + pad_l + off0
            panels = panels.at[:, r, c0:c0 + ln].set(dt[:, r, si:si + ln])
    return BandPlan(panels=panels.reshape(nblk * _R, w), pad_l=pad_l,
                    shape=(m, n))


# --------------------------------------------------------------------- #
# autodiff: custom VJP for the Pallas band SpMV (square plans)
# --------------------------------------------------------------------- #

def _band_windows(xp: jax.Array, nblk: int, w: int) -> jax.Array:
    """windows[i, c] = xp[i*128 + c] — sliding 128-strided windows built
    from reshaped row chunks (no gather)."""
    chunks = -(-w // _R) + 1
    need = (nblk + chunks) * _R
    xq = jnp.pad(xp, (0, max(0, need - xp.shape[0])))
    x2 = xq.reshape(-1, _R)
    return jnp.concatenate(
        [x2[k: k + nblk] for k in range(chunks)], axis=1)[:, :w]


@jax.custom_vjp
def band_spmv_ad(plan: BandPlan, x: jax.Array) -> jax.Array:
    """Differentiable band SpMV (square matrices): forward is the Pallas
    panel kernel; backward computes dx = Aᵀ·dy through the transposed
    panel plan and d(panels) as dense window outer products."""
    return band_spmv(plan, x)


def _band_spmv_fwd(plan, x):
    return band_spmv(plan, x), (plan, x)


def _band_spmv_bwd(res, dy):
    plan, x = res
    m, n = plan.shape
    h = plan.pad_l
    w = plan.width
    nblk = plan.nblocks
    dy = dy.astype(jnp.float32)
    dyp = jnp.pad(dy, (0, nblk * _R - dy.shape[0]))

    # dx: adjoint of the window structure — panel entry (g, c) consumed
    # xp[(g//128)*128 + c], so its cotangent scatters back there.
    # Overlap-add of per-block column sums at stride 128: static slice
    # adds, no scatter (the inverse of _band_windows).
    t = plan.panels.astype(jnp.float32) * dyp[:, None]        # (mp, w)
    blocksum = jnp.sum(t.reshape(nblk, _R, w), axis=1)        # (nblk, w)
    chunks = -(-w // _R)
    bs = jnp.pad(blocksum, ((0, 0), (0, chunks * _R - w)))
    acc = jnp.zeros(((nblk + chunks) * _R,), jnp.float32)
    for k in range(chunks):
        acc = acc.at[k * _R: (k + nblk) * _R].add(
            bs[:, k * _R: (k + 1) * _R].reshape(-1))
    dx = acc[h: h + n].astype(x.dtype)

    # dpanels[g, c] = dy[g] * xp[(g//128)*128 + c]
    Lx = nblk * _R - _R + w
    xp = jnp.pad(x.astype(jnp.float32),
                 (h, max(0, Lx - h - n)))[:Lx]
    win = _band_windows(xp, nblk, w)                  # (nblk, w)
    dpanels = (dyp.reshape(nblk, _R)[:, :, None]
               * win[:, None, :]).reshape(nblk * _R, w)
    dplan = BandPlan(panels=dpanels.astype(plan.panels.dtype),
                     pad_l=h, shape=plan.shape)
    return dplan, dx


band_spmv_ad.defvjp(_band_spmv_fwd, _band_spmv_bwd)


def _spmm_stream_kernel(panel_ref, bp_ref, out_ref, bwin, sem, *, w, k,
                        sw):
    # B superwindow (rows [i*G*128, i*G*128 + sw)) streamed HBM→VMEM
    # with cross-program double buffering (scratch persists across the
    # sequential TPU grid); panels pipeline via their blocked spec.
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    def dma(slot, j):
        return pltpu.make_async_copy(
            bp_ref.at[pl.ds(j * _G * _R, sw), :], bwin.at[slot],
            sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_i)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    slot = i % 2
    for s in range(_G):
        bsub = bwin[slot, pl.ds(s * _R, w), :]
        out_ref[pl.ds(s * _R, _R), :] = jax.lax.dot_general(
            panel_ref[pl.ds(s * _R, _R), :].astype(jnp.float32), bsub,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@no_x64
@functools.partial(jax.jit, static_argnames=("interpret",))
def band_spmm_stream(plan: BandPlan, b: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """C = A @ B with B streamed from HBM (no whole-operand VMEM
    residency — scales to benchmark-size m where band_spmm's resident B
    would overflow VMEM)."""
    m, n = plan.shape
    w = plan.width
    k = b.shape[1]
    nblk = plan.nblocks
    sw = w + (_G - 1) * _R
    if interpret is None:
        interpret = not _on_tpu()
    # last superwindow DMA ends at (nblk//_G - 1)*_G*_R + sw
    #                            == nblk*_R - _R + w
    L = nblk * _R - _R + w
    bp = jnp.pad(b.astype(jnp.float32),
                 ((plan.pad_l, max(0, L - plan.pad_l - n)), (0, 0)))[:L]
    c = pl.pallas_call(
        functools.partial(_spmm_stream_kernel, w=w, k=k, sw=sw),
        out_shape=jax.ShapeDtypeStruct((nblk * _R, k), jnp.float32),
        grid=(nblk // _G,),
        in_specs=[
            pl.BlockSpec((_G * _R, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # B stays in HBM
        ],
        out_specs=pl.BlockSpec((_G * _R, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sw, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(plan.panels, bp)
    return c[:m].astype(jnp.result_type(plan.panels.dtype, b.dtype))


def _power_kernel(panel_ref, x_ref, out_ref, xp, ybuf, *, w, h, mp, L):
    # grid = (iters, nblk // _G): dimension 0 is the iteration count, so
    # the whole Krylov-style chain y = A^iters x runs inside ONE pallas
    # call — panels re-stream from HBM each iteration (double-buffered by
    # the blocked spec), the vector never leaves VMEM, and no per-
    # iteration XLA op overhead exists at all.
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        xp[...] = x_ref[...]

    base = j * _G * _R
    for s in range(_G):
        xwin = xp[0, pl.ds(base + s * _R, w)]
        panel = panel_ref[pl.ds(s * _R, _R), :].astype(jnp.float32)
        ybuf[0, pl.ds(base + s * _R, _R)] = jnp.sum(
            panel * xwin[None, :], axis=1)

    @pl.when(j == nj - 1)
    def _():
        # publish this iteration's result into the padded slot (edges
        # [0, h) and [h+mp, L) stay zero from the initial x padding)
        xp[0, pl.ds(h, mp)] = ybuf[0, :]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = xp[...]


@no_x64
@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def band_power_iterations(plan: BandPlan, x: jax.Array, iters: int,
                          interpret: bool | None = None) -> jax.Array:
    """y = A^iters · x with the entire iteration chain inside one Pallas
    call — the building block for power iteration / Chebyshev /
    stationary smoothers, and the honest speed-of-light measurement of
    the panel kernel (zero per-iteration dispatch)."""
    m, n = plan.shape
    if m != n:
        raise ValueError("band_power_iterations requires a square plan")
    if iters <= 0:
        # A^0 x == x (the pallas grid would run zero programs and
        # return an uninitialized buffer)
        return x
    w = plan.width
    h = plan.pad_l
    nblk = plan.nblocks
    mp = nblk * _R
    L = mp + w - _R
    if interpret is None:
        interpret = not _on_tpu()
    xp0 = jnp.pad(x.astype(jnp.float32),
                  (h, max(0, L - h - n)))[:L][None, :]
    out = pl.pallas_call(
        functools.partial(_power_kernel, w=w, h=h, mp=mp, L=L),
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        grid=(iters, nblk // _G),
        in_specs=[
            pl.BlockSpec((_G * _R, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, L), jnp.float32),
            pltpu.VMEM((1, mp), jnp.float32),
        ],
        interpret=interpret,
    )(plan.panels, xp0)
    return out[0, h: h + m].astype(
        jnp.result_type(plan.panels.dtype, x.dtype))
