"""Which dynamic dim-0 VMEM slice forms does Mosaic accept? (round 3)"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_form(name, kernel):
    @jax.jit
    def run(idx, x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((64, 256), lambda k, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, 256), lambda k, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
        )(idx, x)

    try:
        out = run(jnp.asarray([9], jnp.int32),
                  jnp.ones((64, 256), jnp.float32))
        jax.block_until_ready(out)
        print(f"{name:44s} OK", flush=True)
    except Exception as e:  # noqa
        msg = str(e).replace("\n", " ")[:110]
        print(f"{name:44s} FAIL {msg}", flush=True)


def k_store8(idx_ref, x_ref, o_ref):
    o_ref[...] = jnp.zeros_like(o_ref)
    i = idx_ref[0] & ~7
    o_ref[pl.ds(i, 8), :] = x_ref[pl.ds(0, 8), :]


def k_store8_unaligned(idx_ref, x_ref, o_ref):
    o_ref[...] = jnp.zeros_like(o_ref)
    i = idx_ref[0]  # 9: misaligned
    o_ref[pl.ds(i, 8), :] = x_ref[pl.ds(0, 8), :]


def k_load1_dyn(idx_ref, x_ref, o_ref):
    i = idx_ref[0]
    o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[pl.ds(0, 1), :] = x_ref[pl.ds(i, 1), :]


def k_store1_dyn(idx_ref, x_ref, o_ref):
    i = idx_ref[0]
    o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[pl.ds(i, 1), :] = x_ref[pl.ds(0, 1), :]


def k_store1_static3(idx_ref, x_ref, o_ref):
    o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[pl.ds(3, 1), :] = x_ref[pl.ds(0, 1), :]


def k_load8_dyn_unaligned(idx_ref, x_ref, o_ref):
    i = idx_ref[0]
    o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[pl.ds(0, 8), :] = x_ref[pl.ds(i, 8), :]


def k_roll_dyn(idx_ref, x_ref, o_ref):
    i = idx_ref[0]
    o_ref[...] = pltpu.roll(x_ref[...], -i, 0)


def main():
    try_form("store (8,K) dyn aligned (route2 form)", k_store8)
    try_form("store (8,K) dyn value-misaligned", k_store8_unaligned)
    try_form("load  (1,K) dyn", k_load1_dyn)
    try_form("store (1,K) dyn", k_store1_dyn)
    try_form("store (1,K) static offset 3", k_store1_static3)
    try_form("load  (8,K) dyn (value 9, no proof)", k_load8_dyn_unaligned)
    try_form("pltpu.roll dynamic shift", k_roll_dyn)


if __name__ == "__main__":
    main()
