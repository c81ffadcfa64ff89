"""Elimination profiling via fori_loop marches (launch-latency-proof).

Each variant marches K iterations of a reduced step inside one executable;
differences between variants attribute device time to step components.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ibx.cases import build_rae2822
from ibx.ops import block_ops as bops
from ibx.physics.fluid import primitive2state, state2primitive
from ibx.topology.blocks import BlockTables, build_block_tables

K = 100


def march_time(fn, P):
    @jax.jit
    def m(P):
        return jax.lax.fori_loop(0, K, lambda _, P: fn(P), P)

    out = m(P)
    jax.block_until_ready(out)
    t0 = time.time()
    out = m(P)
    jax.block_until_ready(out)
    return (time.time() - t0) / K * 1000


def main():
    case = build_rae2822(wall_h=5e-4, feature_h=2.5e-4, cfl=0.7, block_size=16)
    bt = build_block_tables(case.dom)
    fluid = case.fluid
    P0 = case.P0

    import dataclasses as _dc
    e_i = tuple(tuple(jnp.zeros((0,), jnp.int32) for _ in range(2))
                for _ in range(bt.nd))
    e_c = tuple(tuple(jnp.zeros((0, 2), jnp.int32) for _ in range(2))
                for _ in range(bt.nd))
    bt_dense = _dc.replace(
        bt,
        fs_block=e_i, fs_coarse=e_i, fs_off=e_i,
        cs_block=e_i, cs_fine=e_c,
    )

    def keepP(f):
        # march-able: apply f, keep P shape
        return lambda P: P + 0.0 * f(P)

    print("full_step        ",
          march_time(lambda P: case.step(P)[0], P0), "ms")
    print("rhs_full_x2      ",
          march_time(keepP(lambda P: bops.euler_rhs_block(bt, fluid, P)
                           + bops.euler_rhs_block(bt, fluid, P * 1.001)), P0),
          "ms")
    print("rhs_full         ",
          march_time(keepP(lambda P: bops.euler_rhs_block(bt, fluid, P)), P0),
          "ms")
    print("rhs_dense_only   ",
          march_time(keepP(lambda P: bops.euler_rhs_block(bt_dense, fluid, P)),
                     P0), "ms")
    print("bcs              ",
          march_time(lambda P: case.apply_bcs(P), P0), "ms")
    print("transforms       ",
          march_time(lambda P: state2primitive(
              fluid, primitive2state(fluid, P)), P0), "ms")


if __name__ == "__main__":
    main()
