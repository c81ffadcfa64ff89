"""Attribute the sparse-correction cost: gathers vs scatters vs concats."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ibx.cases import build_rae2822
from ibx.ops import block_ops as bops
from ibx.topology.blocks import build_block_tables

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
    return round((time.time() - t0) / K * 1000, 3)


def main():
    case = build_rae2822(wall_h=1e-3, feature_h=5e-4, cfl=0.7)
    bt = build_block_tables(case.dom)
    P0 = case.P0
    N = bt.n_cells

    o = bt.sp_owner[1]
    n = bt.sp_neighbor[1]
    Fs = o.shape[0]
    print("Fs", Fs, flush=True)

    def keep(f):
        return lambda P: P + 0.0 * f(P)

    print("concat10   ", march_time(
        keep(lambda P: jnp.concatenate([P, P, P[:, :2]], 1)[:, :4]), P0))
    print("gather_o   ", march_time(
        keep(lambda P: jnp.take(P, o, axis=0).sum(0, keepdims=True)), P0))
    print("gather_on  ", march_time(
        keep(lambda P: (jnp.take(P, o, axis=0)
                        + jnp.take(P, n, axis=0)).sum(0, keepdims=True)), P0))
    vals = jnp.ones((Fs, 4))
    print("scatter1   ", march_time(
        keep(lambda P: jnp.zeros((N, 4)).at[o].add(vals * P[0, 0])), P0))
    print("scatter2   ", march_time(
        keep(lambda P: jnp.zeros((N, 4)).at[o].add(vals * P[0, 0])
             .at[n].add(-vals)), P0))
    print("gs_chain   ", march_time(
        keep(lambda P: jnp.zeros((N, 4)).at[o].add(jnp.take(P, o, axis=0))),
        P0))
    # scatter with unique/sorted hints
    print("scatter_u  ", march_time(
        keep(lambda P: jnp.zeros((N, 4)).at[o].add(
            vals * P[0, 0], unique_indices=False, indices_are_sorted=True)),
        P0))


if __name__ == "__main__":
    main()
