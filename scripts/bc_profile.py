"""BC path sub-profiling: interp gather vs BC math vs ghost scatter."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ibx.cases import build_rae2822
from ibx.physics.bc import apply_flow_bc, flow_bc

K = 200


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
    dom = case.dom
    fb = dom.fused_boundary(["farfield", "wall"])
    G = int(fb.ghost.shape[0])
    print(f"cells={dom.ncells} ghosts={G} stencil_width={fb.interp.width}")

    fluid = case.fluid
    P0 = case.P0
    farfield_bc = flow_bc(fluid, case.P_inf)
    wall_bc = flow_bc(fluid, [float(case.P_inf[0]), 288.15, 0.0],
                      normal_flow=True)

    def keep(f):
        return lambda P: P + 0.0 * f(P).sum() * 0.0

    # full BC
    print("bc_full      ", march_time(case.apply_bcs, P0), "ms")

    # interp gather only
    def interp_only(P):
        Pi = fb.interp(P)
        return P.at[:1].add(0.0 * Pi.sum())
    print("interp_only  ", march_time(interp_only, P0), "ms")

    # interp + math, no scatter
    def no_scatter(P):
        Pi = fb.interp(P)
        r = jnp.where(
            (fb.family == 1)[:, None],
            apply_flow_bc(wall_bc, Pi, fb.normals),
            apply_flow_bc(farfield_bc, Pi, fb.normals),
        )
        g = fb.eta * Pi + (1.0 - fb.eta) * r
        return P.at[:1].add(0.0 * g.sum())
    print("no_scatter   ", march_time(no_scatter, P0), "ms")

    # scatter only (constant values)
    gconst = jnp.zeros((G, 4), jnp.float32)

    def scatter_only(P):
        return P.at[fb.ghost].set(
            gconst + P[:1].sum() * 0.0,
            unique_indices=True, indices_are_sorted=True,
        )
    print("scatter_only ", march_time(scatter_only, P0), "ms")

    # gather of G wide block rows for scale (what G block-rows would cost)
    P3 = P0.reshape(-1, 256 * 4)
    rows = jnp.asarray(
        np.random.randint(0, P3.shape[0], size=G // 256 + 1), jnp.int32)

    def blockrow_gather(P):
        P3v = P.reshape(-1, 256 * 4)
        got = jnp.take(P3v, rows, axis=0)
        return P.at[:1].add(0.0 * got.sum())
    print("blockrow_gth ", march_time(blockrow_gather, P0), "ms",
          f"({rows.shape[0]} rows)")


if __name__ == "__main__":
    main()
