"""Sharded (multi-device) RAE2822 Euler step.

Same physics as :mod:`ibx.cases.rae2822`, executed as one shard_map over a
1-D device mesh with halo exchange between BC families and RK stages.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel import ShardedDomain, make_device_mesh, sharded_impose_bc
from ..physics.bc import apply_flow_bc, flow_bc
from ..physics.fluid import make_fluid, primitive2state, state2primitive
from ..solve.euler import euler_rhs, local_timestep
from .rae2822 import build_rae2822


def build_rae2822_sharded(
    n_devices: int,
    *,
    wall_h: float = 4e-2,
    feature_h: float = 2e-2,
    cfl: float = 0.7,
    **kwargs,
):
    """Returns (sharded_domain, jitted step on sharded state, sharded P0)."""
    case = build_rae2822(
        wall_h=wall_h, feature_h=feature_h, cfl=cfl,
        n_partitions=n_devices, **kwargs,
    )
    mesh = make_device_mesh(n_devices)
    sdom = ShardedDomain(case.dom, mesh)

    fluid = case.fluid
    farfield_bc = flow_bc(fluid, case.P_inf)
    wall_bc = flow_bc(
        fluid, [float(case.P_inf[0]), float(case.P_inf[1]), 0.0],
        normal_flow=True,
    )

    def sharded_step(ctx, P):
        part = ctx.part

        def apply_bcs(P):
            P = sharded_impose_bc(
                ctx, ctx.boundary("farfield"),
                lambda b, Pi: apply_flow_bc(farfield_bc, Pi, b.normals), P,
            )
            P = ctx.refresh(P)
            P = sharded_impose_bc(
                ctx, ctx.boundary("wall"),
                lambda b, Pi: apply_flow_bc(wall_bc, Pi, b.normals), P,
            )
            return ctx.refresh(P)

        P = apply_bcs(P)
        dt = local_timestep(part, fluid, P, cfl)[:, None]
        Q0 = primitive2state(fluid, P)
        R0 = euler_rhs(part, fluid, P)
        P1 = apply_bcs(state2primitive(fluid, Q0 + dt * R0))
        R1 = euler_rhs(part, fluid, P1)
        P2 = state2primitive(fluid, Q0 + dt * (R0 + R1) / 2)
        return apply_bcs(P2)

    step = jax.jit(sdom.shard_fn(sharded_step))
    P0_sharded = sdom.distribute(np.asarray(case.P0))
    return sdom, step, P0_sharded, case
