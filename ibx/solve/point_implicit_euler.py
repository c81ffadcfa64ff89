"""Point-implicit pseudo-time stepping for the Euler march.

The reference ships this solver as orphaned capability
(``src/point_implicit.jl``, never included by the main module; named a
north-star requirement by the driver). Here it runs on the real physics:
one backward-Euler pseudo step solves

    (I / dt - dR/dQ) dQ = R(Q_n)

with Hutchinson-estimated block-diagonal preconditioning and the
two-direction minimal-residual descent, all matrix-free via exact JVPs
through the fused block RHS. Large pseudo-CFL steps become possible where
the explicit march is CFL-limited.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.block_ops import euler_rhs_block
from ..physics.fluid import (Fluid, physicality_guard, primitive2state,
                             state2primitive)
from ..solve.euler import local_timestep
from ..topology.blocks import BlockTables
from .point_implicit import linearize, solve


def point_implicit_step(
    bt: BlockTables,
    fluid: Fluid,
    P,
    apply_bcs: Callable,
    *,
    cfl: float = 10.0,
    active=None,
    n_hutchinson_samples: int = 8,
    n_krylov: int = 8,
    relax: float = 1.0,
    high_order: bool = True,
    freeze_limiter: bool = False,
    key=None,
):
    """One backward-Euler pseudo step with point-implicit preconditioning.

    ``freeze_limiter=True`` linearizes through the frozen-gradient/sensor
    RHS (minmod arguments and JST sensor held at their Q_n values): the
    limiter's kinks make the exact Jacobian wildly indefinite on shocked
    meshes, which is what made implicit CFLs diverge in round 2. The
    step's RIGHT-hand side is unchanged (the frozen residual equals the
    true residual AT Q_n), only the Jacobian-vector products smooth out —
    the classical frozen-coefficient implicit linearization.

    Returns (P_new, linear_residual_ratio). Jit-compatible.
    """
    Qn = primitive2state(fluid, jnp.asarray(P))

    # pseudo-time scale from the explicit bound, relaxed by the implicit CFL
    Pb = apply_bcs(physicality_guard(state2primitive(fluid, Qn)))
    _, dt, frozen_n = euler_rhs_block(bt, fluid, Pb, with_dt=True, cfl=cfl,
                                      high_order=high_order)
    frozen = frozen_n if freeze_limiter else None

    def residual(Q):
        Pq = physicality_guard(state2primitive(fluid, Q))
        Pq = apply_bcs(Pq)
        R = euler_rhs_block(bt, fluid, Pq, high_order=high_order,
                            frozen=frozen)
        if active is not None:
            R = R * active[:, None]
        return R
    if active is not None:
        dt = dt * active + (1.0 - active)  # frozen cells: dt=1, R=0
    inv_dt = (1.0 / dt)[:, None]

    def g(Q):
        return (Q - Qn) * inv_dt - residual(Q)

    A, b, prec = linearize(g, Qn, n_hutchinson_samples=n_hutchinson_samples,
                           key=key)
    dQ, ratio = solve(A, b, prec, n_iter=n_krylov, rtol=1e-2)
    Q1 = Qn + relax * dQ
    P1 = apply_bcs(physicality_guard(state2primitive(fluid, Q1)))
    return P1, ratio
