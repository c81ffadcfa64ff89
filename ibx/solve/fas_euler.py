"""FAS multigrid acceleration wired to the compressible Euler march.

Composes the domain hierarchy (`ibx.solve.multigrid_domain`), the FAS driver
(`ibx.solve.fas`) and the Euler residual into a jitted cycle: the fine-level
fixed point is the local-dt explicit update ``Q += dt * R(Q)``, coarse levels
relax the tau-corrected problem on the same physics (reference pattern:
``src/solver.jl`` + ``README.md:392-395``).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..physics.fluid import (Fluid, physicality_guard,
                             primitive2state, state2primitive)
from ..topology.domain import Domain
from .euler import euler_rhs, local_timestep, rk2_step
from .fas import fas
from .multigrid_domain import DomainHierarchy, multigrid


class FasEuler:
    """FAS-accelerated pseudo-time Euler solver over a domain hierarchy.

    ``make_bcs(dom) -> (P -> P)`` builds the ghost-BC application for any
    level's domain; ``inside_fn(centers) -> bool[N]`` (optional) marks cells
    inside solid bodies to freeze, per level.

    ``smoother``: the per-level relaxation map handed to the FAS driver.

      * ``"euler"`` — the reference recipe's forward-Euler local-dt fixed
        point ``Q += dt*R(Q)``.  Measured LINEARLY UNSTABLE on smooth
        subsonic cases (scripts/fas_smoother_probe.py, round 4): where the
        JST-style sensor is quiescent the face blend ``PL*D + (1-D)*uf``
        degenerates to an undissipated central flux, and forward Euler on
        central convection amplifies grid-frequency modes at ANY cfl
        (0.5 and 0.35 both diverged; a guarded-projection variant only
        bounds the blow-up).  Kept as the reference-parity mode for model
        problems with active dissipation.
      * ``"rk2"`` — the production TVD-RK2 map as the fixed point,
        ``r = RK2(Q) - Q`` (same stationary points: r = 0 iff dt*R = 0);
        stable wherever the production march is, which is what makes a
        wall-clock FAS-vs-smoothing comparison meaningful.
    """

    def __init__(
        self,
        dom: Domain,
        fluid: Fluid,
        make_bcs: Callable,
        *,
        max_levels: int = 2,
        cfl: float = 0.5,
        high_order: bool = True,
        inside_fn: Optional[Callable] = None,
        smoother: str = "euler",
    ):
        self.fluid = fluid
        self.cfl = cfl
        self.high_order = high_order
        assert smoother in ("euler", "rk2")
        self.smoother = smoother
        hier = multigrid(dom, max_levels)
        self.domains: List[Domain] = [dom] + list(hier.coarse_domains)
        self.coarseners = list(hier.coarseners)
        self.prolongators = list(hier.prolongators)
        self.bcs = [make_bcs(d) for d in self.domains]
        self.active = []
        for d in self.domains:
            if inside_fn is None:
                self.active.append(None)
            else:
                self.active.append(
                    jnp.asarray((~inside_fn(d.centers)).astype(np.float32))
                )

    def _f(self, level, Q):
        d = self.domains[level]
        part = d.partitions[0]
        P = physicality_guard(state2primitive(self.fluid, Q))
        P = self.bcs[level](P)
        if self.smoother == "rk2":
            P2, _ = rk2_step(part, self.fluid, P, self.bcs[level],
                             cfl=self.cfl, high_order=self.high_order,
                             active=self.active[level])
            Qn = primitive2state(self.fluid, physicality_guard(P2))
            return Qn - Q, jnp.ones_like(Q)
        R = euler_rhs(part, self.fluid, P, high_order=self.high_order)
        dt = local_timestep(part, self.fluid, P, self.cfl)
        if self.active[level] is not None:
            dt = dt * self.active[level]
        # fixed point: Q += clamp(omega, 0, 1) * r with r = dt*R, omega = 1
        return R * dt[:, None], jnp.ones_like(Q)

    def cycle(self, Q, *, n_iter: int = 20, rtol: float = 0.05):
        """One FAS V-cycle; returns (Q, residual_reduction_ratio)."""
        return fas(
            self._f, Q,
            coarseners=self.coarseners,
            prolongators=self.prolongators,
            n_iter=n_iter, rtol=rtol,
        )

    def smooth_only(self, Q, *, n_iter: int = 20, rtol: float = 0.05):
        """Fine-level smoothing with no coarse correction (baseline)."""
        return fas(self._f, Q, n_iter=n_iter, rtol=rtol)

    def init_state(self, P0):
        return primitive2state(self.fluid, self.bcs[0](jnp.asarray(P0)))

    def primitives(self, Q):
        return self.bcs[0](
            physicality_guard(state2primitive(self.fluid, Q))
        )
