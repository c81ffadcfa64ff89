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
from .euler import euler_rhs, local_timestep
from .fas import fas
from .multigrid_domain import DomainHierarchy, multigrid


class FasEuler:
    """FAS-accelerated pseudo-time Euler solver over a domain hierarchy.

    ``make_bcs(dom) -> (P -> P)`` builds the ghost-BC application for any
    level's domain; ``inside_fn(centers) -> bool[N]`` (optional) marks cells
    inside solid bodies to freeze, per level.
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
    ):
        self.fluid = fluid
        self.cfl = cfl
        self.high_order = high_order
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
