"""BASELINE workload 5: 3D RANS wing with FAS multigrid on a multi-chip
device mesh.

Composes every acceleration axis the framework has:

  * 3D wing geometry lofted from the committed RAE2822 section
    (`ibx.geometry.stereolitography.loft_polyline`);
  * RANS physics — NS + Wray-Agarwal transport + wall-function du/dn wall
    BC (reference ``src/cfd.jl:664-736``, ``src/turbulence.jl:27-241``) on
    the dense block fast path (`ibx.solve.rans.rans_rhs_grid`);
  * spatial decomposition over a 1-D device mesh with neighbor-ppermute
    halos (`ibx.parallel.block_sharding.ShardedBlockDomain`);
  * FAS multigrid (reference ``src/solver.jl:39-91`` +
    ``src/ImmersedBoundary.jl:1355-1407``): the fine level smooths fully
    SHARDED; the coarse-level tau-corrected relaxation runs REPLICATED on
    every device (the standard production choice for coarse grids — a
    bs/2 level holds 1/8 of the 3D cells, and replicating it avoids
    latency-bound tiny-shard collectives; SURVEY.md §7.3 "consider
    replicating the coarsest levels"). Fine<->coarse transfers are the
    reference's IDW kNN interpolators applied to the all-gathered state.

Parity: the n-device march must match the 1-device march
(tests/test_wing3d_fas.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import build_mesh, load_surface, merge_points
from ..geometry.inside import points_inside
from ..geometry.stereolitography import loft_polyline
from ..ops.block_ops import to_blocks, to_flat
from ..ops.stencil import apply_stencil
from ..parallel import make_device_mesh
from ..parallel.block_sharding import ShardedBlockDomain
from ..physics.bc import apply_flow_bc, flow_bc
from ..physics.fluid import (
    adjust_reynolds,
    dynamic_viscosity,
    make_fluid,
    physicality_guard,
    primitive2state,
    state2primitive_guarded,
)
from ..physics.turbulence import wall_function
from ..solve.multigrid_domain import multigrid
from ..solve.rans import rans_rhs_grid, rans_rk2_grid
from ..topology.blocked_bc import build_blocked_bc
from ..topology.blocks import build_block_tables
from ..topology.domain import Domain
from .rae2822 import RAE_DAT


@dataclasses.dataclass
class Wing3dCase:
    dom: Domain
    sbd: ShardedBlockDomain
    fluid: object
    P_inf: np.ndarray
    Rt_inf: float
    march: Callable      # jitted (S_sh, n) -> S_sh      (sharded RK2)
    fas_cycle: Callable  # jitted (S_sh,) -> (S_sh, res) (V-cycle)
    step: Callable       # jitted (S_sh,) -> (S_sh, res) (one RK2 step)
    S0_sh: jnp.ndarray   # sharded fused [P, chunk, bs.., nch+1] state
    collect: Callable    # sharded -> global flat numpy
    res_norms: Callable = None  # jitted (S_sh,) -> (l2, max) of dt*R
    res_field: Callable = None  # jitted (S_sh,) -> sharded dt*R grids


def build_wing3d_rans_fas(
    n_devices: int,
    *,
    wall_h: float = 0.08,
    span: float = 1.0,
    farfield: float = 8.0,
    block_size: int = 8,
    mach: float = 0.4,
    alpha_deg: float = 2.0,
    reynolds: float = 1e6,
    cfl: float = 0.5,
    high_order: bool = True,
    n_coarse_iter: int = 8,
    verbose: bool = False,
) -> Wing3dCase:
    # ---- geometry: straight wing lofted from the RAE2822 section --------
    section = merge_points(load_surface(RAE_DAT))
    stl = merge_points(loft_polyline(section, 0.0, span, n_sections=2))
    msh = build_mesh(
        [-farfield, -farfield, -farfield + span / 2],
        [2 * farfield] * 3,
        ("wall", stl, wall_h),
        block_size=block_size,
    )
    dom = Domain(
        msh,
        verbose=verbose,
        hypercube_families=[(
            "farfield",
            [(0, False), (0, True), (1, False), (1, True),
             (2, False), (2, True)],
        )],
    )
    nd, nch = 3, 5

    # ---- fluid / freestream ---------------------------------------------
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    V = mach * a
    al = np.deg2rad(alpha_deg)
    P_inf = np.array(
        [p_inf, T_inf, V * np.cos(al), V * np.sin(al), 0.0], np.float32)
    fluid = adjust_reynolds(make_fluid(), P_inf, 1.0, reynolds)
    rho_inf = p_inf / (283.0 * T_inf)
    nu_inf = float(dynamic_viscosity(fluid, jnp.float32(T_inf))) / rho_inf
    Rt_inf = 3.0 * nu_inf

    farfield_bc = flow_bc(fluid, P_inf)
    wall_bc = flow_bc(fluid, [p_inf, T_inf, 0.0], normal_flow=True)

    def _wall_state(Pi, nrm, y):
        u = Pi[:, 2:2 + nd]
        un = (u * nrm).sum(axis=1)
        ut = u - un[:, None] * nrm
        V_t = jnp.sqrt((ut ** 2).sum(axis=1) + 1e-12)
        rho = Pi[:, 0] / (fluid.R * jnp.maximum(Pi[:, 1], 10.0))
        nu = dynamic_viscosity(fluid, Pi[:, 1]) / rho
        return wall_function(y, V_t, nu)

    def wall_fn(Si, nrm, imd):
        Pi = Si[:, :nch]
        ws = _wall_state(Pi, nrm, imd)
        Pb = apply_flow_bc(wall_bc, Pi, nrm,
                           image_distances=imd, du_dn=ws.du_dn)
        return jnp.concatenate([Pb, ws.nu_t[:, None]], axis=1)

    def far_fn(Si, nrm):
        return jnp.concatenate([
            apply_flow_bc(farfield_bc, Si[:, :nch], nrm),
            jnp.full_like(Si[:, nch:nch + 1], Rt_inf),
        ], axis=1)

    # family order must match dom._host_boundaries iteration order (the
    # sharded ctx.bc resolves families by that enumeration)
    fns_by_name = {"wall": wall_fn, "farfield": far_fn}
    bc_fns = {name: fns_by_name[name] for name in dom._host_boundaries}

    def guard_s(g):
        return jnp.concatenate([
            physicality_guard(g[:, :nch]),
            jnp.maximum(g[:, nch:nch + 1], 0.0),
        ], axis=1)

    inside = points_inside(stl, dom.centers)
    active = (~inside).astype(np.float32)

    # ---- coarse level (replicated): bs/2 domain + transfers --------------
    hier = multigrid(dom, 1)
    cdom = hier.coarse_domains[0]
    bt_c = build_block_tables(cdom)
    bbc_c = build_blocked_bc(cdom, list(cdom._host_boundaries))
    active_c = jnp.asarray(to_blocks(
        bt_c, (~points_inside(stl, cdom.centers)).astype(np.float32)[:, None]
    )[..., 0])
    imd_c = bbc_c.image_distances

    def wall_fn_c(Si, nrm):
        return wall_fn(Si, nrm, imd_c)

    bc_fns_c = {"wall": wall_fn_c, "farfield": far_fn}

    def apply_bcs_c(S3c):
        return bbc_c(S3c, bc_fns_c, guard=guard_s)

    rep = dict(
        coarsen=jax.device_put(hier.coarseners[0]),
        prolong=jax.device_put(hier.prolongators[0]),
    )

    # ---- sharded runtime --------------------------------------------------
    mesh = make_device_mesh(n_devices)
    sbd = ShardedBlockDomain(dom, mesh)
    active_sh = sbd.distribute(active[:, None], pad_mode="zero")[..., 0]

    def sharded_smooth(ctx, S_own, active_own):
        def apply_bcs3(own):
            return ctx.own(ctx.bc(ctx.exchange(own), bc_fns, guard=guard_s))

        def rhs_fn(own):
            loc = ctx.exchange(own)
            R, T, dt = rans_rhs_grid(ctx.bt, fluid, loc, cfl=cfl,
                                     high_order=high_order)
            # pad blocks have no faces -> dt = inf there; mask via active
            dt = jnp.where(active_own > 0, ctx.own(dt), 0.0)
            return ctx.own(R), ctx.own(T), dt

        S2, res = rans_rk2_grid(ctx.bt, fluid, S_own, apply_bcs3, cfl=cfl,
                                high_order=high_order, active3=active_own,
                                rhs_fn=rhs_fn)
        return S2, ctx.pmax(res)

    # conserved fused state for the FAS transfers: [Q_flow(nch), Rt]
    def to_Q(S):
        return jnp.concatenate([
            primitive2state(fluid, S[..., :nch]), S[..., nch:]], axis=-1)

    def to_S(Q):
        return jnp.concatenate([
            state2primitive_guarded(fluid, Q[..., :nch]),
            jnp.maximum(Q[..., nch:], 0.0)], axis=-1)

    def coarse_r(S3c):
        """Coarse-level r = dt * R on the replicated bs/2 block grid."""
        R, T, dt = rans_rhs_grid(bt_c, fluid, S3c, cfl=cfl,
                                 high_order=high_order)
        dt = dt * active_c
        return jnp.concatenate([R, T[..., None]], axis=-1) * dt[..., None]

    def sharded_fas_cycle(ctx, S_own, active_own):
        """One 2-level FAS V-cycle (reference ``src/solver.jl:39-91``
        semantics with a fixed coarse iteration count instead of the
        residual-tolerance while-loop): pre-smooth (sharded) -> coarse
        tau-corrected relaxation (replicated) -> prolonged correction ->
        post-smooth (sharded)."""
        # pre-smooth: one sharded RK2 step
        S_own, res0 = sharded_smooth(ctx, S_own, active_own)

        # fine residual r = dt * R for the tau correction
        def rhs_own(own):
            loc = ctx.exchange(own)
            R, T, dt = rans_rhs_grid(ctx.bt, fluid, loc, cfl=cfl,
                                     high_order=high_order)
            dt = jnp.where(active_own > 0, ctx.own(dt), 0.0)
            return (jnp.concatenate(
                [ctx.own(R), ctx.own(T)[..., None]], axis=-1)
                * dt[..., None])

        r_own = rhs_own(S_own)
        S_glob = ctx.all_gather_flat(S_own)          # replicated [N, C]
        r_glob = ctx.all_gather_flat(r_own)

        Q_glob = to_Q(S_glob)
        Qc0 = apply_stencil(ctx.rep["coarsen"], Q_glob)
        rc0 = apply_stencil(ctx.rep["coarsen"], r_glob)

        def fc(Qc):
            S3c = apply_bcs_c(to_blocks(bt_c, to_S(Qc)))
            return to_flat(bt_c, coarse_r(S3c))

        source = rc0 - fc(Qc0)                       # tau correction

        def body(_, Qc):
            return Qc + fc(Qc) + source

        Qc = jax.lax.fori_loop(0, n_coarse_iter, body, Qc0)

        corr = apply_stencil(ctx.rep["prolong"], Qc - Qc0)
        Q_own = to_Q(S_own) + ctx.own_flat(corr) \
            * active_own[..., None]
        S_own = ctx.own(ctx.bc(ctx.exchange(to_S(Q_own)), bc_fns,
                               guard=guard_s))

        # post-smooth: one sharded RK2 step
        S_own, res1 = sharded_smooth(ctx, S_own, active_own)
        return S_own, res1

    raw_smooth = sbd.shard_fn(sharded_smooth)
    raw_cycle = sbd.shard_fn(sharded_fas_cycle, replicated=rep)

    @jax.jit
    def march(S_sh, n):
        def body(_, S_sh):
            return raw_smooth(S_sh, active_sh)[0]
        return jax.lax.fori_loop(0, n, body, S_sh)

    @jax.jit
    def fas_cycle(S_sh):
        S2, res = raw_cycle(S_sh, active_sh)
        return S2, res[0]

    @jax.jit
    def step(S_sh):
        S2, res = raw_smooth(S_sh, active_sh)
        return S2, res[0]

    # SOLVED-cell metric mask: the march itself freezes only in-solid
    # cells, but the convergence FUNCTIONAL must also exclude ghost
    # cells — impose_bc overwrites them each step, so their dt*R never
    # relaxes and (measured, round 5) carries >99.99% of the naive
    # functional on a converged state, flooring every residual curve.
    ghost_m = np.zeros(dom.ncells, bool)
    for _, _hb in dom._host_boundaries.items():
        ghost_m[_hb.ghosts] = True
    solved_sh = sbd.distribute(
        (active * (~ghost_m)).astype(np.float32)[:, None],
        pad_mode="zero")[..., 0]

    def sharded_resnorm(ctx, S_own, solved_own):
        """Pseudo-time update norms: L2 and max of dt*R over solved
        cells — the convergence functional (a raw-RHS max-norm is pinned
        by the smallest near-wall cells and hides field convergence)."""
        loc = ctx.exchange(S_own)
        R, T, dt = rans_rhs_grid(ctx.bt, fluid, loc, cfl=cfl,
                                 high_order=high_order)
        dt = jnp.where(solved_own > 0, ctx.own(dt), 0.0)
        r = jnp.concatenate(
            [ctx.own(R), ctx.own(T)[..., None]], axis=-1) * dt[..., None]
        l2 = ctx.psum((r.astype(jnp.float32) ** 2).sum())
        mx = ctx.pmax(jnp.abs(r).max())
        return jnp.sqrt(l2), mx

    raw_rn = sbd.shard_fn(sharded_resnorm)

    @jax.jit
    def res_norms(S_sh):
        l2, mx = raw_rn(S_sh, solved_sh)
        return l2[0], mx[0]

    def sharded_resfield(ctx, S_own, solved_own):
        """Per-cell pseudo-time update dt*R (diagnosis)."""
        loc = ctx.exchange(S_own)
        R, T, dt = rans_rhs_grid(ctx.bt, fluid, loc, cfl=cfl,
                                 high_order=high_order)
        dt = jnp.where(solved_own > 0, ctx.own(dt), 0.0)
        return jnp.concatenate(
            [ctx.own(R), ctx.own(T)[..., None]], axis=-1) * dt[..., None]

    raw_rf = sbd.shard_fn(sharded_resfield)
    res_field = jax.jit(lambda S_sh: raw_rf(S_sh, solved_sh))

    # ---- initial state -----------------------------------------------------
    S0 = np.concatenate([
        np.tile(P_inf, (dom.ncells, 1)),
        np.full((dom.ncells, 1), Rt_inf, np.float32),
    ], axis=1)
    S0[inside, 2:2 + nd] = 0.0
    S0_sh = sbd.distribute(S0)

    @jax.jit
    def bc_only(S_sh):
        def f(ctx, S_own, active_own):
            return ctx.own(ctx.bc(ctx.exchange(S_own), bc_fns,
                                  guard=guard_s)), jnp.float32(0.0)
        return sbd.shard_fn(f)(S_sh, active_sh)[0]

    S0_sh = bc_only(S0_sh)

    return Wing3dCase(
        dom=dom, sbd=sbd, fluid=fluid, P_inf=P_inf, Rt_inf=Rt_inf,
        march=march, fas_cycle=fas_cycle, step=step, S0_sh=S0_sh,
        collect=sbd.collect, res_norms=res_norms, res_field=res_field,
    )
