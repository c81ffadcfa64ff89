"""Reusable RANS (NS + Wray-Agarwal) pseudo-time stepper.

Assembles the reference's RANS ingredients (viscous fluxes
``src/cfd.jl:664-736``, Wray-Agarwal transport ``src/turbulence.jl:222-241``,
wall functions ``src/turbulence.jl:27-98``) into a TVD-RK2 local-dt march,
on either the generic gather operators or the dense block fast path.

Factored out of the RAE2822 RANS case so hypercube-wall cases (flat plate)
share the same numerics; parity between the two paths is covered by
``tests/test_rans.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import operators as ops
from ..physics.fluid import (
    dynamic_viscosity,
    physicality_guard,
    primitive2state,
    speed_of_sound,
    state2primitive,
)
from ..physics.turbulence import shear_rate, wray_agarwal
from ..solve.euler import euler_rhs


@dataclasses.dataclass
class RansMarch:
    step: Callable   # jitted (P, Rt) -> (P, Rt, resnorm)
    march: Callable  # jitted (P, Rt, n) -> (P, Rt)
    apply_bcs: Callable


def rans_rhs_grid(bt, fluid, S3, *, cfl: float, high_order: bool = True,
                  closure: str = "wray_agarwal", d_wall3=None,
                  l_cap3=None):
    """RANS right-hand side on the block-grid state.

    ``S3`` is the fused [B, bs.., nch+1] state ([p T u.. Rt]); works with
    ANY BlockTables (single-device, sharded-local, or coarse multigrid
    level — the sharded and FAS paths reuse it). Returns
    ``(R_flow [.., nch], T3 [..] dRt/dt, dt3 [..])``.

    ``closure``: ``"wray_agarwal"`` (default — the reference's simplified
    one-equation model, ``src/turbulence.jl:222-241``) or
    ``"mixing_length"`` — a FLAGGED deviation (VERDICT r4 item 6):
    Prandtl mixing-length algebraic eddy viscosity
    ``nu_t = (kappa d_wall)^2 S``.  The independent flat-plate BL harness
    (scripts/flat_plate_ode.py) measured the pure simplified-WA closure
    at -51% vs the Schultz-Grunow Cf correlation and the mixing-length
    closure at +5%; the flag gives users accurate skin friction while
    the default preserves reference parity.  Requires ``d_wall3``
    (static wall distance, block grid [B, bs..]); the Rt channel is
    frozen (T3 = 0).  ``l_cap3`` (optional, same shape): outer cutoff on
    the mixing length, l = min(kappa d, l_cap) — without it the l ~ y
    growth amplifies any outer-region shear noise into a huge eddy
    viscosity that keeps thickening the layer (measured: the flat-plate
    Cf error drifts from -5% at 8k steps to -24% at 30k uncapped; the
    standard algebraic-model cutoff is l_max = 0.09 delta).
    """
    from ..ops.block_ops import (
        cell_gradient_grid,
        euler_rhs_grid,
        face_accumulate,
        minmod as minmod_g,
    )

    nd = bt.nd
    nch = 2 + nd
    P3 = S3[..., :nch]
    Rt3 = S3[..., nch:nch + 1]
    Rt_pos = jnp.maximum(Rt3, 0.0)
    rho3 = P3[..., 0:1] / (fluid.R * jnp.maximum(P3[..., 1:2], 10.0))

    if closure == "mixing_length":
        assert d_wall3 is not None, "mixing_length needs wall distances"
        # S from pre-pass velocity gradients (the WA branch reuses the
        # fused pass's gradients; here mu_t must exist BEFORE the
        # viscous fluxes are assembled)
        vg0 = [[cell_gradient_grid(bt, P3[..., 2 + i:3 + i], j)[..., 0]
                for j in range(nd)] for i in range(nd)]
        S0 = shear_rate(vg0)
        l_mix = 0.41 * d_wall3
        if l_cap3 is not None:
            l_mix = jnp.minimum(l_mix, l_cap3)
        nu_t3 = l_mix ** 2 * S0
        mu_t3 = rho3 * nu_t3[..., None]
        R_flow, dta, _ = euler_rhs_grid(
            bt, fluid, P3, with_dt=True, cfl=cfl,
            high_order=high_order, viscous=True, mu_t3=mu_t3)
        nu_lam3 = dynamic_viscosity(fluid, P3[..., 1]) / rho3[..., 0]
        bound = cfl / dta
        nu_dt = nu_lam3 + nu_t3
        for d in range(nd):
            hcol = bt.h[:, d].reshape((bt.n_blocks,) + (1,) * nd)
            bound = bound + 4.0 * nu_dt / (hcol * hcol)
        return R_flow, jnp.zeros_like(S0), cfl / bound

    mu_t3 = rho3 * Rt_pos
    R_flow, dta, (du_grids, nu3) = euler_rhs_grid(
        bt, fluid, P3, with_dt=True, cfl=cfl,
        high_order=high_order, viscous=True, mu_t3=mu_t3)
    vg = [[du_grids[j][..., 2 + i] for j in range(nd)]
          for i in range(nd)]
    S = shear_rate(vg)
    dRt = [cell_gradient_grid(bt, Rt3, d) for d in range(nd)]
    gS = [cell_gradient_grid(bt, S[..., None], d) for d in range(nd)]
    wa = wray_agarwal(
        Rt_pos[..., 0], S,
        jnp.concatenate(dRt, axis=-1), jnp.concatenate(gS, axis=-1))
    nu_lam3 = dynamic_viscosity(fluid, P3[..., 1]) / rho3[..., 0]
    nu_eff3 = nu_lam3 + wa["nu_R"]

    T3 = wa["S"]
    for d in range(nd):
        W = jnp.concatenate([
            Rt3, dRt[d], nu3, P3[..., 2 + d:3 + d],
            nu_eff3[..., None],
        ], axis=-1)

        def face_T(Wo, Wn, ho, hn):
            Rto, Rtn = Wo[..., 0:1], Wn[..., 0:1]
            go, gn = Wo[..., 1:2], Wn[..., 1:2]
            Do, Dn = Wo[..., 2:3], Wn[..., 2:3]
            uo, un_ = Wo[..., 3:4], Wn[..., 3:4]
            no, nn = Wo[..., 4:5], Wn[..., 4:5]
            down, dneigh = ho / 2, hn / 2
            grad_f = (Rtn - Rto) / (down + dneigh)
            slope_o = (2 * go - grad_f) * down
            slope_n = (2 * gn - grad_f) * dneigh
            lim = minmod_g(slope_n, slope_o)
            RtL = Rto + lim
            RtR = Rtn - lim
            D = jnp.maximum(jnp.maximum(Do, Dn), 1e-7)
            uf_c = (Rto * dneigh + Rtn * down) / (down + dneigh)
            if high_order:
                uf_c = uf_c + (go * down - gn * dneigh) / 8
            RtL = RtL * D + (1.0 - D) * uf_c
            RtR = RtR * D + (1.0 - D) * uf_c
            uf = (uo * dneigh + un_ * down) / (down + dneigh)
            F_adv = jnp.where(uf >= 0.0, RtL, RtR) * uf
            nu_f = (no * dneigh + nn * down) / (down + dneigh)
            return F_adv - nu_f * grad_f

        T3 = T3 - face_accumulate(bt, d, W, face_T, 1, [1.0])[..., 0]

    # local dt: acoustic bound from the fused pass + viscous bound
    bound = cfl / dta
    nu_dt = nu_lam3 + Rt_pos[..., 0]
    for d in range(nd):
        hcol = bt.h[:, d].reshape((bt.n_blocks,) + (1,) * nd)
        bound = bound + 4.0 * nu_dt / (hcol * hcol)
    return R_flow, T3, cfl / bound


def rans_rk2_grid(bt, fluid, S3, apply_bcs3, *, cfl: float,
                  high_order: bool = True, active3=None,
                  rhs_fn=None):
    """One grid-native RANS TVD-RK2 pseudo step on the fused state.

    ``rhs_fn(S3) -> (R_flow, T3, dt3)`` defaults to `rans_rhs_grid` on
    ``bt``; the sharded path passes its halo-exchanging wrapper."""
    nch = 2 + bt.nd
    if rhs_fn is None:
        def rhs_fn(S):
            return rans_rhs_grid(bt, fluid, S, cfl=cfl,
                                 high_order=high_order)
    P3 = S3[..., :nch]
    Rt3 = S3[..., nch:nch + 1]
    R0, T0, dt = rhs_fn(S3)
    if active3 is not None:
        dt = dt * active3
    Q0 = primitive2state(fluid, P3)
    P1 = physicality_guard(
        state2primitive(fluid, Q0 + dt[..., None] * R0))
    Rt1 = Rt3 + dt[..., None] * T0[..., None]
    S1 = apply_bcs3(jnp.concatenate([P1, Rt1], axis=-1))
    R1, T1, _ = rhs_fn(S1)
    P2 = physicality_guard(state2primitive(
        fluid, Q0 + dt[..., None] * (R0 + R1) / 2))
    Rt2 = Rt3 + dt[..., None] * (T0 + T1)[..., None] / 2
    S2 = apply_bcs3(jnp.concatenate(
        [P2, jnp.maximum(Rt2, 0.0)], axis=-1))
    resnorm = jnp.abs(R0[..., 0] * (active3 if active3 is not None
                                    else 1.0)).max()
    return S2, resnorm


def build_rans_march(
    dom,
    fluid,
    *,
    cfl: float,
    active,                      # f32[N] 1=fluid, 0=in-solid
    flat_bcs: Sequence,          # [(family, fn(bdry, Pi, Rti)->(Pb, Rtcol))]
    blocked_bcs: Optional[Dict[str, Callable]] = None,  # name -> fn(Si, nrm)
    high_order: bool = True,
    use_blocks: bool = True,
    dense_families: Optional[Sequence[str]] = None,
    closure: str = "wray_agarwal",
    wall_distance=None,          # f32[N], required for closure="mixing_length"
    mixing_length_cap=None,      # f32[N] optional outer cutoff l_max
) -> RansMarch:
    part = dom.partitions[0]
    nd = dom.nd
    nch = 2 + nd
    l_cap = None
    if closure == "mixing_length":
        assert wall_distance is not None, "mixing_length needs wall_distance"
        d_wall = jnp.asarray(wall_distance)
        if mixing_length_cap is not None:
            l_cap = jnp.asarray(mixing_length_cap)

    def apply_bcs(P, Rt):
        Rt2 = Rt[:, None]
        for fam, fn in flat_bcs:
            P, Rt2 = dom.impose_bc(fam, fn, P, Rt2)
        return P, Rt2[:, 0]

    def rans_rhs(P, Rt):
        """(dQ/dt, dRt/dt): NS + turbulence closure."""
        Rt_pos = jnp.maximum(Rt, 0.0)
        rho = P[:, 0] / (fluid.R * jnp.maximum(P[:, 1], 10.0))
        if closure == "mixing_length":
            # flagged Prandtl mixing-length arm (see `rans_rhs_grid`)
            grad0 = ops.cell_gradient(part, P)
            vg0 = [[grad0[j][:, 2 + i] for j in range(nd)]
                   for i in range(nd)]
            S0 = shear_rate(vg0)
            l0 = 0.41 * d_wall
            if l_cap is not None:
                l0 = jnp.minimum(l0, l_cap)
            mu_t = rho * l0 ** 2 * S0
            R_flow = euler_rhs(part, fluid, P, high_order=high_order,
                               viscous=True, mu_t=mu_t)
            return R_flow, jnp.zeros_like(Rt)
        mu_t = rho * Rt_pos
        R_flow = euler_rhs(part, fluid, P, high_order=high_order,
                           viscous=True, mu_t=mu_t)

        grad = ops.cell_gradient(part, P)
        vg = [[grad[j][:, 2 + i] for j in range(nd)] for i in range(nd)]
        S = shear_rate(vg)
        dRt = ops.cell_gradient(part, Rt)
        gS = ops.cell_gradient(part, S)
        wa = wray_agarwal(
            Rt_pos, S, jnp.stack(dRt, axis=1), jnp.stack(gS, axis=1))
        nu_lam = dynamic_viscosity(fluid, P[:, 1]) / rho
        nu_eff = nu_lam + wa["nu_R"]

        nujst = ops.jst_sensor(part, P[:, 0])
        dRt_dt = wa["S"]
        for d in range(nd):
            RtL, RtR = ops.muscl(part, Rt, dRt[d], d, D=nujst,
                                 high_order=high_order)
            uf = ops.at_faces(part, P[:, 2 + d], d)
            F = jnp.where(uf >= 0.0, RtL, RtR) * uf
            dRt_dt = dRt_dt - ops.green_gauss(part, F, d)
            nu_f = ops.at_faces(part, nu_eff, d)
            dRt_dt = dRt_dt + ops.green_gauss(
                part, nu_f * ops.face_gradient(part, Rt, d), d)
        return R_flow, dRt_dt

    def local_dt(P, Rt):
        a_loc = speed_of_sound(fluid, P[:, 1])
        rho = P[:, 0] / (fluid.R * jnp.maximum(P[:, 1], 10.0))
        if closure == "mixing_length":
            grad0 = ops.cell_gradient(part, P)
            vg0 = [[grad0[j][:, 2 + i] for j in range(nd)]
                   for i in range(nd)]
            l0 = 0.41 * d_wall
            if l_cap is not None:
                l0 = jnp.minimum(l0, l_cap)
            nu_turb = l0 ** 2 * shear_rate(vg0)
        else:
            nu_turb = jnp.maximum(Rt, 0.0)
        nu_eff = dynamic_viscosity(fluid, P[:, 1]) / rho + nu_turb
        bound = jnp.zeros(P.shape[0], dtype=P.dtype)
        for d in range(nd):
            s = jnp.abs(P[:, 2 + d]) + a_loc
            bound = bound + ops.unsigned_green_gauss(
                part, ops.at_faces(part, s, d), d)
            h = part.spacing[:, d]
            bound = bound + 4.0 * nu_eff / (h * h)
        return cfl / bound

    def one_step(P, Rt):
        dt = local_dt(P, Rt) * active
        R0, T0 = rans_rhs(P, Rt)
        Q0 = primitive2state(fluid, P)
        P1 = physicality_guard(state2primitive(fluid, Q0 + dt[:, None] * R0))
        Rt1 = Rt + dt * T0
        P1, Rt1 = apply_bcs(P1, Rt1)
        R1, T1 = rans_rhs(P1, Rt1)
        P2 = physicality_guard(state2primitive(
            fluid, Q0 + dt[:, None] * (R0 + R1) / 2))
        Rt2 = Rt + dt * (T0 + T1) / 2
        P2, Rt2 = apply_bcs(P2, jnp.maximum(Rt2, 0.0))
        resnorm = jnp.abs(R0[:, 0] * active).max()
        return P2, Rt2, resnorm

    if use_blocks:
        # ---- grid-native fast path: full RANS RHS on the dense block
        # operators, BCs through BlockedBC on the fused [P, Rt] state.
        from ..ops.block_ops import to_blocks, to_flat
        from ..topology.blocked_bc import build_blocked_bc
        from ..topology.blocks import build_block_tables

        bt = build_block_tables(dom)
        bbc = build_blocked_bc(dom, [fam for fam, _ in flat_bcs],
                               dense_families=dense_families)
        active3 = jnp.asarray(to_blocks(bt, active[:, None])[..., 0])
        d_wall3 = (to_blocks(bt, d_wall[:, None])[..., 0]
                   if closure == "mixing_length" else None)
        l_cap3 = (to_blocks(bt, l_cap[:, None])[..., 0]
                  if l_cap is not None else None)

        def guard_b(g):
            return jnp.concatenate([
                physicality_guard(g[:, :nch]),
                jnp.maximum(g[:, nch:nch + 1], 0.0),
            ], axis=1)

        def apply_bcs3(S3):
            return bbc(S3, blocked_bcs, guard=guard_b)

        def rhs3(S):
            return rans_rhs_grid(bt, fluid, S, cfl=cfl,
                                 high_order=high_order, closure=closure,
                                 d_wall3=d_wall3, l_cap3=l_cap3)

        def one_step3(S3):
            return rans_rk2_grid(bt, fluid, S3, apply_bcs3, cfl=cfl,
                                 high_order=high_order, active3=active3,
                                 rhs_fn=rhs3)

        def one_step_b(P, Rt):      # flat-state wrapper over the grid step
            S3 = to_blocks(bt, jnp.concatenate([P, Rt[:, None]], axis=1))
            S2, res = one_step3(S3)
            S2f = to_flat(bt, S2)
            return S2f[:, :nch], S2f[:, nch], res

        @jax.jit
        def march(P, Rt, n):
            # grid-native: state stays [B, bs.., nch+1] through the loop
            S3 = to_blocks(bt, jnp.concatenate([P, Rt[:, None]], axis=1))

            def body(_, S3):
                return one_step3(S3)[0]

            Sf = to_flat(bt, jax.lax.fori_loop(0, n, body, S3))
            return Sf[:, :nch], Sf[:, nch]

        step = jax.jit(one_step_b)
    else:
        @jax.jit
        def march(P, Rt, n):
            def body(_, s):
                P, Rt = s
                P2, Rt2, _ = one_step(P, Rt)
                return (P2, Rt2)
            return jax.lax.fori_loop(0, n, body, (P, Rt))

        step = jax.jit(one_step)

    return RansMarch(step=step, march=march, apply_bcs=apply_bcs)
