"""RAE2822 RANS case (BASELINE.md workload 3).

Assembles the reference's RANS ingredients into a marching case — nothing
in the reference runs this end to end, but every piece is specified there:

  * Wray-Agarwal one-equation R-transport (``src/turbulence.jl:222-241``)
    marched with the flow: dR/dt = -div(u R) + div((nu + sigma_R R) grad R)
    + S_WA;
  * wall functions (``src/turbulence.jl:27-98``) supply the eddy viscosity
    and the FlowBC ``du_dn`` velocity correction at the wall
    (``src/cfd.jl:268-273``);
  * mu_t = rho R feeds ``viscous_fluxes`` (``src/cfd.jl:664-736``).

The viscous/turbulent path runs on the generic gather operators (the block
fast path covers the inviscid flagship); Reynolds number is set by
rescaling mu_ref (``adjust_Reynolds``, ``src/cfd.jl:645-654``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import DistanceField, build_mesh, feature_regions, load_surface, merge_points
from ..ops import operators as ops
from ..physics.bc import apply_flow_bc, flow_bc
from ..physics.fluid import (
    adjust_reynolds,
    dynamic_viscosity,
    make_fluid,
    physicality_guard,
    primitive2state,
    reynolds_number,
    speed_of_sound,
    state2primitive,
)
from ..physics.turbulence import shear_rate, wall_function, wray_agarwal
from ..solve.euler import euler_rhs
from ..topology.domain import Domain
from .rae2822 import RAE_DAT


@dataclasses.dataclass
class Rae2822RansCase:
    dom: Domain
    fluid: object
    P_inf: np.ndarray
    Rt_inf: float
    mach: float
    alpha: float
    reynolds: float
    step: Callable          # jitted (P, Rt) -> (P, Rt, resnorm)
    march: Callable         # jitted (P, Rt, n) -> (P, Rt)
    P0: jnp.ndarray
    Rt0: jnp.ndarray
    apply_bcs: Callable     # (P, Rt) -> (P, Rt)


def build_rae2822_rans(
    *,
    wall_h: float = 2e-3,
    feature_h: float = 1e-3,
    farfield: float = 25.0,
    block_size: int = 16,
    mach: float = 0.73,
    alpha_deg: float = 2.31,
    reynolds: float = 6.5e6,
    cfl: float = 0.5,
    wall_model: bool = True,
    high_order: bool = True,
) -> Rae2822RansCase:
    stl = merge_points(load_surface(RAE_DAT))
    features = DistanceField(feature_regions(stl, radius=0.05))
    msh = build_mesh(
        [-farfield, -farfield], [2 * farfield, 2 * farfield],
        ("wall", stl, wall_h),
        refinement_regions=[(features, feature_h)],
        block_size=block_size,
    )
    dom = Domain(
        msh,
        hypercube_families=[
            ("farfield", [(0, False), (0, True), (1, False), (1, True)]),
        ],
    )
    part = dom.partitions[0]

    from ..geometry.inside import points_inside

    inside = points_inside(stl, dom.centers)
    active = jnp.asarray((~inside).astype(np.float32))

    T_inf = 288.15
    p_inf = 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    V = mach * a
    al = np.deg2rad(alpha_deg)
    P_inf = np.array(
        [p_inf, T_inf, V * np.cos(al), V * np.sin(al)], dtype=np.float32
    )
    fluid = adjust_reynolds(make_fluid(), P_inf, 1.0, reynolds)
    rho_inf = p_inf / (283.0 * T_inf)
    nu_inf = float(dynamic_viscosity(fluid, jnp.float32(T_inf))) / rho_inf
    Rt_inf = 3.0 * nu_inf          # freestream eddy viscosity seed

    farfield_bc = flow_bc(fluid, P_inf)
    wall_bc = flow_bc(fluid, [p_inf, T_inf, 0.0], normal_flow=True)

    def wall_fn(bdry, Pi, Rti):
        nrm = bdry.normals
        u = Pi[:, 2:]
        un = (u * nrm).sum(axis=1)
        ut = u - un[:, None] * nrm
        V_t = jnp.sqrt((ut ** 2).sum(axis=1) + 1e-12)
        rho = Pi[:, 0] / (fluid.R * jnp.maximum(Pi[:, 1], 10.0))
        nu = dynamic_viscosity(fluid, Pi[:, 1]) / rho
        ws = wall_function(bdry.image_distances, V_t, nu)
        if wall_model:
            Pb = apply_flow_bc(
                wall_bc, Pi, nrm,
                image_distances=bdry.image_distances, du_dn=ws.du_dn,
            )
        else:
            Pb = apply_flow_bc(wall_bc, Pi, nrm)
        return Pb, ws.nu_t[:, None]

    def far_fn(bdry, Pi, Rti):
        return (
            apply_flow_bc(farfield_bc, Pi, bdry.normals),
            jnp.full_like(Rti, Rt_inf),
        )

    def apply_bcs(P, Rt):
        P, Rt2 = dom.impose_bc("farfield", far_fn, P, Rt[:, None])
        P, Rt2 = dom.impose_bc("wall", wall_fn, P, Rt2)
        return P, Rt2[:, 0]

    def rans_rhs(P, Rt):
        """(dQ/dt, dRt/dt): NS + Wray-Agarwal transport."""
        Rt_pos = jnp.maximum(Rt, 0.0)
        rho = P[:, 0] / (fluid.R * jnp.maximum(P[:, 1], 10.0))
        mu_t = rho * Rt_pos
        R_flow = euler_rhs(part, fluid, P, high_order=high_order,
                           viscous=True, mu_t=mu_t)

        grad = ops.cell_gradient(part, P)
        vg = [[grad[j][:, 2 + i] for j in range(part.nd)]
              for i in range(part.nd)]
        S = shear_rate(vg)
        dRt = ops.cell_gradient(part, Rt)
        gS = ops.cell_gradient(part, S)
        wa = wray_agarwal(
            Rt_pos, S,
            jnp.stack(dRt, axis=1), jnp.stack(gS, axis=1),
        )
        nu_lam = dynamic_viscosity(fluid, P[:, 1]) / rho
        nu_eff = nu_lam + wa["nu_R"]

        nujst = ops.jst_sensor(part, P[:, 0])
        dRt_dt = wa["S"]
        for d in range(part.nd):
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
        nu_eff = dynamic_viscosity(fluid, P[:, 1]) / rho \
            + jnp.maximum(Rt, 0.0)
        bound = jnp.zeros(P.shape[0], dtype=P.dtype)
        for d in range(part.nd):
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

    @jax.jit
    def step(P, Rt):
        return one_step(P, Rt)

    @jax.jit
    def march(P, Rt, n):
        def body(_, s):
            P, Rt = s
            P2, Rt2, _ = one_step(P, Rt)
            return (P2, Rt2)
        return jax.lax.fori_loop(0, n, body, (P, Rt))

    P0 = np.tile(P_inf, (dom.ncells, 1))
    P0[inside, 2:] = 0.0
    Rt0 = np.full(dom.ncells, Rt_inf, np.float32)
    P0, Rt0 = apply_bcs(jnp.asarray(P0), jnp.asarray(Rt0))

    return Rae2822RansCase(
        dom=dom, fluid=fluid, P_inf=P_inf, Rt_inf=Rt_inf, mach=mach,
        alpha=alpha_deg, reynolds=reynolds, step=step, march=march,
        P0=P0, Rt0=Rt0, apply_bcs=apply_bcs,
    )


def wall_skin_friction(case: Rae2822RansCase, P) -> np.ndarray:
    """Cf from the wall function: tau = rho u_tau^2 with u_tau inverted from
    the offset-sampled tangential velocity (the wall-modelled counterpart of
    the README's laminar recipe ``README.md:330-338``, which needs a
    sublayer-resolving mesh)."""
    surf = case.dom.surfaces["wall"]
    Pw = np.asarray(surf.at_offset(P))
    u = Pw[:, 2:]
    n = surf.normals
    ut = u - (u * n).sum(axis=1)[:, None] * n
    V_t = np.sqrt((ut ** 2).sum(axis=1)) + 1e-12
    rho = Pw[:, 0] / (283.0 * np.maximum(Pw[:, 1], 10.0))
    mu = np.asarray(dynamic_viscosity(case.fluid, jnp.asarray(Pw[:, 1])))
    y = surf.offsets * 1.5
    ws = wall_function(jnp.asarray(y), jnp.asarray(V_t),
                       jnp.asarray(mu / rho))
    tau = rho * np.asarray(ws.u_tau) ** 2
    rho_inf = float(case.P_inf[0]) / (283.0 * float(case.P_inf[1]))
    V_inf = float(np.sqrt((case.P_inf[2:] ** 2).sum()))
    return tau / (0.5 * rho_inf * V_inf ** 2)
