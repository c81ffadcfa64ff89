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

The pseudo-time stepper lives in ``ibx.solve.rans`` (shared with the
flat-plate validation case); Reynolds number is set by rescaling mu_ref
(``adjust_Reynolds``, ``src/cfd.jl:645-654``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

import jax.numpy as jnp

from ..geometry import DistanceField, build_mesh, feature_regions, load_surface, merge_points
from ..physics.bc import apply_flow_bc, flow_bc
from ..physics.fluid import (
    adjust_reynolds,
    dynamic_viscosity,
    make_fluid,
)
from ..physics.turbulence import wall_function
from ..solve.rans import build_rans_march
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
    use_blocks: bool = True,
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

    def _wall_state(Pi, nrm, y):
        u = Pi[:, 2:]
        un = (u * nrm).sum(axis=1)
        ut = u - un[:, None] * nrm
        V_t = jnp.sqrt((ut ** 2).sum(axis=1) + 1e-12)
        rho = Pi[:, 0] / (fluid.R * jnp.maximum(Pi[:, 1], 10.0))
        nu = dynamic_viscosity(fluid, Pi[:, 1]) / rho
        return wall_function(y, V_t, nu)

    def wall_fn(bdry, Pi, Rti):
        nrm = bdry.normals
        ws = _wall_state(Pi, nrm, bdry.image_distances)
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

    blocked_bcs = None
    if use_blocks:
        from ..topology.blocked_bc import build_blocked_bc

        imd = build_blocked_bc(dom, ["farfield", "wall"]).image_distances

        def far_fn_b(Si, nrm):
            return jnp.concatenate([
                apply_flow_bc(farfield_bc, Si[:, :4], nrm),
                jnp.full_like(Si[:, 4:5], Rt_inf),
            ], axis=1)

        def wall_fn_b(Si, nrm):
            Pi = Si[:, :4]
            ws = _wall_state(Pi, nrm, imd)
            if wall_model:
                Pb = apply_flow_bc(wall_bc, Pi, nrm,
                                   image_distances=imd, du_dn=ws.du_dn)
            else:
                Pb = apply_flow_bc(wall_bc, Pi, nrm)
            return jnp.concatenate([Pb, ws.nu_t[:, None]], axis=1)

        blocked_bcs = {"farfield": far_fn_b, "wall": wall_fn_b}

    rm = build_rans_march(
        dom, fluid, cfl=cfl, active=active,
        flat_bcs=[("farfield", far_fn), ("wall", wall_fn)],
        blocked_bcs=blocked_bcs,
        high_order=high_order, use_blocks=use_blocks,
    )

    P0 = np.tile(P_inf, (dom.ncells, 1))
    P0[inside, 2:] = 0.0
    Rt0 = np.full(dom.ncells, Rt_inf, np.float32)
    P0, Rt0 = rm.apply_bcs(jnp.asarray(P0), jnp.asarray(Rt0))

    return Rae2822RansCase(
        dom=dom, fluid=fluid, P_inf=P_inf, Rt_inf=Rt_inf, mach=mach,
        alpha=alpha_deg, reynolds=reynolds, step=rm.step, march=rm.march,
        P0=P0, Rt0=Rt0, apply_bcs=rm.apply_bcs,
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
