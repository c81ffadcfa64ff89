"""Sharded BLOCK fast-path RAE2822 Euler step (multi-device flagship).

Same numerics as the single-chip grid fast path (`ibx.cases.rae2822` with
``use_blocks=True``), executed as one shard_map over a 1-D device mesh:
block-partitioned state, neighbor-ppermute halo exchange per RK stage /
BC application, dense per-device RHS. Parity with the single-device march
is enforced by tests/test_block_sharding.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel import make_device_mesh
from ..parallel.block_sharding import ShardedBlockDomain
from ..physics.bc import apply_flow_bc, flow_bc
from ..physics.fluid import (
    physicality_guard,
    primitive2state,
    state2primitive_guarded,
)
from ..ops.block_ops import euler_rhs_grid
from .rae2822 import build_rae2822


def build_rae2822_block_sharded(
    n_devices: int,
    *,
    wall_h: float = 4e-2,
    feature_h: float = 2e-2,
    cfl: float = 0.7,
    high_order: bool = True,
    te_fix_radius: float = 0.0,
    overlap: bool = False,
    case=None,
    **kwargs,
):
    """Returns (sharded_block_domain, jitted step, sharded P0, case).

    ``case`` reuses a prebuilt single-chip case (must match the kwargs that
    matter to the numerics: the sharded step re-derives its BCs and fix
    field from the case's domain) — used by overhead measurements to avoid
    rebuilding the 881k-cell flagship topology twice.
    """
    if case is None:
        case = build_rae2822(
            wall_h=wall_h, feature_h=feature_h, cfl=cfl,
            n_partitions=1, high_order=high_order,
            te_fix_radius=te_fix_radius, **kwargs,
        )
    mesh = make_device_mesh(n_devices)
    sbd = ShardedBlockDomain(case.dom, mesh, overlap=overlap,
                             bc_names=["farfield", "wall"])

    fluid = case.fluid
    farfield_bc = flow_bc(fluid, case.P_inf)
    wall_bc = flow_bc(
        fluid, [float(case.P_inf[0]), 288.15, 0.0], normal_flow=True,
    )
    bc_fns = {
        "farfield": lambda Pi, nrm: apply_flow_bc(farfield_bc, Pi, nrm),
        "wall": lambda Pi, nrm: apply_flow_bc(wall_bc, Pi, nrm),
    }

    from ..geometry.inside import points_inside

    inside = points_inside(case.dom.mesh.distance_fields["wall"].stl,
                           case.dom.centers)
    active_sh = sbd.distribute(
        (~inside).astype(np.float32)[:, None], pad_mode="zero")[..., 0]

    # static per-cell TE fix blend in LOCAL layout (halo slots included, so
    # chunk-edge faces see it; no per-step exchange — it never changes)
    fix_loc = None
    if te_fix_radius > 0.0:
        stl = case.dom.mesh.distance_fields["wall"].stl
        te = stl.points[int(np.argmax(stl.points[:, 0]))]
        d_te = np.sqrt(((case.dom.centers - te[None, :]) ** 2).sum(1))
        f = np.clip((2.0 * te_fix_radius - d_te) / te_fix_radius,
                    0.0, 1.0).astype(np.float32)
        fix_loc = sbd.distribute_local(f[:, None])

    def sharded_step(ctx, P_own, active_own, *rest):
        fix3 = rest[0] if rest else None
        use_overlap = getattr(ctx, "bt_own", None) is not None

        def bcs(own):
            # per-device BlockedBC: the single-chip BC fast paths
            # (dense-plane templates, stencil dedup, phase-view placement)
            # applied to the local [B_loc, bs, bs, C] grid
            return ctx.own(ctx.bbc(ctx.exchange(own), bc_fns,
                                   guard=physicality_guard))

        def rhs(own, with_dt):
            """Own-rows RHS; with overlap the interior pass carries no
            dependence on the exchange, so XLA can hide the ppermute."""
            loc = ctx.exchange(own)
            if not use_overlap:
                out = euler_rhs_grid(ctx.bt, fluid, loc, with_dt=with_dt,
                                     cfl=cfl, high_order=high_order,
                                     fix3=fix3)
                if with_dt:
                    return ctx.own(out[0]), ctx.own(out[1])
                return ctx.own(out)
            fix_own = None if fix3 is None else ctx.with_dump(
                jax.lax.slice_in_dim(fix3, 0, own.shape[0], axis=0))
            fix_sub = None if fix3 is None else ctx.subgrid(fix3)
            out_i = euler_rhs_grid(ctx.bt_own, fluid, ctx.with_dump(own),
                                   with_dt=with_dt, cfl=cfl,
                                   high_order=high_order, fix3=fix_own)
            out_f = euler_rhs_grid(ctx.bt_sub, fluid, ctx.subgrid(loc),
                                   with_dt=with_dt, cfl=cfl,
                                   high_order=high_order, fix3=fix_sub)
            if with_dt:
                return (ctx.merge(out_i[0], out_f[0]),
                        ctx.merge(out_i[1][..., None],
                                  out_f[1][..., None])[..., 0])
            return ctx.merge(out_i, out_f)

        R0, dt3 = rhs(P_own, True)
        # where(), not multiply: pad blocks have no faces -> dt3 = inf there
        dt = jnp.where(active_own > 0, dt3, 0.0)[..., None]
        Q0 = primitive2state(fluid, P_own)
        P1 = bcs(state2primitive_guarded(fluid, Q0 + dt * R0))
        R1 = rhs(P1, False)
        P2 = bcs(state2primitive_guarded(fluid, Q0 + dt * (R0 + R1) / 2))
        resnorm = ctx.pmax(jnp.abs(R0[..., 0] * active_own).max())
        return P2, resnorm

    raw = sbd.shard_fn(sharded_step)
    extra = () if fix_loc is None else (fix_loc,)

    @jax.jit
    def step(P_sh):
        P2, res = raw(P_sh, active_sh, *extra)
        return P2, res[0]

    @jax.jit
    def march(P_sh, n_steps):
        def body(_, P_sh):
            return raw(P_sh, active_sh, *extra)[0]
        return jax.lax.fori_loop(0, n_steps, body, P_sh)

    P0_sh = sbd.distribute(np.asarray(case.P0))
    sbd.march = march
    return sbd, step, P0_sh, case
