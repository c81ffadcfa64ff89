"""Viscous / RANS building blocks wired end to end on a small domain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.geometry import build_mesh, polyline
from ibx.ops import operators as ops
from ibx.physics import make_fluid, dynamic_viscosity
from ibx.physics import turbulence
from ibx.solve.euler import euler_rhs, rk2_step
from ibx.topology import Domain


@pytest.fixture(scope="module")
def channel():
    lower = polyline(np.array([[0.0, 0.0], [1.0, 0.0]]), closed=False)
    msh = build_mesh(
        [0.0, 0.0], [1.0, 1.0],
        ("wall", lower, 5e-2),
        block_size=4,
    )
    dom = Domain(msh, hypercube_families=[
        ("io", [(0, False), (0, True), (1, True)]),
    ])
    return dom


def test_viscous_block_parity():
    """Dense-path viscous RHS must reproduce the generic gather path on the
    flagship mesh (incl. 2:1 interfaces and hypercube boundaries)."""
    from ibx.cases import build_rae2822
    from ibx.ops import block_ops as bops
    from ibx.topology.blocks import build_block_tables

    case = build_rae2822(wall_h=8e-2, feature_h=4e-2)
    dom = case.dom
    part = dom.partitions[0]
    bt = build_block_tables(dom)
    rng = np.random.default_rng(3)
    P = np.asarray(case.P0).copy()
    x, y = dom.centers[:, 0], dom.centers[:, 1]
    P[:, 0] *= (1.0 + 0.05 * np.sin(x) * np.cos(y)).astype(np.float32)
    P[:, 2] += 25.0 * np.sin(y).astype(np.float32)
    P[:, 3] += 12.0 * np.cos(x).astype(np.float32)
    P = jnp.asarray(P)
    mu_t = jnp.asarray(
        (1e-4 * (1.0 + np.abs(np.sin(5 * x)))).astype(np.float32))

    R_ref = np.asarray(jax.jit(
        lambda P: euler_rhs(part, case.fluid, P, viscous=True, mu_t=mu_t)
    )(P))
    mu_t3 = bops.to_blocks(bt, mu_t[:, None])
    R_blk = np.asarray(jax.jit(
        lambda P3: bops.euler_rhs_grid(bt, case.fluid, P3, viscous=True,
                                       mu_t3=mu_t3)
    )(bops.to_blocks(bt, P))).reshape(-1, 4)

    scale = np.abs(R_ref).max(axis=0) + 1e-3
    err = np.abs(R_blk - R_ref) / scale
    assert err.max() < 2e-4, f"viscous block parity max rel err {err.max()}"


def test_viscous_rhs_finite_and_dissipative(channel):
    dom = channel
    part = dom.partitions[0]
    fluid = make_fluid()
    N = dom.ncells
    # shear flow: u varies with y
    y = dom.centers[:, 1]
    P = np.tile(np.array([1.0e5, 288.15, 0.0, 0.0], np.float32), (N, 1))
    P[:, 2] = 50.0 * y
    P = jnp.asarray(P)

    R_inv = np.asarray(euler_rhs(part, fluid, P, viscous=False))
    R_vis = np.asarray(euler_rhs(part, fluid, P, viscous=True))
    assert np.isfinite(R_vis).all()
    diff = R_vis - R_inv
    # viscous terms act on x-momentum: d/dy(mu du/dy) ~ 0 for linear u, but
    # boundary faces and jumps give nonzero entries; mostly check the
    # x-momentum column carries the viscous signal
    assert np.abs(diff[:, 2]).max() > 0

    # eddy viscosity array path
    mu_t = jnp.full(N, 1e-4)
    R_t = np.asarray(euler_rhs(part, fluid, P, viscous=True, mu_t=mu_t))
    assert np.isfinite(R_t).all()
    assert np.abs(R_t - R_vis).max() > 0


def test_wall_model_pipeline(channel):
    """Wall-function -> eddy viscosity -> du/dn feeding the slip-wall BC
    (the reference's wall-modelled RANS recipe)."""
    dom = channel
    fluid = make_fluid()
    surf = dom.surfaces["wall"]
    N = dom.ncells
    u = jnp.asarray(50.0 * dom.centers[:, 1].astype(np.float32))
    # sample velocity at the wall-model offset points
    u_off = surf.at_offset(u)
    y = jnp.asarray(surf.offsets * 1.5)
    nu = float(dynamic_viscosity(fluid, jnp.asarray(288.15))) / 1.2
    ws = turbulence.wall_function(y, jnp.abs(u_off) + 1e-3,
                                  jnp.full(u_off.shape, nu))
    assert np.isfinite(np.asarray(ws.u_tau)).all()
    assert np.isfinite(np.asarray(ws.du_dn)).all()
    assert (np.asarray(ws.nu_t) >= 0).all()

    # Wray-Agarwal source terms from the resolved field
    part = dom.partitions[0]
    g = [[ops.cell_gradient(part, u, j) for j in range(2)],
         [ops.cell_gradient(part, jnp.zeros(N), j) for j in range(2)]]
    S = turbulence.shear_rate(g)
    Rfield = jnp.full(N, 3 * nu)
    gradR = jnp.stack([ops.cell_gradient(part, Rfield, j)
                       for j in range(2)], axis=1)
    gradS = jnp.stack([ops.cell_gradient(part, S, j)
                       for j in range(2)], axis=1)
    wa = turbulence.wray_agarwal(Rfield, S, gradR, gradS)
    assert np.isfinite(np.asarray(wa["S"])).all()
    assert np.isfinite(np.asarray(wa["nu_R"])).all()
