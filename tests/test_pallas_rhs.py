"""Parity oracle for the fused Pallas RHS kernels (ibx.ops.pallas_rhs)
against the XLA block fast path (ibx.ops.block_ops.euler_rhs_grid) —
which is itself held to the generic gather path by test_block_ops*.

Runs in interpret mode on CPU; the same kernels compile on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ibx.geometry import build_mesh, merge_points
from ibx.ops import block_ops as bops
from ibx.ops.pallas_rhs import euler_rhs_grid_pallas, pallas_eligible
from ibx.physics import make_fluid
from ibx.topology import Domain
from ibx.topology.blocks import build_block_tables

from test_3d import icosphere


@pytest.fixture(scope="module")
def sphere():
    stl = merge_points(icosphere())
    msh = build_mesh(
        [-4.0, -4.0, -4.0], [8.0, 8.0, 8.0],
        ("wall", stl, 0.25),
        block_size=4,
    )
    dom = Domain(
        msh,
        hypercube_families=[(
            "farfield",
            [(0, False), (0, True), (1, False), (1, True),
             (2, False), (2, True)],
        )],
    )
    return dom, build_block_tables(dom)


def _perturbed(dom, bt):
    rng = np.random.default_rng(3)
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    P = np.tile(np.array([p_inf, T_inf, 0.3 * a, 0.0, 0.0], np.float32),
                (dom.ncells, 1))
    x = dom.centers
    P[:, 0] *= 1 + 0.05 * np.sin(2 * x[:, 0]) * np.cos(x[:, 1])
    P[:, 1] *= 1 + 0.03 * np.cos(1.5 * x[:, 2])
    P[:, 2] += 30 * np.sin(x[:, 1] + x[:, 2])
    P[:, 3] += 25 * np.cos(x[:, 0]) * np.sin(x[:, 2])
    P[:, 4] += 20 * rng.standard_normal(dom.ncells)
    return bops.to_blocks(bt, jnp.asarray(P))


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-30)


def test_pallas_rhs_parity_octree(sphere):
    """Real octree mesh: 2:1 interfaces in all dims + hypercube boundary
    one-sided faces.  The fused kernels must reproduce the XLA block path
    to float-reassociation tolerance."""
    dom, bt = sphere
    fluid = make_fluid()
    P3 = _perturbed(dom, bt)
    assert pallas_eligible(bt) or bt.block_size == 4  # tables are clean

    R_ref, dt_ref, (du_ref, nu_ref) = bops.euler_rhs_grid(
        bt, fluid, P3, with_dt=True, cfl=0.5)
    R_p, dt_p, (du_p, nu_p) = euler_rhs_grid_pallas(
        bt, fluid, P3, with_dt=True, cfl=0.5)

    assert _rel(dt_ref, dt_p) < 1e-5, _rel(dt_ref, dt_p)
    assert _rel(nu_ref, nu_p) < 1e-4, _rel(nu_ref, nu_p)
    for d in range(3):
        assert _rel(du_ref[d], du_p[d]) < 1e-4, (d, _rel(du_ref[d], du_p[d]))
    assert _rel(R_ref, R_p) < 1e-4, _rel(R_ref, R_p)


def test_pallas_rhs_parity_low_order(sphere):
    dom, bt = sphere
    fluid = make_fluid()
    P3 = _perturbed(dom, bt)
    R_ref = bops.euler_rhs_grid(bt, fluid, P3, high_order=False)
    R_p = euler_rhs_grid_pallas(bt, fluid, P3, high_order=False)
    assert _rel(R_ref, R_p) < 1e-4, _rel(R_ref, R_p)


def test_pallas_dispatch_gate(sphere, monkeypatch):
    """euler_rhs_grid auto-dispatches to the fused kernels only for
    eligible configurations; ineligible kwargs fall back to XLA."""
    dom, bt = sphere
    fluid = make_fluid()
    P3 = _perturbed(dom, bt)
    # viscous config is ineligible -> must not raise, must run XLA path
    monkeypatch.setattr(bops, "_PALLAS_RHS", "auto")
    out = bops.euler_rhs_grid(bt, fluid, P3, viscous=True)
    assert np.isfinite(np.asarray(out)).all()
    monkeypatch.setattr(bops, "_PALLAS_RHS", "1")
    with pytest.raises(ValueError):
        bops.euler_rhs_grid(bt, fluid, P3, viscous=True)
