"""Parity oracle for the channel-split end-to-end march path
(`ops.pallas_rhs.rk2_step_cs` + `topology.blocked_bc.BlockedBC.cs`)
against the cell-major grid path — the state never leaving the Pallas
[B, C, bs, bs*bs] layout must change NOTHING numerically.

With the RHS forced onto the (interpret-mode) Pallas kernels on BOTH
sides, the only difference between the paths is layout plumbing, so the
tolerance here is float-tight (1e-6 rel), much tighter than the
kernel-vs-XLA oracle in test_pallas_rhs.py.
"""

import numpy as np

import jax.numpy as jnp

import pytest

from ibx.geometry import build_mesh, merge_points
from ibx.ops import block_ops as bops
from ibx.ops.pallas_rhs import cs_merge, cs_split, rk2_step_cs
from ibx.physics import make_fluid
from ibx.physics.bc import apply_flow_bc, flow_bc
from ibx.physics.fluid import physicality_guard
from ibx.topology import Domain
from ibx.topology.blocked_bc import build_blocked_bc
from ibx.topology.blocks import build_block_tables

from test_3d import icosphere
from test_pallas_rhs import _perturbed, _rel


@pytest.fixture(scope="module")
def case():
    stl = merge_points(icosphere())
    msh = build_mesh(
        [-4.0, -4.0, -4.0], [8.0, 8.0, 8.0],
        ("wall", stl, 0.25),
        block_size=8,   # pallas_eligible (the dispatch gate wants 8|16)
    )
    dom = Domain(
        msh,
        hypercube_families=[(
            "farfield",
            [(0, False), (0, True), (1, False), (1, True),
             (2, False), (2, True)],
        )],
    )
    bt = build_block_tables(dom)
    bbc = build_blocked_bc(dom, ["farfield", "wall"])
    fluid = make_fluid()
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    P_inf = np.array([p_inf, T_inf, 0.3 * a, 0.0, 0.0], np.float32)
    fns = {
        "farfield": lambda Pi, nrm: apply_flow_bc(
            flow_bc(fluid, P_inf), Pi, nrm),
        "wall": lambda Pi, nrm: apply_flow_bc(
            flow_bc(fluid, [p_inf, T_inf, 0.0], normal_flow=True),
            Pi, nrm),
    }
    return dom, bt, bbc, fluid, fns


def test_bc_cs_parity(case):
    """BlockedBC.cs == BlockedBC.__call__ on the same state (same rows,
    same sum order; only the gather source / write view differ)."""
    dom, bt, bbc, fluid, fns = case
    P3 = _perturbed(dom, bt)
    ref = bbc(P3, fns, guard=physicality_guard)
    out = cs_merge(bt, bbc.cs(cs_split(bt, P3), fns,
                              guard=physicality_guard))
    assert _rel(ref, out) < 1e-6, _rel(ref, out)


def test_rk2_cs_parity(case, monkeypatch):
    """One full RK2 step (RHS + guard + BC twice): cs path vs cell-major
    path with the RHS pinned to the Pallas kernels on both sides."""
    dom, bt, bbc, fluid, fns = case
    monkeypatch.setattr(bops, "_PALLAS_RHS", "1")
    P3 = _perturbed(dom, bt)
    P3 = bbc(P3, fns, guard=physicality_guard)   # consistent ghosts

    def bcs3(P):
        return bbc(P, fns, guard=physicality_guard)

    def bcs_cs(Pc):
        return bbc.cs(Pc, fns, guard=physicality_guard)

    ref, res_ref = bops.rk2_step_grid(bt, fluid, P3, bcs3, cfl=0.4)
    out_cs, res_cs = rk2_step_cs(bt, fluid, cs_split(bt, P3), bcs_cs,
                                 cfl=0.4)
    out = cs_merge(bt, out_cs)
    assert _rel(ref, out) < 1e-6, _rel(ref, out)
    assert abs(float(res_ref) - float(res_cs)) <= 1e-5 * abs(float(res_ref))


def test_rk2_cs_active_mask(case, monkeypatch):
    """active3 freeze mask: dt zeroed on inactive cells in both paths."""
    dom, bt, bbc, fluid, fns = case
    monkeypatch.setattr(bops, "_PALLAS_RHS", "1")
    from ibx.geometry.inside import points_inside
    stl = merge_points(icosphere())
    inside = points_inside(stl, dom.centers)
    active = jnp.asarray((~inside).astype(np.float32))
    active3 = bops.to_blocks(bt, active[:, None])[..., 0]
    P3 = _perturbed(dom, bt)

    def bcs3(P):
        return bbc(P, fns, guard=physicality_guard)

    def bcs_cs(Pc):
        return bbc.cs(Pc, fns, guard=physicality_guard)

    ref, _ = bops.rk2_step_grid(bt, fluid, P3, bcs3, cfl=0.4,
                                active3=active3)
    out_cs, _ = rk2_step_cs(bt, fluid, cs_split(bt, P3), bcs_cs, cfl=0.4,
                            active_cs=cs_split(bt, active3[..., None]))
    assert _rel(ref, cs_merge(bt, out_cs)) < 1e-6
