"""3D parity oracle: block fast path vs generic operators on the STL-sphere
octree mesh (refinement jumps in all three dims + hypercube boundaries)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.geometry import build_mesh, merge_points
from ibx.ops import block_ops as bops
from ibx.physics import apply_flow_bc, flow_bc, make_fluid
from ibx.solve.euler import euler_rhs, local_timestep
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
    return msh, dom, build_block_tables(dom)


def test_3d_structured_coverage(sphere):
    msh, dom, bt = sphere
    # the octree has refinement jumps; the structured 2:1 path must engage
    n_fs = sum(int(np.asarray(bt.fs_block[d][s]).shape[0])
               for d in range(3) for s in range(2))
    n_cs = sum(int(np.asarray(bt.cs_block[d][s]).shape[0])
               for d in range(3) for s in range(2))
    assert n_fs > 0 and n_cs > 0
    # every 2:1 face is covered once from each side: fine side has
    # bs^2 faces per entry, coarse side 4 bs^2 per entry
    bs = bt.block_size
    assert n_fs * bs * bs == n_cs * 4 * bs * bs
    # nothing left for the sparse fallback on this mesh
    assert sum(int(np.asarray(bt.sp_owner[d]).shape[0]) for d in range(3)) == 0


def _perturbed_state(dom):
    rng = np.random.default_rng(0)
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    P = np.tile(np.array([p_inf, T_inf, 0.3 * a, 0.0, 0.0], np.float32),
                (dom.ncells, 1))
    x, y, z = dom.centers[:, 0], dom.centers[:, 1], dom.centers[:, 2]
    P[:, 0] *= (1.0 + 0.05 * np.sin(x) * np.cos(y + z)).astype(np.float32)
    P[:, 1] *= (1.0 + 0.02 * np.cos(x * y)).astype(np.float32)
    P[:, 2] += 20.0 * np.sin(y).astype(np.float32)
    P[:, 3] += 10.0 * np.cos(z).astype(np.float32)
    P[:, 4] += 10.0 * np.sin(x + z).astype(np.float32)
    return jnp.asarray(P)


def test_3d_rhs_parity(sphere):
    msh, dom, bt = sphere
    part = dom.partitions[0]
    fluid = make_fluid()
    P = _perturbed_state(dom)
    R_ref = np.asarray(jax.jit(
        lambda P: euler_rhs(part, fluid, P, high_order=True))(P))
    R_blk = np.asarray(jax.jit(
        lambda P: bops.euler_rhs_block(bt, fluid, P, high_order=True))(P))
    scale = np.abs(R_ref).max(axis=0) + 1e-3
    err = np.abs(R_blk - R_ref) / scale
    assert err.max() < 2e-4, f"max rel err {err.max()}"


def test_3d_dt_parity(sphere):
    msh, dom, bt = sphere
    part = dom.partitions[0]
    fluid = make_fluid()
    P = _perturbed_state(dom)
    dt_ref = np.asarray(jax.jit(
        lambda P: local_timestep(part, fluid, P, 0.7))(P))
    _, dt_blk, _ = jax.jit(
        lambda P: bops.euler_rhs_block(bt, fluid, P, with_dt=True, cfl=0.7)
    )(P)
    np.testing.assert_allclose(np.asarray(dt_blk), dt_ref, rtol=1e-4)


def test_3d_blocked_bc_parity(sphere):
    from ibx.topology.blocked_bc import build_blocked_bc

    msh, dom, bt = sphere
    fluid = make_fluid()
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    P_inf = np.array([p_inf, T_inf, 0.3 * a, 0.0, 0.0], np.float32)
    far = flow_bc(fluid, P_inf)
    wall = flow_bc(fluid, [p_inf, T_inf, 0.0], normal_flow=True)
    fns = {
        "farfield": lambda Pi, nrm: apply_flow_bc(far, Pi, nrm),
        "wall": lambda Pi, nrm: apply_flow_bc(wall, Pi, nrm),
    }
    fb = dom.fused_boundary(["farfield", "wall"])
    bbc = build_blocked_bc(dom, ["farfield", "wall"])

    P = _perturbed_state(dom)
    ref = np.asarray(fb(P, fns))
    out = np.asarray(bops.to_flat(bt, bbc(bops.to_blocks(bt, P), fns)))
    scale = np.abs(ref).max(axis=0)
    assert (np.abs(out - ref) / scale).max() < 2e-5
