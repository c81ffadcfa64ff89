"""Parity oracle: the dense block fast path must reproduce the generic
gather-based operators on the same mesh (including refinement jumps and
hypercube boundaries)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.cases import build_rae2822
from ibx.ops import block_ops as bops
from ibx.ops import operators as ops
from ibx.solve.euler import euler_rhs, local_timestep
from ibx.topology.blocks import build_block_tables


@pytest.fixture(scope="module")
def case():
    return build_rae2822(wall_h=8e-2, feature_h=4e-2, cfl=0.7)


@pytest.fixture(scope="module")
def bt(case):
    return build_block_tables(case.dom)


def test_block_tables_cover_all_faces(case, bt):
    dom = case.dom
    n_sparse = sum(int(np.asarray(bt.sp_owner[d]).shape[0]) for d in range(2))
    bs = bt.block_size
    B = bt.n_blocks
    # dense faces: intra-block + plus-side valid edges + minus-side boundary
    n_intra = B * 2 * bs * (bs - 1)
    n_edge = int(sum(np.asarray(bt.edge_valid[d][1]).sum()
                     + np.asarray(bt.bnd[d][0]).sum() for d in range(2))) * bs
    # structured 2:1 faces (each covered by one fine-side and one
    # coarse-side entry; count via fine sides, 1 face per fine edge cell)
    n_fs = int(sum(np.asarray(bt.fs_block[d][s]).shape[0]
                   for d in range(2) for s in range(2))) * bs
    assert n_sparse + n_intra + n_edge + n_fs == dom.face_dim.shape[0]
    # the structured + dense paths should cover everything on this mesh
    assert n_sparse == 0
    # structured interfaces must be symmetric: every fine-side face has a
    # coarse-side counterpart covering 2 faces
    n_cs = int(sum(np.asarray(bt.cs_block[d][s]).shape[0]
                   for d in range(2) for s in range(2))) * 2 * bs
    assert n_cs == n_fs


def test_rhs_parity(case, bt):
    dom = case.dom
    part = dom.partitions[0]
    rng = np.random.default_rng(0)
    # a non-trivial smooth + noisy state around freestream
    P = np.asarray(case.P0).copy()
    x, y = dom.centers[:, 0], dom.centers[:, 1]
    P[:, 0] *= (1.0 + 0.05 * np.sin(x) * np.cos(y)).astype(np.float32)
    P[:, 1] *= (1.0 + 0.02 * np.cos(x)).astype(np.float32)
    P[:, 2] += 20.0 * np.sin(y).astype(np.float32)
    P[:, 3] += 10.0 * np.cos(x).astype(np.float32)
    P = jnp.asarray(P)

    R_ref = np.asarray(jax.jit(
        lambda P: euler_rhs(part, case.fluid, P, high_order=True)
    )(P))
    R_blk = np.asarray(jax.jit(
        lambda P: bops.euler_rhs_block(bt, case.fluid, P, high_order=True)
    )(P))

    scale = np.abs(R_ref).max(axis=0) + 1e-3
    err = np.abs(R_blk - R_ref) / scale
    assert err.max() < 2e-4, f"max rel err {err.max()}"


def test_rhs_parity_te_fix(case, bt):
    """The trailing-edge robustness blend (first-order + Einfeldt speeds)
    must agree between the generic and block paths, and must actually
    change the residual where the blend is active."""
    dom = case.dom
    part = dom.partitions[0]
    P = np.asarray(case.P0).copy()
    x, y = dom.centers[:, 0], dom.centers[:, 1]
    P[:, 0] *= (1.0 + 0.05 * np.sin(3 * x) * np.cos(y)).astype(np.float32)
    P[:, 2] += 30.0 * np.sin(2 * y).astype(np.float32)
    P = jnp.asarray(P)
    r = 0.3
    d_te = np.sqrt((x - 1.0) ** 2 + y ** 2)
    fix = np.clip((2 * r - d_te) / r, 0.0, 1.0).astype(np.float32)
    fixj = jnp.asarray(fix)

    R_ref = np.asarray(jax.jit(
        lambda P: euler_rhs(part, case.fluid, P, fix=fixj)
    )(P))
    R_blk = np.asarray(jax.jit(
        lambda P: bops.euler_rhs_block(bt, case.fluid, P, fix=fixj)
    )(P))
    scale = np.abs(R_ref).max(axis=0) + 1e-3
    err = np.abs(R_blk - R_ref) / scale
    assert err.max() < 2e-4, f"max rel err {err.max()}"

    R_plain = np.asarray(jax.jit(
        lambda P: euler_rhs(part, case.fluid, P)
    )(P))
    changed = np.abs(R_plain - R_ref).max(axis=1)
    assert changed[fix > 0.5].max() > 0
    # far from the TE the scheme is untouched
    assert changed[d_te > 2 * r + 0.5].max() == 0.0


def test_dt_parity(case, bt):
    dom = case.dom
    part = dom.partitions[0]
    P = case.P0
    dt_ref = np.asarray(jax.jit(
        lambda P: local_timestep(part, case.fluid, P, 0.7)
    )(P))
    _, dt_blk, _ = jax.jit(
        lambda P: bops.euler_rhs_block(bt, case.fluid, P, with_dt=True,
                                       cfl=0.7)
    )(P)
    np.testing.assert_allclose(np.asarray(dt_blk), dt_ref, rtol=1e-4)


def test_step_parity_multi(case, bt):
    """March both paths a few steps with identical BCs; fields must agree."""
    from ibx.solve.euler import rk2_step

    part = case.dom.partitions[0]

    def step_ref(P):
        return rk2_step(part, case.fluid, P, case.apply_bcs, cfl=0.7)[0]

    def step_blk(P):
        return bops.rk2_step_block(bt, case.fluid, P, case.apply_bcs,
                                   cfl=0.7)[0]

    P_r = case.P0
    P_b = case.P0
    jr = jax.jit(step_ref)
    jb = jax.jit(step_blk)
    for _ in range(5):
        P_r = jr(P_r)
        P_b = jb(P_b)
    P_r = np.asarray(P_r)
    P_b = np.asarray(P_b)
    scale = np.abs(P_r).max(axis=0)
    assert (np.abs(P_b - P_r) / scale).max() < 1e-3


def test_residual_smoothing_preserves_steady_state(case, bt):
    """IRS must be a no-op on a zero residual and keep magnitudes bounded."""
    import jax.numpy as jnp
    from ibx.ops.block_ops import smooth_residual_grid, to_blocks

    Z = to_blocks(bt, jnp.zeros((case.dom.ncells, 4), jnp.float32))
    out = np.asarray(smooth_residual_grid(bt, Z, eps=0.6))
    assert np.abs(out).max() == 0.0

    rng = np.random.default_rng(0)
    R3 = to_blocks(bt, jnp.asarray(
        rng.standard_normal((case.dom.ncells, 4)).astype(np.float32)))
    Rs = np.asarray(smooth_residual_grid(bt, R3, eps=0.6))
    assert np.isfinite(Rs).all()
    # smoothing is an averaging filter: it must not amplify
    assert np.abs(Rs).max() <= np.abs(np.asarray(R3)).max() * 1.001


def test_rk2_irs_step_finite(case, bt):
    from ibx.ops.block_ops import rk2_step_grid, to_blocks, to_flat
    from ibx.topology.blocked_bc import build_blocked_bc
    from ibx.physics.bc import apply_flow_bc, flow_bc

    bbc = build_blocked_bc(case.dom, ["farfield", "wall"])
    far = flow_bc(case.fluid, case.P_inf)
    wall = flow_bc(case.fluid, [float(case.P_inf[0]), 288.15, 0.0],
                   normal_flow=True)
    fns = {"farfield": lambda Pi, n: apply_flow_bc(far, Pi, n),
           "wall": lambda Pi, n: apply_flow_bc(wall, Pi, n)}
    P3 = to_blocks(bt, case.P0)
    P3, res = rk2_step_grid(bt, case.fluid, P3, lambda p: bbc(p, fns),
                            cfl=1.2, irs_eps=0.5)
    assert np.isfinite(np.asarray(to_flat(bt, P3))).all()
    assert np.isfinite(float(res))
