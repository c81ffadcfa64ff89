"""BlockedBC (run-window block path) vs FusedBoundary (row scatter) parity."""

import numpy as np
import jax.numpy as jnp

from ibx.cases import build_rae2822
from ibx.ops.block_ops import to_blocks, to_flat
from ibx.physics.bc import apply_flow_bc, flow_bc
from ibx.topology.blocked_bc import build_blocked_bc
from ibx.topology.blocks import build_block_tables


def test_blocked_bc_matches_fused():
    case = build_rae2822(wall_h=4e-2, feature_h=2e-2, cfl=0.7)
    dom = case.dom
    bt = build_block_tables(dom)
    fb = dom.fused_boundary(["farfield", "wall"])
    bbc = build_blocked_bc(dom, ["farfield", "wall"])
    G = int(fb.ghost.shape[0])
    # conforming hypercube ghosts go through the dense-plane path; the
    # general tables hold the rest (wall + non-conforming farfield)
    Gg = int(bbc.ghosts.shape[0])
    Gd = int(sum(np.asarray(m).sum() for m in bbc.dense_mask))
    assert Gg + Gd == G, (Gg, Gd, G)
    assert len(bbc.dense_spec) > 0, "dense farfield path unused"
    Gf = int(dom._host_boundaries["farfield"].ghosts.size)
    assert Gd > Gf // 2, (Gd, Gf)
    # stencil dedup: every general-path ghost maps to one unique stencil
    # (strict dedup wins now live in the dense path, which absorbs the
    # shared-stencil hypercube columns)
    assert bbc.n_patch + bbc.n_fb <= Gg
    assert bbc.g2u.shape[0] == Gg
    assert int(np.asarray(bbc.g2u).max()) == bbc.n_patch + bbc.n_fb - 1
    assert bbc.n_patch > 0, "patch fast path unused on the airfoil mesh"

    farfield_bc = flow_bc(case.fluid, case.P_inf)
    wall_bc = flow_bc(case.fluid, [float(case.P_inf[0]), 288.15, 0.0],
                      normal_flow=True)
    fns = {
        "farfield": lambda Pi, nrm: apply_flow_bc(farfield_bc, Pi, nrm),
        "wall": lambda Pi, nrm: apply_flow_bc(wall_bc, Pi, nrm),
    }

    rng = np.random.default_rng(0)
    P = np.asarray(case.P0).copy()
    P[:, 0] *= 1 + 0.05 * rng.standard_normal(P.shape[0])
    P[:, 1] *= 1 + 0.02 * rng.standard_normal(P.shape[0])
    P[:, 2:] += 20 * rng.standard_normal((P.shape[0], 2))
    P = jnp.asarray(P.astype(np.float32))

    ref = np.asarray(fb(P, fns))
    out = np.asarray(to_flat(bt, bbc(to_blocks(bt, P), fns)))

    # identical update set, equal values up to f32 summation order
    scale = np.abs(ref).max(axis=0)
    err = np.abs(out - ref) / scale
    assert err.max() < 2e-5, err.max()
    # non-ghost cells untouched
    ghosts = np.asarray(fb.ghost)
    keep = np.ones(P.shape[0], bool)
    keep[ghosts] = False
    assert np.array_equal(out[keep], np.asarray(P)[keep])
