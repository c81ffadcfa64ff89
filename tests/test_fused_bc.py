"""The fused one-gather/one-scatter BC path must equal the sequential
per-family impose_bc path."""

import numpy as np
import jax.numpy as jnp

from ibx.cases import build_rae2822


def test_fused_bc_matches_sequential():
    case = build_rae2822(wall_h=8e-2, feature_h=4e-2, cfl=0.7)
    rng = np.random.default_rng(0)
    P = np.asarray(case.P0).copy()
    P[:, 0] *= 1.0 + 0.05 * rng.normal(size=P.shape[0]).astype(np.float32)
    P[:, 2] += 20.0 * rng.normal(size=P.shape[0]).astype(np.float32)
    P = jnp.asarray(P)
    # build_rae2822 exposes the fused path as apply_bcs (single partition);
    # recreate the sequential path here
    from ibx.physics import apply_flow_bc, flow_bc, make_fluid

    fluid = case.fluid
    far = flow_bc(fluid, case.P_inf)
    wall = flow_bc(
        fluid, [float(case.P_inf[0]), float(case.P_inf[1]), 0.0],
        normal_flow=True,
    )

    def seq(P):
        P = case.dom.impose_bc(
            "farfield", lambda b, Pi: apply_flow_bc(far, Pi, b.normals), P)
        P = case.dom.impose_bc(
            "wall", lambda b, Pi: apply_flow_bc(wall, Pi, b.normals), P)
        return P

    out_fused = np.asarray(case.apply_bcs(P))
    out_seq = np.asarray(seq(P))
    np.testing.assert_allclose(out_fused, out_seq, rtol=1e-5, atol=1e-3)
