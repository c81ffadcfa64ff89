"""Mirrored-ghost wall BC (flagged deviation; see BASELINE.md round 3).

The reference eta-blend (``src/ImmersedBoundary.jl:1220-1245``) gives slip-
wall ghosts a normal velocity of +eta*u_n(image); ``mirror_wall`` flips it
to -eta*u_n(image) so the wall actually reflects near-wall normal flow.
"""

import numpy as np

import jax.numpy as jnp

from ibx.cases import build_rae2822


def _cases():
    kw = dict(wall_h=4e-2, feature_h=2e-2, block_size=8)
    return (build_rae2822(mirror_wall=False, **kw),
            build_rae2822(mirror_wall=True, **kw))


def test_mirror_flips_ghost_normal_velocity():
    base, mir = _cases()
    hb = base.dom._host_boundaries["wall"]
    rng = np.random.default_rng(0)
    P = np.asarray(base.P0).copy()
    P[:, 2:] += rng.normal(0.0, 30.0, P[:, 2:].shape).astype(np.float32)

    Pb = np.asarray(base.apply_bcs(jnp.asarray(P)))
    Pm = np.asarray(mir.apply_bcs(jnp.asarray(P)))

    g = hb.ghosts
    n = hb.normals
    un_b = (Pb[g, 2:] * n).sum(1)
    un_m = (Pm[g, 2:] * n).sum(1)
    # thick-solid ghosts: mirrored u_n = -blended u_n; TE-sliver ghosts
    # (gated off) keep the reference value. Identify them by behavior and
    # check both patterns cover everything. Tolerance covers f32
    # cancellation at |u| ~ 240 m/s.
    tol = 0.15 + 1e-3 * np.abs(un_b)
    flipped = np.abs(un_m + un_b) < tol
    kept = np.abs(un_m - un_b) < tol
    assert (flipped | kept).all()
    # most of the airfoil is thicker than 2 cells at this resolution
    assert flipped.mean() > 0.5
    # non-velocity channels unchanged
    np.testing.assert_allclose(Pm[g, :2], Pb[g, :2], rtol=1e-6)


def test_mirror_blocked_matches_fused():
    _, mir = _cases()
    from ibx.ops.block_ops import to_blocks, to_flat

    rng = np.random.default_rng(1)
    P = np.asarray(mir.P0).copy()
    P[:, 2:] += rng.normal(0.0, 30.0, P[:, 2:].shape).astype(np.float32)

    P_f = np.asarray(mir.apply_bcs(jnp.asarray(P)))
    bt = mir.grid["bt"]
    P3 = to_blocks(bt, jnp.asarray(P))
    P_b = np.asarray(to_flat(bt, mir.grid["apply_bcs3"](P3)))
    np.testing.assert_allclose(P_b, P_f, rtol=2e-5, atol=2e-3)


def test_mirror_march_stable():
    _, mir = _cases()
    P = mir.march(mir.P0, 300)
    assert np.isfinite(np.asarray(P)).all()
