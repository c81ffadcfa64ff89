"""Sharded BLOCK fast path vs single-device grid fast path parity.

The key multi-chip correctness check (SURVEY §4: partition-count
invariance), on the dense block path: an 8-virtual-device march must match
the single-device march to f32 round-off.
"""

import numpy as np

import jax.numpy as jnp

from ibx.cases.rae2822_block_sharded import build_rae2822_block_sharded


def test_sharded_block_matches_single_device():
    sbd, step, P0_sh, case = build_rae2822_block_sharded(
        8, wall_h=4e-2, feature_h=2e-2, cfl=0.7)
    assert len(sbd.offs) >= 1           # real neighbor exchange happening
    # initial distribution roundtrip
    np.testing.assert_array_equal(
        sbd.collect(P0_sh), np.asarray(case.P0))

    P_sh = P0_sh
    P_ref = case.P0
    for _ in range(5):
        P_sh, res_sh = step(P_sh)
        P_ref, res_ref = case.step(P_ref)
    out = sbd.collect(P_sh)
    ref = np.asarray(P_ref)
    assert np.isfinite(out).all()
    scale = np.abs(ref).max(axis=0)
    err = (np.abs(out - ref) / scale).max()
    assert err < 2e-5, f"sharded-vs-single mismatch {err}"
    # residual norms agree too
    np.testing.assert_allclose(float(res_sh), float(res_ref), rtol=1e-3)

    # --- shock-developed state: the JST sensor is active, so face fluxes
    # at chunk boundaries consume nu3/du3 AT halo cells — this is what the
    # round-2 one-ring halo got wrong (7.5e-4 error, invisible from
    # freestream where the sensor vanishes). March single-device into the
    # nonlinear regime, then demand step parity to f32 round-off.
    P_dev = np.asarray(case.march(case.P0, 400))
    P_sh = sbd.distribute(P_dev)
    P_ref = jnp.asarray(P_dev)
    for _ in range(3):
        P_sh, _ = step(P_sh)
        P_ref, _ = case.step(P_ref)
    out = sbd.collect(P_sh)
    ref = np.asarray(P_ref)
    assert np.isfinite(out).all()
    scale = np.abs(ref).max(axis=0)
    err = (np.abs(out - ref) / scale).max()
    assert err < 2e-5, f"sharded-vs-single (shocked) mismatch {err}"
