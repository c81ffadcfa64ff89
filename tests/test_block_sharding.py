"""Sharded BLOCK fast path vs single-device grid fast path parity.

The key multi-chip correctness check (SURVEY §4: partition-count
invariance), on the dense block path: an 8-virtual-device march must match
the single-device march to f32 round-off.
"""

import numpy as np

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
