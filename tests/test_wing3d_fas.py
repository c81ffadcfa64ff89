"""BASELINE workload 5 (3D RANS wing + FAS, multi-device): the sharded
march and FAS cycle must match the 1-device run, and cycles must keep the
state physical.
"""

import numpy as np
import pytest

from ibx.cases.wing3d_rans_fas import build_wing3d_rans_fas

# two full 3D wing builds (~minutes each on the 1-CPU box): slow tier
pytestmark = pytest.mark.slow

KW = dict(wall_h=0.25, span=0.5, farfield=2.0, block_size=8,
          n_coarse_iter=4)


@pytest.fixture(scope="module")
def cases():
    c8 = build_wing3d_rans_fas(8, **KW)
    c1 = build_wing3d_rans_fas(1, **KW)
    return c8, c1


def test_wing3d_march_parity(cases):
    c8, c1 = cases
    S8 = c8.collect(c8.march(c8.S0_sh, 10))
    S1 = c1.collect(c1.march(c1.S0_sh, 10))
    assert np.isfinite(S8).all() and np.isfinite(S1).all()
    scale = np.abs(S1).max(axis=0) + 1e-12
    err = np.abs(S8 - S1) / scale
    assert err.max() < 2e-5, err.max()


def test_wing3d_fas_cycle_parity(cases):
    c8, c1 = cases
    S8, r8 = c8.fas_cycle(c8.S0_sh)
    S1, r1 = c1.fas_cycle(c1.S0_sh)
    S8n, S1n = c8.collect(S8), c1.collect(S1)
    assert np.isfinite(S8n).all() and np.isfinite(S1n).all()
    scale = np.abs(S1n).max(axis=0) + 1e-12
    err = np.abs(S8n - S1n) / scale
    assert err.max() < 5e-5, err.max()
    assert np.isfinite(float(r8)) and np.isfinite(float(r1))


def test_wing3d_fas_marches_physical(cases):
    c8, _ = cases
    S = c8.S0_sh
    for _ in range(2):
        S = c8.march(S, 20)
        S, _ = c8.fas_cycle(S)
    Sn = c8.collect(S)
    assert np.isfinite(Sn).all()
    P = Sn[:, :5]
    assert P[:, 0].min() > 1e3 and P[:, 0].max() < 1e6
    assert (P[:, 1] > 50.0).all()
    assert (Sn[:, 5] >= 0.0).all()
