"""Assembled RANS RAE2822: Wray-Agarwal transport + wall functions + mu_t
coupled into the viscous flux path (BASELINE workload 3)."""

import numpy as np
import pytest

from ibx.cases.rae2822_rans import build_rae2822_rans, wall_skin_friction
from ibx.cases.rae2822 import wall_cp


@pytest.fixture(scope="module")
def rans_case():
    return build_rae2822_rans(
        wall_h=2e-2, feature_h=1e-2, reynolds=6.5e6, cfl=0.5)


def test_rans_march_physical(rans_case):
    case = rans_case
    P, Rt = case.march(case.P0, case.Rt0, 400)
    P = np.asarray(P)
    Rt = np.asarray(Rt)
    assert np.isfinite(P).all() and np.isfinite(Rt).all()
    # eddy viscosity developed beyond the freestream seed somewhere
    assert Rt.max() > 10 * case.Rt_inf
    assert Rt.min() >= 0.0
    # pressure field physical: stagnation ahead of the leading edge
    cp = wall_cp(case, P)
    assert cp.max() > 0.6                        # stagnation point
    assert cp.min() < -0.4                       # suction side
    # skin friction: positive, boundary-layer magnitude on the wetted surface
    cf = wall_skin_friction(case, P)
    x = case.dom.surfaces["wall"].points[:, 0]
    mid = (x > 0.2) & (x < 0.8)
    assert np.isfinite(cf).all()
    assert cf[mid].mean() > 1e-4
    assert cf[mid].mean() < 5e-2


def test_rans_residual_drops(rans_case):
    case = rans_case
    P, Rt = case.P0, case.Rt0
    P, Rt, r0 = case.step(P, Rt)
    P, Rt = case.march(P, Rt, 300)
    _, _, r1 = case.step(P, Rt)
    assert float(r1) < float(r0)


def test_rans_block_path_matches_generic():
    """The grid-native RANS step (dense ops + BlockedBC) must reproduce
    the generic gather-path step."""
    import jax.numpy as jnp

    cb = build_rae2822_rans(wall_h=4e-2, feature_h=2e-2, use_blocks=True)
    cg = build_rae2822_rans(wall_h=4e-2, feature_h=2e-2, use_blocks=False)
    np.testing.assert_allclose(np.asarray(cb.P0), np.asarray(cg.P0),
                               rtol=2e-5)

    Pb, Rtb = cb.P0, cb.Rt0
    Pg, Rtg = cg.P0, cg.Rt0
    for _ in range(5):
        Pb, Rtb, _ = cb.step(Pb, Rtb)
        Pg, Rtg, _ = cg.step(Pg, Rtg)
    Pb, Rtb = np.asarray(Pb), np.asarray(Rtb)
    Pg, Rtg = np.asarray(Pg), np.asarray(Rtg)
    scale = np.abs(Pg).max(axis=0)
    err = (np.abs(Pb - Pg) / scale).max()
    assert err < 2e-4, f"RANS block-vs-generic P mismatch {err}"
    errR = np.abs(Rtb - Rtg).max() / (np.abs(Rtg).max() + 1e-12)
    assert errR < 2e-3, f"RANS block-vs-generic Rt mismatch {errR}"
