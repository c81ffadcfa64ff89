"""RAE2822 Euler accuracy regression against a stored converged solution.

The stored snapshot (tests/data/rae2822_cp_reference.npz) is the 30000-step
converged wall-Cp of the coarse case (wall_h=1e-2, M=0.73, alpha=2.31), which
sits in a small shock limit cycle (Cl = 0.85 +/- 0.02). A shorter march must
reproduce the Cp distribution's shape and level — this is the oracle that
catches scheme/BC regressions.
"""

import os

import numpy as np
import jax
import pytest

from ibx.cases import build_rae2822, force_coefficients, wall_cp

REF = os.path.join(os.path.dirname(__file__), "data",
                   "rae2822_cp_reference.npz")


@pytest.mark.slow
def test_rae2822_cp_regression():
    ref = np.load(REF)
    case = build_rae2822(wall_h=1e-2, feature_h=5e-3, cfl=0.7)
    P = case.P0
    for _ in range(5):
        P = case.march(P, 1000)
        jax.block_until_ready(P)
    Pn = np.asarray(P)
    assert np.isfinite(Pn).all()

    cp = wall_cp(case, Pn)
    cp_ref = ref["cp"]
    assert cp.shape == cp_ref.shape

    # shape agreement with the converged field (5000 steps is mid-transient:
    # stagnation/suction are established, circulation still building toward
    # the converged Cl ~ 0.85)
    corr = np.corrcoef(cp, cp_ref)[0, 1]
    assert corr > 0.75, f"Cp correlation {corr}"
    # stagnation and suction levels
    assert cp.max() > 0.85
    assert cp.min() < -0.7

    cl, cd = force_coefficients(case, Pn)
    assert 0.25 < cl < 1.1, f"Cl={cl}"
    assert abs(cd) < 0.12, f"Cd={cd}"
