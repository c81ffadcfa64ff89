"""3D STL-sphere Euler case end to end (grid fast path + 3D blocked BC)."""

import numpy as np

from ibx.cases import build_sphere3d


def test_sphere3d_case_march():
    case = build_sphere3d(wall_h=0.12, block_size=4, surface_h=0.35)
    assert case.dom.nd == 3
    P = case.march(case.P0, 40)
    Pn = np.asarray(P)
    assert np.isfinite(Pn).all()
    # stagnation pressure rise ahead of the sphere (flow along +x)
    c = case.dom.centers
    front = (np.abs(c[:, 1]) < 0.3) & (np.abs(c[:, 2]) < 0.3) & \
            (c[:, 0] > -1.2) & (c[:, 0] < -0.55)
    assert Pn[front, 0].mean() > float(case.P_inf[0]) * 1.005
