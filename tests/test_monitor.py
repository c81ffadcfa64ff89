"""ResidualMonitor observability utility."""

import numpy as np

from ibx.utils import ResidualMonitor, profile_trace


def test_residual_monitor():
    mon = ResidualMonitor(label="t")
    for r in [1.0, 0.5, 0.2, 0.1, 0.05, 2e-5]:
        mon.push(r, cl=0.5)
    assert mon.r0 == 1.0
    assert abs(mon.drop() - 2e-5) < 1e-12
    assert mon.converged(rtol=1e-4)
    assert not mon.converged(rtol=1e-6)
    assert 0.0 < mon.rate() < 1.0
    s = mon.summary()
    assert s["iterations"] == 6 and s["residual_last"] == 2e-5


def test_profile_trace_noop():
    with profile_trace(None):
        x = np.ones(4).sum()
    assert x == 4.0
