"""Shared interpolation helper for solver-level grid transfers."""

from __future__ import annotations

import numpy as np

from ..ops.stencil import Stencil
from ..topology.interp import interpolator


def idw_interpolator(X_from: np.ndarray, X_to: np.ndarray) -> Stencil:
    """IDW kNN transfer operator between point clouds (k = 2^ndims),
    matching the reference multigrid interpolators
    (``src/ImmersedBoundary.jl:1391-1392`` with ``linear = false``)."""
    return interpolator(X_from, X_to, linear=False)
