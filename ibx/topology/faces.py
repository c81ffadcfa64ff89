"""Face detection over the octree cell soup (host side, vectorized).

Counterpart of reference ``src/ImmersedBoundary.jl:63-184``. Faces are
(dim, owner, neighbor) triples; the owner is the lower-coordinate cell.
Hanging faces (coarse cell adjacent to several fine cells) appear as several
distinct faces sharing the coarse owner/neighbor. Cells are identified by
0-based indices; ``-1`` marks the outside of the hypercube (reference uses 0
with 1-based indexing).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def octree2faces(origins: np.ndarray, widths: np.ndarray):
    """Find all interior faces between cells.

    The reference loops cells with a KDTree in-range query and tests the
    intersection box for exactly one degenerate dimension
    (``src/ImmersedBoundary.jl:63-132``); here the same test runs vectorized
    over all candidate pairs at once.

    Returns (dim int32[F], owner int32[F], neighbor int32[F]).
    """
    origins = np.asarray(origins, dtype=np.float32)
    widths = np.asarray(widths, dtype=np.float32)
    N, nd = origins.shape
    centers = origins + widths / 2
    radii = np.sqrt((widths.astype(np.float64) ** 2).sum(1)) / 2

    tree = cKDTree(centers)
    pairs_list = tree.query_ball_point(centers, radii * 3.1, workers=-1)
    counts = np.fromiter((len(p) for p in pairs_list), dtype=np.int64, count=N)
    i = np.repeat(np.arange(N, dtype=np.int64), counts)
    j = np.concatenate([np.asarray(p, dtype=np.int64) for p in pairs_list]) \
        if counts.sum() else np.empty(0, dtype=np.int64)
    keep = i != j
    i, j = i[keep], j[keep]

    mins = np.maximum(origins[i], origins[j])
    maxs = np.minimum(origins[i] + widths[i], origins[j] + widths[j])
    fw = maxs - mins
    tol = 0.01 * fw.max(axis=1)
    n_deg = (fw < tol[:, None]).sum(axis=1)
    n_neg = (fw < -tol[:, None]).sum(axis=1)
    planar = (n_deg == 1) & (n_neg == 0)
    i, j, fw = i[planar], j[planar], fw[planar]
    ndim = fw.argmin(axis=1)

    # register each face once, from the left (owner) side
    right = origins[j, ndim] >= origins[i, ndim]
    i, j, ndim = i[right], j[right], ndim[right]
    return (
        ndim.astype(np.int32),
        i.astype(np.int32),
        j.astype(np.int32),
    )


def hcube_faces(hcube_origin, hcube_widths, origins, widths):
    """Faces where cells touch the outer hypercube (owner or neighbor = -1).

    Reference ``src/ImmersedBoundary.jl:150-184``.
    """
    hcube_origin = np.asarray(hcube_origin, dtype=np.float32)
    hcube_widths = np.asarray(hcube_widths, dtype=np.float32)
    origins = np.asarray(origins, dtype=np.float32)
    widths = np.asarray(widths, dtype=np.float32)
    nd = hcube_origin.size

    dims, owners, neighbors = [], [], []
    for d in range(nd):
        lo = np.nonzero(
            np.abs(origins[:, d] - hcube_origin[d]) < widths[:, d] * 0.01
        )[0]
        dims.append(np.full(lo.size, d))
        owners.append(np.full(lo.size, -1))
        neighbors.append(lo)
        hi = np.nonzero(
            np.abs(origins[:, d] + widths[:, d]
                   - hcube_origin[d] - hcube_widths[d]) < widths[:, d] * 0.01
        )[0]
        dims.append(np.full(hi.size, d))
        owners.append(hi)
        neighbors.append(np.full(hi.size, -1))
    return (
        np.concatenate(dims).astype(np.int32),
        np.concatenate(owners).astype(np.int32),
        np.concatenate(neighbors).astype(np.int32),
    )
