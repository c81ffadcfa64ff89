"""Point-in-solid tests (host side).

The reference meshes the full hypercube including cells inside solid bodies
and leaves them evolving freely behind the ghost layer (SURVEY.md §1.1 /
``docs/theory.pdf`` ch. 3 describes blanking as intent, unimplemented). At
fine resolutions free interior cells can run away and contaminate image-point
stencils, so the solver freezes them — which needs a signed inside/outside
classification.
"""

from __future__ import annotations

import numpy as np

from .stereolitography import Stereolitography


def points_inside_2d(stl: Stereolitography, pts: np.ndarray,
                     chunk: int = 0) -> np.ndarray:
    """Winding-number (crossing) test for closed 2D polylines.

    pts: [N, 2]. Returns bool[N], True strictly inside.
    """
    pts = np.asarray(pts, dtype=np.float64)
    seg = stl.points[stl.simplices].astype(np.float64)  # [M, 2, 2]
    if chunk <= 0:
        # keep the [chunk, M] crossing matrix cache-resident: a 65536-row
        # chunk against a refined surface (~12k segments) allocates
        # multi-GB temporaries and thrashes this 1-CPU box
        chunk = max(256, (1 << 22) // max(1, seg.shape[0]))
    x1, y1 = seg[:, 0, 0], seg[:, 0, 1]
    x2, y2 = seg[:, 1, 0], seg[:, 1, 1]

    inside = np.zeros(pts.shape[0], dtype=bool)
    # prefilter by bounding box
    bb_lo = seg.reshape(-1, 2).min(axis=0)
    bb_hi = seg.reshape(-1, 2).max(axis=0)
    cand = np.nonzero(
        np.all((pts >= bb_lo) & (pts <= bb_hi), axis=1)
    )[0]

    for s in range(0, cand.size, chunk):
        idx = cand[s:s + chunk]
        px = pts[idx, 0][:, None]
        py = pts[idx, 1][:, None]
        cond = (y1[None, :] <= py) != (y2[None, :] <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = x1[None, :] + (py - y1[None, :]) * (
                x2[None, :] - x1[None, :]
            ) / (y2[None, :] - y1[None, :])
        crossings = (cond & (px < x_int)).sum(axis=1)
        inside[idx] = (crossings % 2) == 1
    return inside


def points_inside_3d(stl: Stereolitography, pts: np.ndarray,
                     chunk: int = 0) -> np.ndarray:
    """Ray-parity test for closed triangulated surfaces (+x ray).

    pts: [N, 3]. Returns bool[N], True inside (parity of triangle
    crossings along the +x direction).
    """
    pts = np.asarray(pts, dtype=np.float64)
    tri = stl.points[stl.simplices].astype(np.float64)  # [M, 3, 3]
    if chunk <= 0:
        # [chunk, M, 3] temporaries must stay cache-resident (see 2D note)
        chunk = max(64, (1 << 21) // max(1, tri.shape[0]))
    inside = np.zeros(pts.shape[0], dtype=bool)
    bb_lo = tri.reshape(-1, 3).min(axis=0)
    bb_hi = tri.reshape(-1, 3).max(axis=0)
    cand = np.nonzero(
        np.all((pts >= bb_lo) & (pts <= bb_hi), axis=1)
    )[0]
    if cand.size == 0:
        return inside

    # Moeller-Trumbore along a (near-)+x ray, batched over points x
    # triangles. The direction is tilted by irrational components so rays
    # from points on axis-aligned feature planes (e.g. the ring stations of
    # a lofted wing) never travel inside a triangle plane or exactly
    # through shared edges — the classic ray-parity degeneracy (a shared
    # edge hit counts in both triangles and cancels).
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    d = np.array([1.0, 1e-4 * np.sqrt(2.0), 1e-4 * np.sqrt(3.0)])
    d = d / np.linalg.norm(d)
    pvec = np.cross(d, e2)                      # [M, 3]
    det = (e1 * pvec).sum(axis=1)               # [M]
    ok = np.abs(det) > 1e-14
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)

    for s in range(0, cand.size, chunk):
        idx = cand[s:s + chunk]
        tvec = pts[idx][:, None, :] - v0[None, :, :]      # [n, M, 3]
        u = (tvec * pvec[None, :, :]).sum(axis=2) * inv_det[None, :]
        qvec = np.cross(tvec, e1[None, :, :])
        v = (qvec * d).sum(axis=2) * inv_det[None, :]
        t = (qvec * e2[None, :, :]).sum(axis=2) * inv_det[None, :]
        hit = ok[None, :] & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        inside[idx] = (hit.sum(axis=1) % 2) == 1
    return inside


def points_inside(stl: Stereolitography, pts: np.ndarray) -> np.ndarray:
    pts = np.asarray(pts)
    if pts.shape[1] == 2:
        return points_inside_2d(stl, pts)
    return points_inside_3d(stl, pts)
