"""Block-structured compute tables: the TPU fast path compiler (host side).

The octree mesh is a forest of uniform ``bs^nd`` Cartesian blocks
(``src/mesher.jl:926-933`` in the reference). Everything strictly inside a
block — and across faces between equal-size, grid-aligned neighbor blocks —
is a REGULAR stencil: on TPU those become dense shift/slice ops at full
vector throughput, with neighbor-block edge data fetched by one tiny gather
over the block axis. Only the residual face set (refinement jumps, misaligned
neighbors, outer-boundary one-sided faces) stays in gather/scatter form; it
is a few percent of all faces and is applied as scatter-adds.

This module classifies every face and emits:
  * per dim/side: the regular neighbor-block table (or -1) + validity mask;
  * per dim: sparse face tables (owner/neighbor flat cell ids, accumulation
    weights for both sides) reproducing the reference's hanging-face
    averaging (``src/ImmersedBoundary.jl:501-506,630-685``) exactly.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import pytree_dataclass
from .domain import Domain


@pytree_dataclass(meta_fields=("n_blocks", "block_size", "nd", "n_cells"))
class BlockTables:
    """Static block-structured tables (device side after build).

    nbr[d][s]: int32[B] same-size aligned neighbor block on side s
      (0=minus, 1=plus) of dim d; index 0 substituted where invalid.
    edge_valid[d][s]: float32[B] 1 where the side is dense.
    h: float32[B, nd] cell size per block.
    inv_vol-like helpers are derived in the ops.

    Sparse face tables per dim d:
      sp_owner[d], sp_neighbor[d]: int32[Fs] flat cell ids (one-sided faces
        have owner == neighbor, matching the reference's handling);
      sp_wr[d], sp_wl[d]: float32[Fs] green-gauss accumulation weights of the
        face for its owner's plus side / neighbor's minus side (0 where the
        side does not accumulate it).
    """

    nbr: Tuple[Tuple[jnp.ndarray, ...], ...]
    edge_valid: Tuple[Tuple[jnp.ndarray, ...], ...]
    h: jnp.ndarray
    sp_owner: Tuple[jnp.ndarray, ...]
    sp_neighbor: Tuple[jnp.ndarray, ...]
    sp_wr: Tuple[jnp.ndarray, ...]
    sp_wl: Tuple[jnp.ndarray, ...]
    spacing_flat: jnp.ndarray
    n_blocks: int
    block_size: int
    nd: int
    n_cells: int


def build_block_tables(dom: Domain) -> BlockTables:
    """Classify faces of a (single-partition) Domain into dense/sparse."""
    msh = dom.mesh
    nd = msh.ndim
    bs = int(msh.block_size)
    B = msh.n_blocks
    npb = bs ** nd
    N = dom.ncells

    fdim = dom.face_dim
    fo = dom.face_owner.astype(np.int64)
    fn = dom.face_neighbor.astype(np.int64)
    widths = dom.widths
    centers = dom.centers

    bo = np.where(fo >= 0, fo // npb, -1)
    bn = np.where(fn >= 0, fn // npb, -1)

    interior = (fo >= 0) & (fn >= 0)
    intra = interior & (bo == bn)

    # regular inter-block face: both sides exist, equal widths, aligned
    eq_size = interior.copy()
    align = interior.copy()
    wo = widths[np.maximum(fo, 0)]
    wn = widths[np.maximum(fn, 0)]
    co = centers[np.maximum(fo, 0)]
    cn = centers[np.maximum(fn, 0)]
    eq_size &= np.all(np.isclose(wo, wn, rtol=1e-4), axis=1)
    for d in range(nd):
        on_d = fdim == d
        tol = 0.01 * wo[:, d]
        # perpendicular alignment + unit along-dim offset
        for dp in range(nd):
            delta = np.abs(cn[:, dp] - co[:, dp])
            if dp == d:
                align &= ~on_d | (np.abs(delta - wo[:, d]) < tol)
            else:
                align &= ~on_d | (delta < tol)
    regular = interior & eq_size & align

    # block-side classification
    nbr = [[np.full(B, -1, np.int64) for _ in range(2)] for _ in range(nd)]
    edge_valid = [[np.zeros(B, np.float32) for _ in range(2)] for _ in range(nd)]
    side_dense_face = np.zeros(fo.shape[0], dtype=bool)

    inter = interior & ~intra
    n_side = bs ** (nd - 1)
    for d in range(nd):
        sel = np.nonzero(inter & (fdim == d))[0]
        if sel.size == 0:
            continue
        # owner block's plus side; neighbor block's minus side
        key_o = bo[sel]
        key_n = bn[sel]
        reg = regular[sel]
        for keys, other, side in ((key_o, key_n, 1), (key_n, key_o, 0)):
            order = np.argsort(keys, kind="stable")
            ks = keys[order]
            start = np.searchsorted(ks, np.arange(B), side="left")
            end = np.searchsorted(ks, np.arange(B), side="right")
            cnt = end - start
            cand = np.nonzero(cnt == n_side)[0]
            for b in cand:
                rows = order[start[b]:end[b]]
                if not reg[rows].all():
                    continue
                nb = other[rows]
                if (nb != nb[0]).any():
                    continue
                nbr[d][side][b] = nb[0]
                edge_valid[d][side][b] = 1.0
        # a face is dense only if BOTH adjacent block sides are dense
        dense_rows = (edge_valid[d][1][key_o] > 0) & (edge_valid[d][0][key_n] > 0)
        side_dense_face[sel[dense_rows]] = True
        # de-validate asymmetric sides (possible with exotic topologies)
        sym_o = np.ones(B, bool)
        sym_o[key_o[~dense_rows & (edge_valid[d][1][key_o] > 0)]] = False
        edge_valid[d][1][~sym_o] = 0.0
        nbr[d][1][~sym_o] = -1
        sym_n = np.ones(B, bool)
        sym_n[key_n[~dense_rows & (edge_valid[d][0][key_n] > 0)]] = False
        edge_valid[d][0][~sym_n] = 0.0
        nbr[d][0][~sym_n] = -1

    # consistency: a face is dense iff owner's plus AND neighbor's minus
    # sides are both dense (symmetric by construction; assert on debug)
    dense = intra | side_dense_face

    # ---- sparse tables ---------------------------------------------------
    sp_owner, sp_neighbor, sp_wr, sp_wl = [], [], [], []
    for d in range(nd):
        sel = np.nonzero((fdim == d) & ~dense)[0]
        o_g = fo[sel]
        n_g = fn[sel]
        add_right = o_g >= 0
        add_left = n_g >= 0
        o_f = np.where(o_g < 0, n_g, o_g)
        n_f = np.where(n_g < 0, o_f, n_g)
        # averaging weights 1/n over the cell's sparse faces on that side
        w_r = np.zeros(sel.size, np.float32)
        w_l = np.zeros(sel.size, np.float32)
        cnt_r = np.bincount(o_f[add_right], minlength=N)
        cnt_l = np.bincount(n_f[add_left], minlength=N)
        w_r[add_right] = 1.0 / cnt_r[o_f[add_right]]
        w_l[add_left] = 1.0 / cnt_l[n_f[add_left]]
        sp_owner.append(o_f.astype(np.int32))
        sp_neighbor.append(n_f.astype(np.int32))
        sp_wr.append(w_r)
        sp_wl.append(w_l)

    h = (msh.block_widths / bs).astype(np.float32)

    tables = BlockTables(
        nbr=tuple(
            tuple(np.maximum(nbr[d][s], 0).astype(np.int32) for s in range(2))
            for d in range(nd)
        ),
        edge_valid=tuple(
            tuple(edge_valid[d][s] for s in range(2)) for d in range(nd)
        ),
        h=h,
        sp_owner=tuple(sp_owner),
        sp_neighbor=tuple(sp_neighbor),
        sp_wr=tuple(sp_wr),
        sp_wl=tuple(sp_wl),
        spacing_flat=widths.astype(np.float32),
        n_blocks=B,
        block_size=bs,
        nd=nd,
        n_cells=N,
    )
    return jax.device_put(tables)
