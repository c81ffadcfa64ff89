"""Dense block-structured operators: the TPU fast path (device side).

State lives as [B, bs, ..., bs, C] block grids (a free reshape of the global
cell ordering, reference ``src/mesher.jl:1064-1088``). All intra-block and
regular inter-block faces are computed with shift/slice vector ops; edge
columns come from one gather over the block axis; sparse (irregular) faces
are evaluated flat and folded in with scatter-adds. Numerics are identical to
the generic gather path (`ibx.ops.operators`) — the parity tests enforce it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..physics.flux import inviscid_fluxes_hll
from ..physics.fluid import Fluid, primitive2state, speed_of_sound, state2primitive
from ..topology.blocks import BlockTables
from .operators import minmod


def _axis(bt: BlockTables, d: int) -> int:
    """Array axis of spatial dim d in [B, x_{nd-1}, ..., x_0, C] layout."""
    return 1 + (bt.nd - 1 - d)


def to_blocks(bt: BlockTables, u_flat):
    """[N, C] (or [N]) -> [B, bs, ..., bs, (C)] — a free reshape."""
    return u_flat.reshape(
        (bt.n_blocks,) + (bt.block_size,) * bt.nd + u_flat.shape[1:]
    )


def to_flat(bt: BlockTables, u3):
    nlead = 1 + bt.nd
    return u3.reshape((bt.n_cells,) + u3.shape[nlead:])


def pad_dim(bt: BlockTables, u3, d: int):
    """Append halo slices from regular neighbor blocks on both sides.

    [B, ..., bs, ..., C] -> [B, ..., bs+2, ..., C]. Invalid sides gather
    block 0 (finite junk, masked later by `face_mask`).
    """
    ax = _axis(bt, d)
    first = jax.lax.slice_in_dim(u3, 0, 1, axis=ax)
    last = jax.lax.slice_in_dim(u3, bt.block_size - 1, bt.block_size, axis=ax)
    halo_l = jnp.take(last, bt.nbr[d][0], axis=0)
    halo_r = jnp.take(first, bt.nbr[d][1], axis=0)
    return jnp.concatenate([halo_l, u3, halo_r], axis=ax)


def face_lr(bt: BlockTables, up, d: int):
    """Owner/neighbor values on the bs+1 faces of each block row."""
    ax = _axis(bt, d)
    uo = jax.lax.slice_in_dim(up, 0, bt.block_size + 1, axis=ax)
    un = jax.lax.slice_in_dim(up, 1, bt.block_size + 2, axis=ax)
    return uo, un


def face_mask(bt: BlockTables, d: int, n_trailing: int = 1):
    """[B, 1.., bs+1, ..1] multiplier: 1 inside, edge_valid at the two edges."""
    bs = bt.block_size
    m = jnp.ones((bt.n_blocks, bs + 1), dtype=jnp.float32)
    m = m.at[:, 0].set(bt.edge_valid[d][0])
    m = m.at[:, -1].set(bt.edge_valid[d][1])
    ax = _axis(bt, d)
    shape = [bt.n_blocks] + [1] * (bt.nd + n_trailing)
    shape[ax] = bs + 1
    return m.reshape(shape)


def _h_bcast(bt: BlockTables, d: int, n_trailing: int = 1):
    """Per-block cell size broadcast over the grid dims."""
    shape = [bt.n_blocks] + [1] * (bt.nd + n_trailing)
    return bt.h[:, d].reshape(shape)


def gg_dense(bt: BlockTables, F, d: int):
    """(F_plus - F_minus) / h over masked dense faces -> cell grid."""
    ax = _axis(bt, d)
    bs = bt.block_size
    plus = jax.lax.slice_in_dim(F, 1, bs + 1, axis=ax)
    minus = jax.lax.slice_in_dim(F, 0, bs, axis=ax)
    return (plus - minus) / _h_bcast(bt, d, F.ndim - 1 - bt.nd)


def ugg_dense(bt: BlockTables, F, d: int):
    ax = _axis(bt, d)
    bs = bt.block_size
    plus = jax.lax.slice_in_dim(F, 1, bs + 1, axis=ax)
    minus = jax.lax.slice_in_dim(F, 0, bs, axis=ax)
    return (plus + minus) / _h_bcast(bt, d, F.ndim - 1 - bt.nd)


def _sp_scatter(bt: BlockTables, d: int, vals, signed: bool):
    """Fold sparse face values into flat cell sums.

    signed=True: green-gauss (+w_r to owner, -w_l to neighbor);
    signed=False: unsigned (+, +). Returns flat [N, C]/[N] sums (NOT divided
    by spacing).
    """
    o = bt.sp_owner[d]
    n = bt.sp_neighbor[d]
    wr = bt.sp_wr[d]
    wl = bt.sp_wl[d]
    if vals.ndim > 1:
        wr = wr[:, None]
        wl = wl[:, None]
    shape = (bt.n_cells,) + vals.shape[1:]
    out = jnp.zeros(shape, dtype=vals.dtype)
    out = out.at[o].add(wr * vals)
    out = out.at[n].add((wl if not signed else -wl) * vals)
    return out


def _sp_gather(bt: BlockTables, d: int, flat):
    """(owner, neighbor) values of sparse faces; flat [N, C] or [N]."""
    return (
        jnp.take(flat, bt.sp_owner[d], axis=0),
        jnp.take(flat, bt.sp_neighbor[d], axis=0),
    )


def euler_rhs_block(
    bt: BlockTables,
    fluid: Fluid,
    P,
    *,
    high_order: bool = True,
    with_dt: bool = False,
    cfl: float = 0.8,
):
    """Fused Euler dQ/dt on the block layout; numerics identical to
    `ibx.solve.euler.euler_rhs` (MUSCL + JST blending + HLL).

    Returns R (and local dt when ``with_dt``).
    """
    nd, bs = bt.nd, bt.block_size
    N = bt.n_cells
    ncomp = P.shape[-1]
    P3 = to_blocks(bt, P)
    a_flat = speed_of_sound(fluid, P[:, 1])
    # per-dim wave speed for the CFL bound
    S_flat = jnp.abs(P[:, 2:2 + nd]) + a_flat[:, None]
    S3 = to_blocks(bt, S_flat)
    sp = bt.spacing_flat

    # ---------------- pass A: gradients, JST sensor, dt bound -------------
    # sparse work is batched: per dim ONE wide gather pair and ONE signed +
    # ONE unsigned scatter (many narrow gathers/scatters force layout
    # round-trips on TPU)
    du_flat = []
    nu = jnp.full((N,), 1e-7, dtype=P.dtype)
    dt_bound = jnp.zeros((N,), dtype=P.dtype) if with_dt else None

    for d in range(nd):
        W3 = jnp.concatenate([P3, S3[..., d:d + 1]], axis=-1)
        Wp = pad_dim(bt, W3, d)
        Wo, Wn = face_lr(bt, Wp, d)
        m = face_mask(bt, d, 1)
        Pf = 0.5 * (Wo[..., :ncomp] + Wn[..., :ncomp]) * m
        fd = (Wn[..., 0:1] - Wo[..., 0:1]) * m
        sf = 0.5 * (Wo[..., ncomp:] + Wn[..., ncomp:]) * m

        du_dense = gg_dense(bt, Pf, d)
        G_dense = gg_dense(bt, fd, d)[..., 0]
        U_dense = ugg_dense(bt, jnp.abs(fd), d)[..., 0]

        # sparse corrections (spacing-weighted at_faces at irregular faces)
        Wflat = jnp.concatenate(
            [P, S_flat[:, d:d + 1], sp[:, d:d + 1]], axis=1
        )
        Wo_s, Wn_s = _sp_gather(bt, d, Wflat)
        Po_s, Pn_s = Wo_s[:, :ncomp], Wn_s[:, :ncomp]
        so = Wo_s[:, ncomp + 1:]
        sn = Wn_s[:, ncomp + 1:]
        Pf_s = (Po_s * sn + Pn_s * so) / (so + sn)
        fd_s = Pn_s[:, 0:1] - Po_s[:, 0:1]
        sf_s = (Wo_s[:, ncomp:ncomp + 1] * sn
                + Wn_s[:, ncomp:ncomp + 1] * so) / (so + sn)

        hcell = sp[:, d]
        signed = _sp_scatter(
            bt, d, jnp.concatenate([Pf_s, fd_s], axis=1), True
        ) / hcell[:, None]
        unsigned = _sp_scatter(
            bt, d, jnp.concatenate([jnp.abs(fd_s), sf_s], axis=1), False
        ) / hcell[:, None]

        du = to_flat(bt, du_dense) + signed[:, :ncomp]
        G = to_flat(bt, G_dense) + signed[:, ncomp]
        U = to_flat(bt, U_dense) + unsigned[:, 0]
        du_flat.append(du)
        nu = jnp.maximum(nu, (1e-7 + jnp.abs(G)) / (1e-7 + U))

        if with_dt:
            dtb = to_flat(bt, ugg_dense(bt, sf, d))[:, 0] + unsigned[:, 1]
            dt_bound = dt_bound + dtb

    # ---------------- pass B: MUSCL + HLL + divergence ---------------------
    nu3 = to_blocks(bt, nu[:, None])
    R = jnp.zeros_like(P)
    for d in range(nd):
        du = du_flat[d]
        V3 = jnp.concatenate([P3, to_blocks(bt, du), nu3], axis=-1)
        Vp = pad_dim(bt, V3, d)
        Vo, Vn = face_lr(bt, Vp, d)
        Po = Vo[..., :ncomp]
        Pn = Vn[..., :ncomp]
        duo = Vo[..., ncomp:2 * ncomp]
        dun = Vn[..., ncomp:2 * ncomp]
        Do = Vo[..., -1:]
        Dn = Vn[..., -1:]

        h = _h_bcast(bt, d, 1)
        half = h / 2
        grad_f = (Pn - Po) / h
        slope_o = (2 * duo - grad_f) * half
        slope_n = (2 * dun - grad_f) * half
        lim = minmod(slope_n, slope_o)
        PL = Po + lim
        PR = Pn - lim
        D = jnp.maximum(jnp.maximum(Do, Dn), 1e-7)
        uf = (Po + Pn) / 2
        if high_order:
            uf = uf + (duo * half - dun * half) / 8
        PL = PL * D + (1.0 - D) * uf
        PR = PR * D + (1.0 - D) * uf

        F = inviscid_fluxes_hll(fluid, PL, PR, d) * face_mask(bt, d, 1)
        R_dense = -gg_dense(bt, F, d)

        # sparse faces: generic MUSCL/HLL at irregular faces (one wide gather)
        Wflat = jnp.concatenate([P, du, nu[:, None], sp[:, d:d + 1]], axis=1)
        Wo_s, Wn_s = _sp_gather(bt, d, Wflat)
        Po_s, Pn_s = Wo_s[:, :ncomp], Wn_s[:, :ncomp]
        duo_s, dun_s = Wo_s[:, ncomp:2 * ncomp], Wn_s[:, ncomp:2 * ncomp]
        Do_s, Dn_s = Wo_s[:, 2 * ncomp], Wn_s[:, 2 * ncomp]
        so = Wo_s[:, 2 * ncomp + 1:] / 2
        sn = Wn_s[:, 2 * ncomp + 1:] / 2
        grad_fs = (Pn_s - Po_s) / (so + sn)
        slo = (2 * duo_s - grad_fs) * so
        sln = (2 * dun_s - grad_fs) * sn
        lim_s = minmod(sln, slo)
        PLs = Po_s + lim_s
        PRs = Pn_s - lim_s
        Ds = jnp.maximum(jnp.maximum(Do_s, Dn_s), 1e-7)[:, None]
        ufs = (Po_s * sn + Pn_s * so) / (so + sn)
        if high_order:
            ufs = ufs + (duo_s * so - dun_s * sn) / 8
        PLs = PLs * Ds + (1.0 - Ds) * ufs
        PRs = PRs * Ds + (1.0 - Ds) * ufs
        Fs = inviscid_fluxes_hll(fluid, PLs, PRs, d)

        R = R + to_flat(bt, R_dense) - _sp_scatter(bt, d, Fs, True) / sp[:, d][:, None]

    if with_dt:
        return R, cfl / dt_bound
    return R


def rk2_step_block(
    bt: BlockTables,
    fluid: Fluid,
    P,
    apply_bcs,
    *,
    cfl: float = 0.8,
    high_order: bool = True,
):
    """Local-dt TVD-RK2 pseudo step on the block fast path (same scheme as
    `ibx.solve.euler.rk2_step`)."""
    R0, dt = euler_rhs_block(bt, fluid, P, high_order=high_order,
                             with_dt=True, cfl=cfl)
    dt = dt[:, None]
    Q0 = primitive2state(fluid, P)
    P1 = apply_bcs(state2primitive(fluid, Q0 + dt * R0))
    R1 = euler_rhs_block(bt, fluid, P1, high_order=high_order)
    P2 = apply_bcs(state2primitive(fluid, Q0 + dt * (R0 + R1) / 2))
    resnorm = jnp.abs(R0[:, 0]).max()
    return P2, resnorm
