"""Fused Pallas TPU kernels for the Euler RHS on 3D block grids.

Motivation (round-4 trace, 5.3M-cell sphere bench, bs=16): the XLA
formulation of `ibx.ops.block_ops.euler_rhs_grid` moves ~15 GB of HBM per
RHS evaluation through materialized face arrays, halo concats and
per-pass re-reads — 52 ms of a 110 ms RK2 step.  The arithmetic needs
~1 GB.  These kernels evaluate pass A (Green-Gauss gradients + JST-style
sensor + wave-speed dt bound) and pass B (MUSCL + HLL divergence) as two
`pallas_call`s over the block forest: one program per block, all three
dimensions fused, everything VMEM-resident.

Layout: channel-split lane-merged grids ``[B, C, bs, bs*bs]`` — z on
sublanes, (y, x) merged on lanes (x minor).  The cell-major state
``[B, bs, bs, bs, C]`` would tile its (bs, C) minor pair onto (8, 128)
vector registers at C/128 lane utilization; the merged view runs the VPU
at full width.  Conversions are single XLA transposes at the RHS
boundary.

Neighbor data: each program loads its six dense neighbors' WHOLE blocks
through scalar-prefetched index maps (`pltpu.PrefetchScalarGridSpec`) —
16x more bytes than the needed edge planes, but streamed at full HBM
bandwidth through the Pallas pipeline.  (The prepare-planes-in-XLA
alternative was built first and measured: every lane-strided x-plane
extraction and [.., 16, 16] halo array tiles onto (8, 128) vregs at
1/8-1/128 utilization, costing ~100 ms/step of data formatting — 40x
the cost of simply over-reading.)  Edge columns of the neighbor block
are brought into face position with lane/sublane rolls; one-sided domain
boundary sides (bnd) mirror the own edge in-kernel.

Parity: faces are evaluated with exactly the expressions of
`block_ops.face_accumulate`'s concat formulation (same operand order,
same h algebra; reference semantics ``src/ImmersedBoundary.jl:873-1157``,
``src/cfd.jl:459-508``).  Structured 2:1 interface corrections and the
generic sparse leftover stay on the existing XLA machinery
(`block_ops.interface_corrections`), applied to the kernel outputs —
identical coverage, with only the float summation order of the (few)
corrected edge columns differing.  `tests/test_pallas_rhs.py` holds the
two paths to ~1e-4 relative on a real octree (2:1 jumps in all dims).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.fluid import Fluid
from ..topology.blocks import BlockTables
from . import block_ops as bo


# ---------------------------------------------------------------------------
# layout conversions + per-block tables
# ---------------------------------------------------------------------------

def cs_split(bt: BlockTables, X3):
    """[B, bs, bs, bs, C] cell-major -> [B, C, bs, bs*bs] channel-split."""
    B, bs = bt.n_blocks, bt.block_size
    C = X3.shape[-1]
    return X3.transpose(0, 4, 1, 2, 3).reshape(B, C, bs, bs * bs)


def cs_merge(bt: BlockTables, Xc):
    """[B, C, bs, bs*bs] -> [B, bs, bs, bs, C] cell-major."""
    B, bs = bt.n_blocks, bt.block_size
    C = Xc.shape[1]
    return Xc.reshape(B, C, bs, bs, bs).transpose(0, 2, 3, 4, 1)


def _meta(bt: BlockTables):
    """Per-block scalars [B, 16] f32: h_d (3), edge_valid[d][s] (6),
    bnd[d][s] (6), pad."""
    cols = [bt.h[:, d] for d in range(3)]
    for d in range(3):
        for s in (0, 1):
            cols.append(bt.edge_valid[d][s])
    for d in range(3):
        for s in (0, 1):
            cols.append(bt.bnd[d][s])
    z = jnp.zeros_like(cols[0])
    cols.extend([z] * (16 - len(cols)))
    # [16, B], NOT [B, 16]: SMEM allocations pad per ROW, so the table
    # must have few long rows (a [B, 16] layout blew the 1 MB SMEM at
    # B = 1331)
    return jnp.stack(cols, axis=0)


def _nbr_table(bt: BlockTables):
    """[8, B] int32 dense-neighbor block ids, rows (x0 x1 y0 y1 z0 z1)."""
    cols = [bt.nbr[d][s] for d in range(3) for s in (0, 1)]
    z = jnp.zeros_like(cols[0])
    return jnp.stack(cols + [z, z], axis=0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# in-kernel shifted-operand builders ([C, bs, bs*bs] own + neighbor blocks)
# ---------------------------------------------------------------------------

def _shifts(bs: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bs, bs * bs), 2)
    x_pos = lane % bs
    y_pos = lane // bs

    def sh_m(X, NB, d, bnd_s):
        """Value at the (d)-minus neighbor cell.  The block-edge slot
        takes the neighbor block's far edge column (lane/sublane roll of
        the whole neighbor block — a strided-lane extraction is not a
        TPU vector op, a roll is); one-sided boundary sides mirror the
        own edge (`block_ops.pad_dim` semantics)."""
        if d == 2:
            edge = jnp.where(bnd_s > 0, X[:, :1, :], NB[:, bs - 1:, :])
            return jnp.concatenate([edge, X[:, :bs - 1, :]], axis=1)
        if d == 1:
            edge = jnp.where(bnd_s > 0, X[:, :, :bs],
                             NB[:, :, bs * (bs - 1):])
            return jnp.concatenate([edge, X[:, :, :bs * (bs - 1)]], axis=2)
        fix = jnp.where(bnd_s > 0, X,
                        pltpu.roll(NB, bs * bs - bs + 1, axis=2))
        return jnp.where(x_pos == 0, fix, pltpu.roll(X, 1, axis=2))

    def sh_p(X, NB, d, bnd_s):
        if d == 2:
            edge = jnp.where(bnd_s > 0, X[:, bs - 1:, :], NB[:, :1, :])
            return jnp.concatenate([X[:, 1:, :], edge], axis=1)
        if d == 1:
            edge = jnp.where(bnd_s > 0, X[:, :, bs * (bs - 1):],
                             NB[:, :, :bs])
            return jnp.concatenate([X[:, :, bs:], edge], axis=2)
        fix = jnp.where(bnd_s > 0, X, pltpu.roll(NB, bs - 1, axis=2))
        return jnp.where(x_pos == bs - 1, fix,
                         pltpu.roll(X, bs * bs - 1, axis=2))

    def edge_mask(d, s):
        """Predicate on the side-s edge slot (face position)."""
        if d == 2:
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, bs, bs * bs), 1)
        elif d == 1:
            pos = y_pos
        else:
            pos = x_pos
        return pos == (bs - 1 if s else 0)

    return sh_m, sh_p, edge_mask


# ---------------------------------------------------------------------------
# kernel A: gradients + sensor inputs + dt bound
# ---------------------------------------------------------------------------

def _kernel_a(fluid_consts, bs, nd, with_dt,
              meta_ref, nbr_ref, P_ref,
              nx0, nx1, ny0, ny1, nz0, nz1, du_ref, aux_ref):
    """Per-block pass A.  Outputs: du (nd*5 signed gradients) and an aux
    grid of per-dim G (signed fd sum), U (|fd| sum), and — with_dt — sf
    sum.  (Two outputs, not one: the downstream consumers slice du and
    aux apart, and an XLA slice of a fused [21ch] array costs ~1.2 ms at
    bench scale.)  Matches `block_ops.euler_rhs_grid` face_A exactly per
    face.
    """
    del nbr_ref
    gamma, R = fluid_consts
    sh_m, sh_p, edge_mask = _shifts(bs)
    nbs = ((nx0, nx1), (ny0, ny1), (nz0, nz1))
    P = P_ref[0]
    C = 5
    b = pl.program_id(0)

    def sound(T):
        return jnp.sqrt(gamma * R * jnp.clip(T, 10.0, None))

    a = sound(P[1:2])
    for d in range(nd):
        h = meta_ref[d, b]
        ev_l = meta_ref[3 + 2 * d, b]
        ev_r = meta_ref[3 + 2 * d + 1, b]
        Pm = sh_m(P, nbs[d][0][0], d, meta_ref[9 + 2 * d, b])
        Pp = sh_p(P, nbs[d][1][0], d, meta_ref[9 + 2 * d + 1, b])
        # face values, minus side: o = cell-1, n = cell (fn(Wo, Wn, h, h))
        ml = jnp.where(edge_mask(d, 0), ev_l, 1.0)
        mr = jnp.where(edge_mask(d, 1), ev_r, 1.0)
        Pf_m = (Pm * h + P * h) / (h + h) * ml
        Pf_p = (P * h + Pp * h) / (h + h) * mr
        fd_m = (P[0:1] - Pm[0:1]) * ml
        fd_p = (Pp[0:1] - P[0:1]) * mr
        du = (Pf_p - Pf_m) / h
        G = (fd_p - fd_m) / h
        U = (jnp.abs(fd_p) + jnp.abs(fd_m)) / h
        du_ref[0, d * C:(d + 1) * C] = du
        aux_ref[0, d:d + 1] = G
        aux_ref[0, nd + d:nd + d + 1] = U
        if with_dt:
            S = jnp.abs(P[2 + d:3 + d]) + a
            Sm = jnp.abs(Pm[2 + d:3 + d]) + sound(Pm[1:2])
            Sp = jnp.abs(Pp[2 + d:3 + d]) + sound(Pp[1:2])
            sf_m = (Sm * h + S * h) / (h + h) * ml
            sf_p = (S * h + Sp * h) / (h + h) * mr
            aux_ref[0, 2 * nd + d:2 * nd + d + 1] = (sf_p + sf_m) / h


# ---------------------------------------------------------------------------
# kernel B: MUSCL + HLL divergence
# ---------------------------------------------------------------------------

def _hll_flux(gamma, R, PL, PR, d):
    """Channel-split HLL flux (`ibx.physics.flux.inviscid_fluxes_hll`,
    reference quirk wave speeds SL = max(uL+aL, 0), SR = min(uR-aR, 0);
    ``src/cfd.jl:459-508``).  PL/PR: [5, bs, bs*bs]; returns same shape."""
    def side(X):
        p = X[0]
        T = jnp.clip(X[1], 10.0, None)
        u, v, w = X[2], X[3], X[4]
        kin = (u * u + v * v + w * w) / 2
        rho = p / (R * T)
        E = rho * (R / (gamma - 1.0) * T + kin)
        Q = (rho, E, rho * u, rho * v, rho * w)
        un = X[2 + d]
        mom = [Q[2] * un, Q[3] * un, Q[4] * un]
        mom[d] = mom[d] + p
        F = (rho * un, (E + p) * un, mom[0], mom[1], mom[2])
        aa = jnp.sqrt(gamma * R * T)
        return Q, F, un, aa

    QL, FL, uL, aL = side(PL)
    QR, FR, uR, aR = side(PR)
    SL = jnp.maximum(uL + aL, 0.0)
    SR = jnp.minimum(uR - aR, 0.0)
    denom = SL - SR
    safe = denom > 0
    den = jnp.where(safe, denom, 1.0)
    return tuple(
        jnp.where(safe, (SL * FL[k] - SR * FR[k] + SR * SL * (QR[k] - QL[k]))
                  / den, 0.0)
        for k in range(5)
    )


def _edge_corr(du_d, d, s, c, bs):
    """Add the placed 2:1 interface correction ``c`` to the side-``s``
    edge slots of the axis-``d`` gradient block ``du_d`` [5, bs, bs*bs]
    (in-VMEM; the XLA alternative — a full [B, nd*5, ..] streamed add per
    RHS eval — measured 1.4 ms/step at the 5.3M-cell bench).  ``c``:
    [5, 1, bs*bs] for d=2 (z; (y, x) lane-merged), [5, bs, bs] for
    d=1/d=0 ((z, x) / (z, y)).  z/y edges are contiguous sublane/lane
    slabs (concat); x edges are lane-strided, placed with an exact 0/1
    matmul (single-term sums — bitwise equal to the streamed add)."""
    if d == 2:
        if s == 0:
            return jnp.concatenate([du_d[:, :1] + c, du_d[:, 1:]], axis=1)
        return jnp.concatenate(
            [du_d[:, :bs - 1], du_d[:, bs - 1:] + c], axis=1)
    if d == 1:
        if s == 0:
            return jnp.concatenate(
                [du_d[:, :, :bs] + c, du_d[:, :, bs:]], axis=2)
        return jnp.concatenate(
            [du_d[:, :, :bs * (bs - 1)], du_d[:, :, bs * (bs - 1):] + c],
            axis=2)
    e = bs - 1 if s else 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (bs, bs * bs), 1)
    yrow = jax.lax.broadcasted_iota(jnp.int32, (bs, bs * bs), 0)
    E = ((lane // bs == yrow) & (lane % bs == e)).astype(du_d.dtype)
    add = jax.lax.dot(c.reshape(5 * bs, bs), E,
                      preferred_element_type=du_d.dtype)
    return du_d + add.reshape(5, bs, bs * bs)


def _face_b(gamma, R, high_order, d, h, Po, Pn, duo, dun, Do, Dn):
    """-HLL flux of the MUSCL-reconstructed face (block_ops face_B with
    ho = hn = h; all operands [*, bs, bs*bs] stacks with 5 channels for
    P/du and 1 for the sensor)."""
    down = h / 2
    dneigh = h / 2
    grad_f = (Pn - Po) / (down + dneigh)
    slope_o = (2 * duo - grad_f) * down
    slope_n = (2 * dun - grad_f) * dneigh
    lim = jnp.minimum(jnp.abs(slope_n), jnp.abs(slope_o)) * (
        jnp.sign(slope_n) + jnp.sign(slope_o)) / 2
    PL = Po + lim
    PR = Pn - lim
    D = jnp.maximum(jnp.maximum(Do, Dn), 1e-7)
    uf = (Po * dneigh + Pn * down) / (down + dneigh)
    if high_order:
        uf = uf + (duo * down - dun * dneigh) / 8
    PL = PL * D + (1.0 - D) * uf
    PR = PR * D + (1.0 - D) * uf
    F = _hll_flux(gamma, R, PL, PR, d)
    return jnp.stack([-Fk for Fk in F])


def _kernel_b(fluid_consts, bs, nd, high_order, have_cols,
              meta_ref, nbr_ref, P_ref, du_ref, nu_ref, *refs):
    """Per-block pass B: R = sum_d (F_plus - F_minus)/h with F = -HLL of
    the MUSCL face.  Neighbor operands: P blocks, the face-dim gradient
    block (channel-blocked from the [B, 15, ..] gradient array by the
    index map), and sensor blocks.

    With ``have_cols``, 12 extra refs precede ``out_ref``: the placed 2:1
    gradient corrections for the own block (6, (d, s) order) and for each
    neighbor slot's used edge (6, k order: slot k's neighbor corrected at
    its side-(1 - k%2) edge) — applied on load instead of via a streamed
    full-array add between the passes (see `_edge_corr`)."""
    del nbr_ref
    gamma, R = fluid_consts
    sh_m, sh_p, edge_mask = _shifts(bs)
    nbP = tuple((refs[2 * d], refs[2 * d + 1]) for d in range(3))
    nbD = tuple((refs[6 + 2 * d], refs[6 + 2 * d + 1]) for d in range(3))
    nbU = tuple((refs[12 + 2 * d], refs[12 + 2 * d + 1]) for d in range(3))
    if have_cols:
        c_own = refs[18:24]
        c_nbr = refs[24:30]
        out_ref = refs[30]
    else:
        out_ref = refs[18]
    P = P_ref[0]
    nu = nu_ref[0]
    C = 5
    b = pl.program_id(0)

    def face(d, h, Wo, Wn):
        return _face_b(gamma, R, high_order, d, h,
                       Wo[0:5], Wn[0:5], Wo[5:10], Wn[5:10],
                       Wo[10:11], Wn[10:11])

    acc = None
    for d in range(nd):
        h = meta_ref[d, b]
        ev_l = jnp.where(edge_mask(d, 0), meta_ref[3 + 2 * d, b], 1.0)
        bnd_l = meta_ref[9 + 2 * d, b]
        bnd_r = meta_ref[9 + 2 * d + 1, b]
        du = du_ref[0, d * C:(d + 1) * C]
        nbD_m = nbD[d][0][0]
        nbD_p = nbD[d][1][0]
        if have_cols:
            du = _edge_corr(du, d, 0, c_own[2 * d][0], bs)
            du = _edge_corr(du, d, 1, c_own[2 * d + 1][0], bs)
            # minus neighbor's used edge is its s=1 edge; plus: s=0
            nbD_m = _edge_corr(nbD_m, d, 1, c_nbr[2 * d][0], bs)
            nbD_p = _edge_corr(nbD_p, d, 0, c_nbr[2 * d + 1][0], bs)
        W = jnp.concatenate([P, du, nu], axis=0)       # [11, bs, bs*bs]
        NB_l = jnp.concatenate(
            [nbP[d][0][0], nbD_m, nbU[d][0][0]], axis=0)
        Wm = sh_m(W, NB_l, d, bnd_l)
        Fm = face(d, h, Wm, W) * ev_l
        if d == 0:
            # x (minor lanes): a plus-face array is a second full eval on
            # the rolled operands (a strided-lane patch is not a vector op)
            NB_r = jnp.concatenate(
                [nbP[d][1][0], nbD_p, nbU[d][1][0]], axis=0)
            ev_r = jnp.where(edge_mask(d, 1), meta_ref[4 + 2 * d, b], 1.0)
            Wp = sh_p(W, NB_r, d, bnd_r)
            Fp = face(d, h, W, Wp) * ev_r
        else:
            # z/y: every interior plus face IS the next cell's minus face
            # — shift the (masked-at-slot-0) Fm and evaluate the flux only
            # on the far edge plane (1/bs of the work)
            ev_r = meta_ref[4 + 2 * d, b]
            if d == 2:
                own = W[:, bs - 1:, :]
                nb = jnp.concatenate(
                    [nbP[d][1][0][:, :1, :], nbD_p[:, :1, :],
                     nbU[d][1][0][:, :1, :]], axis=0)
                edge = jnp.where(bnd_r > 0, own, nb)
                patch = face(d, h, own, edge) * ev_r
                Fp = jnp.concatenate([Fm[:, 1:, :], patch], axis=1)
            else:
                own = W[:, :, bs * (bs - 1):]
                nb = jnp.concatenate(
                    [nbP[d][1][0][:, :, :bs], nbD_p[:, :, :bs],
                     nbU[d][1][0][:, :, :bs]], axis=0)
                edge = jnp.where(bnd_r > 0, own, nb)
                patch = face(d, h, own, edge) * ev_r
                Fp = jnp.concatenate([Fm[:, :, bs:], patch], axis=2)
        Rd = (Fp - Fm) / h
        acc = Rd if acc is None else acc + Rd
    out_ref[0] = acc


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _interpret():
    return jax.default_backend() != "tpu"


def _own(bs, ch):
    return pl.BlockSpec((1, ch, bs, bs * bs), lambda b, m, n: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _nbspec(bs, ch, k, cblk=None):
    """Neighbor-block spec: block id from the prefetched neighbor table
    (column k); ``cblk`` picks a channel block (e.g. the face-dim
    gradient from the [B, nd*5, ..] array)."""
    c = 0 if cblk is None else cblk
    return pl.BlockSpec(
        (1, ch, bs, bs * bs),
        lambda b, m, n, k=k, c=c: (n[k, b], c, 0, 0),
        memory_space=pltpu.VMEM,
    )


def run_kernel_a(bt: BlockTables, fluid: Fluid, Pc, *, with_dt: bool):
    """Returns (du_cs [B, nd*5, ..], aux_cs [B, (2|3)*nd, ..])."""
    bs, nd, B = bt.block_size, bt.nd, bt.n_blocks
    n_aux = (3 if with_dt else 2) * nd
    consts = (float(fluid.gamma), float(fluid.R))
    kern = functools.partial(_kernel_a, consts, bs, nd, with_dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[_own(bs, 5)] + [_nbspec(bs, 5, k) for k in range(6)],
        out_specs=(_own(bs, nd * 5), _own(bs, n_aux)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, nd * 5, bs, bs * bs), Pc.dtype),
            jax.ShapeDtypeStruct((B, n_aux, bs, bs * bs), Pc.dtype),
        ),
        interpret=_interpret(),
    )(_meta(bt), _nbr_table(bt), Pc, *([Pc] * 6))


def run_kernel_b(bt: BlockTables, fluid: Fluid, Pc, du_cs, nu_cs, *,
                 high_order: bool, cols6=None):
    """``cols6``: optional 6-list ((d, s) order) of placed 2:1 gradient
    corrections — [B, 5, 1, bs*bs] for d=2, [B, 5, bs, bs] for d=1/0 —
    folded into the kernel's du loads (`_edge_corr`) instead of being
    pre-added to ``du_cs`` in XLA."""
    bs, nd, B = bt.block_size, bt.nd, bt.n_blocks
    consts = (float(fluid.gamma), float(fluid.R))
    have_cols = cols6 is not None
    kern = functools.partial(_kernel_b, consts, bs, nd, high_order,
                             have_cols)
    in_specs = (
        [_own(bs, 5), _own(bs, nd * 5), _own(bs, 1)]
        + [_nbspec(bs, 5, k) for k in range(6)]
        + [_nbspec(bs, 5, k, cblk=k // 2) for k in range(6)]
        + [_nbspec(bs, 1, k) for k in range(6)]
    )
    extra = ()
    if have_cols:
        def cspec(d, nbr_k=None):
            shp = (1, 5, 1, bs * bs) if d == 2 else (1, 5, bs, bs)
            if nbr_k is None:
                return pl.BlockSpec(shp, lambda b, m, n: (b, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(
                shp, lambda b, m, n, k=nbr_k: (n[k, b], 0, 0, 0),
                memory_space=pltpu.VMEM)

        in_specs += [cspec(i // 2) for i in range(6)]
        in_specs += [cspec(k // 2, nbr_k=k) for k in range(6)]
        # neighbor slot k uses its neighbor's side-(1 - k%2) edge — the
        # (k ^ 1) entry of the (d, s)-ordered cols
        extra = tuple(cols6) + tuple(cols6[k ^ 1] for k in range(6))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=_own(bs, 5),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 5, bs, bs * bs), Pc.dtype),
        interpret=_interpret(),
    )(_meta(bt), _nbr_table(bt), Pc, du_cs, nu_cs,
      *([Pc] * 6), *([du_cs] * 6), *([nu_cs] * 6), *extra)


# ---------------------------------------------------------------------------
# XLA glue: corrections + sensor assembly + full RHS
# ---------------------------------------------------------------------------

def _cs_edge_fetch(bt: BlockTables, arrays_cs, d: int, extra_fn=None,
                   plane_fix=None, channel_slice=None):
    """edge_fetch for `block_ops.interface_corrections` over channel-split
    operands: gather the (few) interface block rows whole, slice the
    side-``s`` edge plane, return channel-LAST [V, lat.., Ktot] — avoids
    materializing cell-major grids of every part just to read planes.

    ``plane_fix``: optional list parallel to ``arrays_cs``; entry i is
    None or a (side0, side1) pair of placed channel-last correction grids
    [B, lat.., Ci] ADDED to part i's fetched plane — used when the
    gradient corrections are folded into the pass-B kernel (`_edge_corr`)
    so the XLA-side ``du_cs`` stays uncorrected (the fetched edge planes
    are exactly where the corrections live; adding the placed rows here
    reproduces the pre-added values bitwise).

    ``channel_slice``: optional list parallel to ``arrays_cs``; entry i is
    None or a (c0, c1) range sliced out of part i AFTER the row gather —
    pre-slicing e.g. the face-dim 5 channels of the [B, nd*5, ..]
    gradient array materialized a full-size copy per axis (~0.8 ms per
    RHS eval at bench scale) just to read a few hundred block rows."""
    bs = bt.block_size

    def fetch(s, blocks):
        e = bs - 1 if s else 0
        outs = []
        for i, Xc in enumerate(arrays_cs):
            flat = Xc.reshape(Xc.shape[0], -1)
            V = blocks.shape[0]
            rows = jnp.take(flat, blocks, axis=0)
            X5 = rows.reshape(V, Xc.shape[1], bs, bs, bs)
            if channel_slice is not None and channel_slice[i] is not None:
                c0, c1 = channel_slice[i]
                X5 = X5[:, c0:c1]
            if d == 2:
                plane = X5[:, :, e]
            elif d == 1:
                plane = X5[:, :, :, e]
            else:
                plane = X5[..., e]
            plane = plane.transpose(0, 2, 3, 1)
            if plane_fix is not None and plane_fix[i] is not None:
                fix = plane_fix[i][s]
                if fix is not None:
                    plane = plane + jnp.take(fix, blocks, axis=0)
            outs.append(plane)
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        return out if extra_fn is None else extra_fn(out)

    return fetch


def _has_ifc(bt: BlockTables, d: int) -> bool:
    return bool(bt.fs_block[d][0].shape[0] or bt.fs_block[d][1].shape[0]
                or bt.cs_block[d][0].shape[0] or bt.cs_block[d][1].shape[0])


def _has_sparse(bt: BlockTables) -> bool:
    return any(int(bt.sp_owner[d].shape[0]) for d in range(bt.nd))


def pallas_eligible(bt: BlockTables, *, viscous=False, fix3=None, cut3=None,
                    frozen=None, mu_t3=None) -> bool:
    """Static gate: the fused kernels cover the 3D Euler configuration
    (the generic-sparse leftover and the extra physics stay on the XLA
    path)."""
    return (bt.nd == 3 and bt.block_size in (8, 16)
            and not viscous and fix3 is None and cut3 is None
            and frozen is None and mu_t3 is None and not _has_sparse(bt))


def _cols_add_cs(bt: BlockTables, Xc, cols, d: int, ch0: int, ch1: int):
    """Add cell-major edge-column corrections [B, lat.., n] into channels
    [ch0:ch1] of the channel-split grid ``Xc`` at the side-s edge slots
    (the iota-where of `face_accumulate`, re-expressed channel-split).

    Formulation note (round-4 A/B, 5.3M-cell sphere bench): a "compact"
    variant that scatter-added only the (few) interface block rows via
    ``.at[rows].add`` on the [B*C, npb] view measured 74.6 ms/step vs
    55.0 for this streamed add and was deleted — each scatter is a
    standalone op XLA cannot fuse, so every call re-materialized the
    full 100-320 MB operand, whereas the chained ``out + full`` adds of
    this formulation fuse into one pass over ``Xc``."""
    B, bs = bt.n_blocks, bt.block_size
    n = ch1 - ch0
    out = Xc
    for s in (0, 1):
        if cols[s] is None:
            continue
        cT = cols[s].transpose(0, 3, 1, 2)       # [B, n, lat0, lat1]
        if d == 2:
            pad = cT.reshape(B, n, 1, bs * bs)
            upd = jnp.concatenate(
                [jnp.zeros((B, ch0, 1, bs * bs), cT.dtype), pad,
                 jnp.zeros((B, Xc.shape[1] - ch1, 1, bs * bs), cT.dtype)],
                axis=1)
            z = jnp.zeros((B, Xc.shape[1], bs - 1, bs * bs), cT.dtype)
            full = (jnp.concatenate([upd, z], axis=2) if s == 0
                    else jnp.concatenate([z, upd], axis=2))
        elif d == 1:
            z = jnp.zeros((B, n, bs, bs * (bs - 1)), cT.dtype)
            row = (jnp.concatenate([cT, z], axis=3) if s == 0
                   else jnp.concatenate([z, cT], axis=3))
            full = jnp.concatenate(
                [jnp.zeros((B, ch0, bs, bs * bs), cT.dtype), row,
                 jnp.zeros((B, Xc.shape[1] - ch1, bs, bs * bs), cT.dtype)],
                axis=1)
        else:
            z = jnp.zeros((B, n, bs, bs, bs - 1), cT.dtype)
            row = (jnp.concatenate([cT[..., None], z], axis=4) if s == 0
                   else jnp.concatenate([z, cT[..., None]], axis=4))
            row = row.reshape(B, n, bs, bs * bs)
            full = jnp.concatenate(
                [jnp.zeros((B, ch0, bs, bs * bs), cT.dtype), row,
                 jnp.zeros((B, Xc.shape[1] - ch1, bs, bs * bs), cT.dtype)],
                axis=1)
        out = out + full
    return out


def euler_rhs_cs(
    bt: BlockTables,
    fluid: Fluid,
    Pc,
    *,
    high_order: bool = True,
    with_dt: bool = False,
    with_frozen: bool = False,
):
    """Channel-split-native RHS: state in [B, C, bs, bs*bs] end to end.

    Returns ``Rc`` (and, with ``with_dt``, the per-cell wave-speed bound
    ``dtb_cs [B, 1, bs, bs*bs]`` — NOT yet cfl-scaled) without ever
    materializing a cell-major grid: the round-4 trace showed the
    cs_split/cs_merge transposes plus the cell-major correction adds cost
    ~8 ms of the 71 ms sphere-bench step.  Numerics identical to
    `euler_rhs_grid_pallas` (same kernels, same correction machinery —
    pass-B corrections are applied with `_cols_add_cs` instead of the
    cell-major iota-where; float-identical because both add the same
    values to the same slots in one pass).

    By default the 2:1 GRADIENT corrections are folded into the pass-B
    kernel loads (`_edge_corr`; the streamed [B, nd*5, ..] XLA add they
    replace measured 1.4 ms per RHS eval at the 5.3M-cell bench) and the
    third return value is None.  ``with_frozen=True`` restores the
    pre-added ``du_cs`` and returns the corrected ``(du_cs, nu_cs)``
    (the frozen-limiter contract of `euler_rhs_grid_pallas`)."""
    import os

    nd, bs, B = bt.nd, bt.block_size, bt.n_blocks
    ncomp = Pc.shape[1]
    du_cs, aux = run_kernel_a(bt, fluid, Pc, with_dt=with_dt)
    # Correction placement A/B (round 5, scripts/cs_ab.py on the 5.3M
    # bs=16 sphere): the in-kernel fold (12 extra per-(d,s) operand
    # streams into pass B) measured 28.5 ms per RHS eval vs 24.0 for
    # the streamed `_cols_add_cs` pre-add — the extra operand pipeline
    # plus the layout flips it induces on `du_cs` cost more than the
    # pre-add stream it saves.  Default is therefore the PRE-ADD path;
    # IBX_CS_FOLD=1 re-enables the fold for future A/Bs.
    fold = not with_frozen and os.environ.get("IBX_CS_FOLD", "0") == "1"
    cols6 = None
    fixB = [None] * nd  # per-axis (side0, side1) channel-last du fixes

    # 2:1 interface corrections for pass A (XLA; identical machinery —
    # planes are fetched from the gathered interface block rows of the
    # channel-split operands, never via cell-major grid materialization)
    nA = ncomp + (3 if with_dt else 2)
    signedA = [1.0] * (ncomp + 1) + [0.0] * (2 if with_dt else 1)
    if any(_has_ifc(bt, d) for d in range(nd)):
        for d in range(nd):
            if not _has_ifc(bt, d):
                continue
            if with_dt:
                def extraA(pp, d=d):
                    aa = jnp.sqrt(fluid.gamma * fluid.R
                                  * jnp.clip(pp[..., 1], 10.0, None))
                    Sd = jnp.abs(pp[..., 2 + d]) + aa
                    return jnp.concatenate([pp, Sd[..., None]], axis=-1)
            else:
                extraA = None
            fetchA = _cs_edge_fetch(bt, [Pc], d, extra_fn=extraA)
            # width-fixing dummies: with edge_fetch set, the parts only
            # fix the face_fn's channel-split widths (and dtype)
            dumP = jnp.zeros((1, ncomp), Pc.dtype)
            dum1 = jnp.zeros((1, 1), Pc.dtype)
            partsA = ((dumP, dum1) if with_dt else (dumP,))

            def face_A(Wo, Wn, ho, hn):
                Po, Pn = Wo[0], Wn[0]
                Pf = (Po * hn + Pn * ho) / (ho + hn)
                fd = Pn[..., 0:1] - Po[..., 0:1]
                out = [Pf, fd, jnp.abs(fd)]
                if with_dt:
                    So, Sn = Wo[1], Wn[1]
                    out.append((So * hn + Sn * ho) / (ho + hn))
                return jnp.concatenate(out, axis=-1)

            # partsA's S entry is a width-1 dummy: with edge_fetch set,
            # the parts only fix the face_fn's channel split widths
            cols = bo.interface_corrections(bt, d, partsA, face_A, nA,
                                            signedA, edge_fetch=fetchA)
            if cols is None:
                continue
            # cols channels: [du(5), G, U (, sf)] -> kernel-A outputs
            sub = [None if c is None else c[..., 0:5] for c in cols]
            if fold:
                # defer to the pass-B kernel: keep the placed channel-last
                # grids (for the fetchB plane fix) and build the kernel's
                # per-(d, s) operands lazily below
                fixB[d] = (sub[0], sub[1])
            else:
                du_cs = _cols_add_cs(bt, du_cs, sub, d, d * 5, (d + 1) * 5)
            csl = [(5, (d, d + 1)), (6, (nd + d, nd + d + 1))]
            if with_dt:
                csl.append((7, (2 * nd + d, 2 * nd + d + 1)))
            for src0, (c0, c1) in csl:
                sub = [None if c is None else c[..., src0:src0 + (c1 - c0)]
                       for c in cols]
                aux = _cols_add_cs(bt, aux, sub, d, c0, c1)

    Gs = aux[:, :nd]
    Us = aux[:, nd:2 * nd]
    nu_cs = jnp.full((B, 1, bs, bs * bs), 1e-7, dtype=Pc.dtype)
    for d in range(nd):
        nu_cs = jnp.maximum(
            nu_cs, (1e-7 + jnp.abs(Gs[:, d:d + 1]))
            / (1e-7 + Us[:, d:d + 1]))

    if fold and any(f is not None for f in fixB):
        # kernel operands: [B, 5, 1, bs*bs] (z) / [B, 5, bs, bs] (y, x)
        def kernel_cdu(d, c):
            if c is None:
                shp = ((B, 5, 1, bs * bs) if d == 2 else (B, 5, bs, bs))
                return jnp.zeros(shp, Pc.dtype)
            cT = c.transpose(0, 3, 1, 2)
            return cT.reshape(B, 5, 1, bs * bs) if d == 2 else cT

        cols6 = [kernel_cdu(d, fixB[d][s] if fixB[d] else None)
                 for d in range(nd) for s in (0, 1)]

    Rc = run_kernel_b(bt, fluid, Pc, du_cs, nu_cs, high_order=high_order,
                      cols6=cols6)

    # 2:1 corrections for pass B (channel-split add over all 5 channels)
    if any(_has_ifc(bt, d) for d in range(nd)):
        signedB = [1.0] * ncomp
        for d in range(nd):
            if not _has_ifc(bt, d):
                continue
            fetchB = _cs_edge_fetch(
                bt, [Pc, du_cs, nu_cs], d,
                plane_fix=(None if fixB[d] is None
                           else [None, fixB[d], None]),
                channel_slice=[None, (d * 5, (d + 1) * 5), None])

            def face_B(Wo, Wn, ho, hn, d=d):
                Po, Pn = Wo[0], Wn[0]
                duo, dun = Wo[1], Wn[1]
                Do, Dn = Wo[2], Wn[2]
                down, dneigh = ho / 2, hn / 2
                grad_f = (Pn - Po) / (down + dneigh)
                slope_o = (2 * duo - grad_f) * down
                slope_n = (2 * dun - grad_f) * dneigh
                lim = bo.minmod(slope_n, slope_o)
                PL = Po + lim
                PR = Pn - lim
                D = jnp.maximum(jnp.maximum(Do, Dn), 1e-7)
                uf = (Po * dneigh + Pn * down) / (down + dneigh)
                if high_order:
                    uf = uf + (duo * down - dun * dneigh) / 8
                PL = PL * D + (1.0 - D) * uf
                PR = PR * D + (1.0 - D) * uf
                from ..physics.flux import inviscid_fluxes_hll
                return -inviscid_fluxes_hll(fluid, PL, PR, d)

            # width-fixing dummies (edge_fetch supplies the real planes)
            dumP = jnp.zeros((1, ncomp), Pc.dtype)
            dum1 = jnp.zeros((1, 1), Pc.dtype)
            cols = bo.interface_corrections(
                bt, d, (dumP, dumP, dum1), face_B, ncomp, signedB,
                edge_fetch=fetchB)
            if cols is None:
                continue
            Rc = _cols_add_cs(bt, Rc, cols, d, 0, ncomp)

    if with_dt:
        sfs = aux[:, 2 * nd:3 * nd]
        dtb = sfs[:, 0:1] + sfs[:, 1:2] + sfs[:, 2:3]
        # fold mode leaves du_cs uncorrected — never hand it out
        return Rc, dtb, ((du_cs, nu_cs) if with_frozen else None)
    return Rc


def euler_rhs_grid_pallas(
    bt: BlockTables,
    fluid: Fluid,
    P3,
    *,
    high_order: bool = True,
    with_dt: bool = False,
    cfl: float = 0.8,
):
    """Drop-in fused-kernel counterpart of `block_ops.euler_rhs_grid` for
    the 3D Euler configuration (no viscous/fix/cut/frozen).  Returns the
    same (R3 [, dt3, frozen]) structure in cell-major layout.  Thin
    cell-major shim over `euler_rhs_cs` (the single-chip TPU march uses
    the cs state directly via `rk2_step_cs`)."""
    nd, bs, B = bt.nd, bt.block_size, bt.n_blocks
    Pc = cs_split(bt, P3)
    # with_dt callers receive the (du3, nu3) frozen grids, so the
    # corrected du must be materialized (with_frozen); the plain-RHS call
    # uses the in-kernel fold
    out = euler_rhs_cs(bt, fluid, Pc, high_order=high_order,
                       with_dt=with_dt, with_frozen=with_dt)
    if with_dt:
        Rc, dtb, (du_cs, nu_cs) = out
        dt3 = (cfl / dtb[:, 0]).reshape((B,) + (bs,) * nd)
        du3 = [cs_merge(bt, du_cs[:, d * 5:(d + 1) * 5]) for d in range(nd)]
        nu3 = cs_merge(bt, nu_cs)
        return cs_merge(bt, Rc), dt3, (du3, nu3)
    return cs_merge(bt, out)


# ---------------------------------------------------------------------------
# channel-split state transforms + RK2 step (single-chip TPU march path)
# ---------------------------------------------------------------------------

def p2s_cs(fluid: Fluid, Pc):
    """`physics.fluid.primitive2state` with channels on axis 1
    (``[B, C, bs, bs*bs]``); identical formulas (``src/cfd.jl:106-123``)."""
    p = Pc[:, 0:1]
    T = jnp.clip(Pc[:, 1:2], 10.0, None)
    u = Pc[:, 2:]
    kin = (u ** 2).sum(axis=1, keepdims=True) / 2
    rho = p / (fluid.R * T)
    E = rho * (fluid.R / (fluid.gamma - 1.0) * T + kin)
    return jnp.concatenate([rho, E, rho * u], axis=1)


def s2p_guarded_cs(fluid: Fluid, Qc, p_floor=1.0, u_max=3000.0,
                   rho_floor=1e-6, p_ceil=1e9, T_ceil=2e4):
    """`physics.fluid.state2primitive_guarded`, channel axis 1."""
    rho = jnp.maximum(Qc[:, 0:1], rho_floor)
    E = Qc[:, 1:2]
    u = Qc[:, 2:] / rho
    kin = (u ** 2).sum(axis=1, keepdims=True) / 2
    p = (fluid.gamma - 1.0) * (E - rho * kin)
    T = jnp.clip(p / (rho * fluid.R), 10.0, T_ceil)
    vmag = jnp.sqrt((u ** 2).sum(axis=1, keepdims=True) + 1e-12)
    scale = jnp.minimum(1.0, u_max / vmag)
    return jnp.concatenate(
        [jnp.clip(p, p_floor, p_ceil), T, u * scale], axis=1)


def _kernel_update(fluid_consts, cfl, with_r1, with_act,
                   P_ref, R0_ref, *refs):
    """Per-block fused RK2 update stage: p2s -> Q0 + dt*R -> guarded s2p,
    entirely in VMEM.  The XLA formulation of the same chain let the
    layout assigner flip the state between the kernels' {3,2,1,0} and an
    elementwise-preferred {3,2,0,1}, inserting ~3-4 ms/step of relayout
    copies at the 5.3M-cell bench.  Expressions copy `p2s_cs` /
    `s2p_guarded_cs` verbatim (channel axis 0 in-kernel) — bitwise-equal
    output."""
    gamma, R = fluid_consts
    i = 0
    R1_ref = None
    if with_r1:
        R1_ref, i = refs[0], 1
    dtb_ref = refs[i]
    act_ref = refs[i + 1] if with_act else None
    out_ref = refs[i + 1 + (1 if with_act else 0)]

    P = P_ref[0]
    # p2s (p2s_cs, channel axis 0)
    p = P[0:1]
    T = jnp.clip(P[1:2], 10.0, None)
    u = P[2:]
    kin = (u ** 2).sum(axis=0, keepdims=True) / 2
    rho = p / (R * T)
    E = rho * (R / (gamma - 1.0) * T + kin)
    Q0 = jnp.concatenate([rho, E, rho * u], axis=0)

    dt = cfl / dtb_ref[0]
    if with_act:
        dt = dt * act_ref[0]
    if with_r1:
        Qn = Q0 + dt * (R0_ref[0] + R1_ref[0]) / 2
    else:
        Qn = Q0 + dt * R0_ref[0]

    # guarded s2p (s2p_guarded_cs defaults)
    rho = jnp.maximum(Qn[0:1], 1e-6)
    E = Qn[1:2]
    u = Qn[2:] / rho
    kin = (u ** 2).sum(axis=0, keepdims=True) / 2
    p = (gamma - 1.0) * (E - rho * kin)
    T = jnp.clip(p / (rho * R), 10.0, 2e4)
    vmag = jnp.sqrt((u ** 2).sum(axis=0, keepdims=True) + 1e-12)
    scale = jnp.minimum(1.0, 3000.0 / vmag)
    out_ref[0] = jnp.concatenate(
        [jnp.clip(p, 1.0, 1e9), T, u * scale], axis=0)


def run_update(bt, fluid: Fluid, Pc, R0, R1, dtb, active_cs,
               cfl: float):
    """Fused RK2 update stage (stage 1 when ``R1`` is None).

    Geometry comes from the operands (``bt`` is unused and may be None):
    the sharded march updates OWN-chunk grids whose block count differs
    from the local BlockTables'."""
    B, _, bs, _ = Pc.shape
    consts = (float(fluid.gamma), float(fluid.R))
    with_r1 = R1 is not None
    with_act = active_cs is not None
    kern = functools.partial(_kernel_update, consts, float(cfl),
                             with_r1, with_act)
    def spec(ch):
        # plain grid (no scalar prefetch): 1-arg index map
        return pl.BlockSpec((1, ch, bs, bs * bs), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    ops = [Pc, R0] + ([R1] if with_r1 else []) + [dtb] \
        + ([active_cs] if with_act else [])
    in_specs = [spec(5), spec(5)] \
        + ([spec(5)] if with_r1 else []) + [spec(1)] \
        + ([spec(1)] if with_act else [])
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=spec(5),
        out_shape=jax.ShapeDtypeStruct((B, 5, bs, bs * bs), Pc.dtype),
        interpret=_interpret(),
    )(*ops)


def rk2_step_cs(
    bt: BlockTables,
    fluid: Fluid,
    Pc,
    apply_bcs_cs,
    *,
    cfl: float = 0.8,
    high_order: bool = True,
    active_cs=None,
):
    """Local-dt TVD-RK2 pseudo step on the channel-split state — the same
    scheme as `block_ops.rk2_step_grid` (reference semantics
    ``src/ImmersedBoundary.jl:873-1157``), with the state never leaving
    the ``[B, C, bs, bs*bs]`` layout (the Pallas kernels' native shape).
    ``apply_bcs_cs`` maps cs grid -> cs grid (`BlockedBC.cs`);
    ``active_cs``: f32[B, 1, bs, bs*bs] 0/1 freeze mask."""
    R0, dtb, _ = euler_rhs_cs(bt, fluid, Pc, high_order=high_order,
                              with_dt=True)
    P1 = apply_bcs_cs(run_update(bt, fluid, Pc, R0, None, dtb, active_cs,
                                 cfl))
    R1 = euler_rhs_cs(bt, fluid, P1, high_order=high_order)
    P2 = apply_bcs_cs(run_update(bt, fluid, Pc, R0, R1, dtb, active_cs,
                                 cfl))
    resnorm = jnp.abs(R0[:, 0]).max()
    return P2, resnorm
