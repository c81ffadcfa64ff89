"""Fine-grain elimination profiling of euler_rhs_block components."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ibx.cases import build_rae2822
from ibx.ops import block_ops as bops
from ibx.physics.flux import inviscid_fluxes_hll
from ibx.topology.blocks import build_block_tables

K = 100


def march_time(fn, P):
    @jax.jit
    def m(P):
        return jax.lax.fori_loop(0, K, lambda _, P: fn(P), P)

    out = m(P)
    jax.block_until_ready(out)
    t0 = time.time()
    out = m(P)
    jax.block_until_ready(out)
    return (time.time() - t0) / K * 1000


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, getattr(dev, "memory_stats", lambda: {})())
    case = build_rae2822(wall_h=5e-4, feature_h=2.5e-4, cfl=0.7, block_size=16)
    bt = build_block_tables(case.dom)
    fluid = case.fluid
    P0 = case.P0
    nd, bs, ncomp = bt.nd, bt.block_size, 4

    def keep(f):
        def g(P):
            out = f(P)
            leaves = jax.tree_util.tree_leaves(out)
            return P + 0.0 * sum(x.sum() for x in leaves)
        return g

    # pass A only (gradients+sensor, no dt)
    def passA(P):
        R = bops.euler_rhs_block(bt, fluid, P, with_dt=False)
        return R
    print("rhs (A+B)        ", march_time(keep(passA), P0), "ms")

    def passA_only(P):
        # replicate pass A loop
        P3 = bops.to_blocks(bt, P)
        du_flat = []
        nu = jnp.full((bt.n_cells,), 1e-7, P.dtype)
        for d in range(nd):
            W3 = P3
            Wp = bops.pad_dim(bt, W3, d)
            Wo, Wn = bops.face_lr(bt, Wp, d)
            m = bops.face_mask(bt, d, 1)
            Pf = 0.5 * (Wo + Wn) * m
            fd = (Wn[..., 0:1] - Wo[..., 0:1]) * m
            du = bops.to_flat(bt, bops.gg_dense(bt, Pf, d))
            G = bops.to_flat(bt, bops.gg_dense(bt, fd, d)[..., 0])
            U = bops.to_flat(bt, bops.ugg_dense(bt, jnp.abs(fd), d)[..., 0])
            du_flat.append(du)
            nu = jnp.maximum(nu, (1e-7 + jnp.abs(G)) / (1e-7 + U))
        return du_flat + [nu]
    print("pass A dense     ", march_time(keep(passA_only), P0), "ms")

    # pass B only with fixed du/nu (dense only)
    du_fix = [jnp.zeros_like(P0) for _ in range(nd)]
    nu_fix = jnp.full((bt.n_cells,), 1e-7, P0.dtype)

    def passB_only(P):
        P3 = bops.to_blocks(bt, P)
        nu3 = bops.to_blocks(bt, nu_fix[:, None])
        R = jnp.zeros_like(P)
        for d in range(nd):
            du = du_fix[d]

            def face_B(Wo, Wn, ho, hn, d=d):
                Po, Pn = Wo[..., :ncomp], Wn[..., :ncomp]
                duo = Wo[..., ncomp:2 * ncomp]
                dun = Wn[..., ncomp:2 * ncomp]
                Do = Wo[..., -1:]
                Dn = Wn[..., -1:]
                down, dneigh = ho / 2, hn / 2
                grad_f = (Pn - Po) / (down + dneigh)
                slope_o = (2 * duo - grad_f) * down
                slope_n = (2 * dun - grad_f) * dneigh
                lim = bops.minmod(slope_n, slope_o)
                PL = Po + lim
                PR = Pn - lim
                D = jnp.maximum(jnp.maximum(Do, Dn), 1e-7)
                uf = (Po * dneigh + Pn * down) / (down + dneigh)
                uf = uf + (duo * down - dun * dneigh) / 8
                PL = PL * D + (1.0 - D) * uf
                PR = PR * D + (1.0 - D) * uf
                return inviscid_fluxes_hll(fluid, PL, PR, d)

            V3 = jnp.concatenate([P3, bops.to_blocks(bt, du), nu3], axis=-1)
            Vp = bops.pad_dim(bt, V3, d)
            Vo, Vn = bops.face_lr(bt, Vp, d)
            h = bops._h_bcast(bt, d, 1)
            F = face_B(Vo, Vn, h, h) * bops.face_mask(bt, d, 1)
            R = R - bops.to_flat(bt, bops.gg_dense(bt, F, d))
        return R
    print("pass B dense     ", march_time(keep(passB_only), P0), "ms")

    # isolate: concat+pad only (pass B data motion, no flux math)
    def concat_pad_only(P):
        P3 = bops.to_blocks(bt, P)
        nu3 = bops.to_blocks(bt, nu_fix[:, None])
        out = []
        for d in range(nd):
            V3 = jnp.concatenate(
                [P3, bops.to_blocks(bt, du_fix[d]), nu3], axis=-1)
            Vp = bops.pad_dim(bt, V3, d)
            Vo, Vn = bops.face_lr(bt, Vp, d)
            out.append(bops.to_flat(bt, bops.gg_dense(bt, Vo + Vn, d)))
        return out
    print("concat+pad only  ", march_time(keep(concat_pad_only), P0), "ms")

    # pad_dim gathers alone (on 9ch grid)
    V9 = jnp.concatenate([bops.to_blocks(bt, P0),
                          bops.to_blocks(bt, du_fix[0]),
                          bops.to_blocks(bt, nu_fix[:, None])], axis=-1)

    def pad_only(P):
        P3 = bops.to_blocks(bt, P)
        V = V9.at[..., :4].set(P3)
        out = []
        for d in range(nd):
            Vp = bops.pad_dim(bt, V, d)
            Vo, Vn = bops.face_lr(bt, Vp, d)
            out.append(bops.to_flat(bt, bops.gg_dense(bt, Vo + Vn, d)))
        return out
    print("pad only (9ch)   ", march_time(keep(pad_only), P0), "ms")

    # HLL flux math alone on cell grids (no faces)
    def flux_math_only(P):
        P3 = bops.to_blocks(bt, P)
        out = 0.0
        for d in range(nd):
            F = inviscid_fluxes_hll(fluid, P3, P3 * 1.0001, d)
            out = out + F
        return out
    print("hll math x2 dense", march_time(keep(flux_math_only), P0), "ms")


if __name__ == "__main__":
    main()
