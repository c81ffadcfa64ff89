"""RHS structure lab: time euler_rhs_grid variants on a SYNTHETIC uniform
3D block grid (no host mesh build) at bench scale.

The synthetic forest is an nx*ny*nz arrangement of bs^3 blocks with dense
same-size neighbors everywhere and one-sided domain boundaries — the
dominant cost shape of the sphere3d bench (2:1 interfaces and sparse
leftovers are a few % of faces there). Lets RHS restructurings be A/B'd
on the TPU in seconds instead of minutes of octree compile.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/rhs_lab.py \
            [variant ...] [nx=11] [bs=16] [steps=50]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ibx.topology.blocks import BlockTables
from ibx.physics.fluid import make_fluid


def synth_tables(nx=11, ny=None, nz=None, bs=16, h=0.01):
    ny = ny or nx
    nz = nz or nx
    nd = 3
    B = nx * ny * nz
    N = B * bs ** nd

    def bid(ix, iy, iz):
        return (iz * ny + iy) * nx + ix

    iz, iy, ix = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    ix, iy, iz = ix.ravel(), iy.ravel(), iz.ravel()
    nbr, bnd, ev = [], [], []
    for d, c, n_d in ((0, ix, nx), (1, iy, ny), (2, iz, nz)):
        sides = []
        bsides = []
        esides = []
        for s in (0, 1):
            off = -1 if s == 0 else 1
            cc = c + off
            at_edge = (cc < 0) | (cc >= n_d)
            cc = np.clip(cc, 0, n_d - 1)
            if d == 0:
                nb = bid(cc, iy, iz)
            elif d == 1:
                nb = bid(ix, cc, iz)
            else:
                nb = bid(ix, iy, cc)
            nb = np.where(at_edge, np.arange(B), nb)
            sides.append(nb.astype(np.int32))
            bsides.append(at_edge.astype(np.float32))
            esides.append(np.ones(B, np.float32))
        nbr.append(tuple(sides))
        bnd.append(tuple(bsides))
        ev.append(tuple(esides))

    e_i = tuple(np.zeros(0, np.int32) for _ in range(2))
    e_f = tuple(np.zeros(0, np.float32) for _ in range(2))
    e_q = tuple(np.zeros((0, 4), np.int32) for _ in range(2))
    inv = tuple(np.zeros(B, np.int32) for _ in range(2))
    bt = BlockTables(
        nbr=tuple(nbr), bnd=tuple(bnd), edge_valid=tuple(ev),
        h=np.full((B, nd), h, np.float32),
        fs_block=(e_i,) * nd, fs_coarse=(e_i,) * nd, fs_off=(e_i,) * nd,
        fs_inv=(inv,) * nd,
        cs_block=(e_i,) * nd, cs_fine=(e_q,) * nd, cs_inv=(inv,) * nd,
        ifc_inv=(inv,) * nd,
        sp_owner=(np.zeros(0, np.int32),) * nd,
        sp_neighbor=(np.zeros(0, np.int32),) * nd,
        sp_wr=(np.zeros(0, np.float32),) * nd,
        sp_wl=(np.zeros(0, np.float32),) * nd,
        spacing_flat=np.full((N, nd), h, np.float32),
        n_blocks=B, block_size=bs, nd=nd, n_cells=N,
    )
    return jax.device_put(bt)


def init_state(bt, seed=0):
    rng = np.random.default_rng(seed)
    shape = (bt.n_blocks,) + (bt.block_size,) * bt.nd + (5,)
    P = np.empty(shape, np.float32)
    P[..., 0] = 101325.0 * (1 + 0.01 * rng.standard_normal(shape[:-1]))
    P[..., 1] = 288.15 * (1 + 0.01 * rng.standard_normal(shape[:-1]))
    P[..., 2] = 100.0 + rng.standard_normal(shape[:-1])
    P[..., 3] = rng.standard_normal(shape[:-1])
    P[..., 4] = rng.standard_normal(shape[:-1])
    return jnp.asarray(P)


def time_march(step3, P3, steps, label):
    @jax.jit
    def march(P3, n):
        return jax.lax.fori_loop(0, n, lambda _, x: step3(x), P3)

    out = march(P3, 2)
    jax.block_until_ready(out)
    t0 = time.time()
    out = march(P3, steps)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / steps
    n = int(np.prod(P3.shape[:-1]))
    print(f"{label:28s} {dt * 1e3:8.2f} ms/step "
          f"{n / dt / 1e6:8.1f} Mcup/s  finite={bool(jnp.isfinite(out).all())}",
          flush=True)
    return dt


def main():
    kw = dict(nx=11, bs=16, steps=30)
    variants = []
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=")
            kw[k] = int(v)
        else:
            variants.append(a)
    if not variants:
        variants = ["rk2"]

    fluid = make_fluid()
    bt = synth_tables(nx=kw["nx"], bs=kw["bs"])
    print(f"synthetic: {bt.n_blocks} blocks of {kw['bs']}^3 = "
          f"{bt.n_cells / 1e6:.2f}M cells", flush=True)
    P3 = init_state(bt)

    from ibx.ops import block_ops as bo

    for v in variants:
        if v == "rk2":
            def step3(P3):
                return bo.rk2_step_grid(bt, fluid, P3, lambda x: x,
                                        cfl=0.5)[0]
            time_march(step3, P3, kw["steps"], "rk2 (current, no BC)")
        elif v == "rhs1":
            # single RHS evaluation + Euler update (isolates one RHS eval)
            from ibx.physics.fluid import primitive2state
            from ibx.physics.fluid import state2primitive_guarded as s2pg

            def step3(P3):
                R, dt3, _ = bo.euler_rhs_grid(bt, fluid, P3, with_dt=True,
                                              cfl=0.5)
                return s2pg(fluid, primitive2state(fluid, P3)
                            + dt3[..., None] * R)
            time_march(step3, P3, kw["steps"], "euler 1-stage (1 RHS)")
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
