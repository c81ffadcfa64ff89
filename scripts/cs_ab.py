"""A/B lab for the 3D channel-split step (fori_loop-marched timings, the
only trustworthy pattern on this relay — CLAUDE.md).

Builds the sphere3d bs=16 case ONCE, then times step variants:
  * full rk2 step, correction fold ON (IBX_CS_FOLD=1, the default)
  * full rk2 step, fold OFF (streamed _cols_add_cs pre-adds)
  * RHS-only (both fold modes)
  * BC-only, update-only

Usage: python scripts/cs_ab.py [wall_h=0.03] [bs=16] [K=200]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

from ibx.cases.sphere3d import build_sphere3d                # noqa: E402
from ibx.ops.pallas_rhs import (                             # noqa: E402
    cs_split, euler_rhs_cs, rk2_step_cs, run_update)


def main():
    wall_h, bs, K = 0.03, 16, 200
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "wall_h":
            wall_h = float(v)
        elif k == "bs":
            bs = int(v)
        elif k == "K":
            K = int(v)
    t0 = time.time()
    case = build_sphere3d(wall_h=wall_h, cfl=0.5, block_size=bs)
    g = case.grid
    assert g is not None and "apply_bcs_cs" in g, "cs path not active"
    bt, apply_bcs_cs, active_cs = g["bt"], g["apply_bcs_cs"], g["active_cs"]
    fluid = case.fluid
    n = case.dom.ncells
    print(f"cells={n} build={time.time()-t0:.0f}s", flush=True)

    from ibx.ops.block_ops import to_blocks
    Pc0 = cs_split(bt, to_blocks(bt, np.asarray(case.P0)))

    def timeit(name, body):
        @jax.jit
        def m(Pc):
            return jax.lax.fori_loop(0, K, lambda _, P: body(P), Pc)
        out = m(Pc0)
        jax.block_until_ready(out)
        t0 = time.time()
        out = m(Pc0)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / K
        print(f"{name:24s} {dt*1e3:8.2f} ms/iter  "
              f"({n/dt/1e6:.1f}M cells/s)", flush=True)
        return dt

    def full_step(Pc):
        return rk2_step_cs(bt, fluid, Pc, apply_bcs_cs, cfl=0.5,
                           high_order=True, active_cs=active_cs)[0]

    def rhs_only(Pc):
        R = euler_rhs_cs(bt, fluid, Pc, high_order=True)
        return Pc + 1e-30 * R

    def bc_only(Pc):
        return apply_bcs_cs(Pc)

    def upd_only(Pc):
        dtb = jnp.ones_like(Pc[:, :1])
        return run_update(bt, fluid, Pc, Pc * 1e-30, None, dtb,
                          active_cs, 0.5)

    only = os.environ.get("IBX_AB_ONLY", "")
    if only == "bc":
        for clip in ("1", "0"):
            os.environ["IBX_BC_CLIP"] = clip
            timeit(f"bc_only clip={clip}", bc_only)
        for clip in ("1", "0"):
            os.environ["IBX_BC_CLIP"] = clip
            timeit(f"full_step clip={clip}", full_step)
        return
    for fold in ("1", "0"):
        os.environ["IBX_CS_FOLD"] = fold
        timeit(f"full_step fold={fold}", full_step)
        timeit(f"rhs_only  fold={fold}", rhs_only)
    os.environ["IBX_CS_FOLD"] = "1"
    timeit("bc_only", bc_only)
    timeit("upd_only", upd_only)


if __name__ == "__main__":
    main()
