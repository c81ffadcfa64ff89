"""Generate converged RAE2822 wall-Cp oracles at several mesh levels.

Writes tests/data/rae2822_cp_<tag>.npz with the wall-point coordinates, Cp,
Cl/Cd history tail, and config metadata. Run on the TPU (long marches).
"""

import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")

from ibx.cases import build_rae2822, force_coefficients, wall_cp  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data")

CONFIGS = {
    "coarse": dict(wall_h=2e-2, feature_h=1e-2, steps=20000),
    "medium": dict(wall_h=1e-2, feature_h=5e-3, steps=30000),
    # block_size=8 below 5e-3 dodges a [580,16,16,C]-shape TPU backend
    # fault (BASELINE.md round-3 study).
    "fine": dict(wall_h=5e-3, feature_h=2.5e-3, steps=120000,
                 block_size=8, cfl=0.7),
    # levels below 5e-3 became reachable after the round-3 projection fix
    # (geometry/refine.py: the f32-epsilon denominators vertex-snapped
    # fine-mesh ghost projections — the former "accuracy floor" at
    # wall_h < 5e-3 was +-25 deg ghost-normal noise, not the scheme).
    # Seed from the previous level (IBX_ORACLE_SEED) to skip the O(100k)
    # freestream transient.
    "xfine": dict(wall_h=2.5e-3, feature_h=1.25e-3, steps=60000,
                  block_size=8, cfl=0.7),
    "flagship": dict(wall_h=5e-4, feature_h=2.5e-4, steps=40000,
                     block_size=16, cfl=0.7),
    # bs-confound isolation arm (VERDICT r3 item 4): the flagship wall_h
    # at block_size=8 — same resolution, different octree block layout.
    # Seed from the committed xfine state (pre-write
    # /tmp/rae2822_state_xfine.npz from tests/data/rae2822_cp_xfine.npz).
    "flagship8": dict(wall_h=5e-4, feature_h=2.5e-4, steps=40000,
                      block_size=8, cfl=0.7),
}

# late-march Cp snapshots to quantify the shock limit cycle (phase spread)
N_PHASE = 8
PHASE_STRIDE = 500


def main():
    args = sys.argv[1:]
    which = [a for a in args if "=" not in a] or list(CONFIGS)
    overrides = {}
    for a in args:
        if "=" in a:
            k, v = a.split("=")
            overrides[k] = int(v) if k in ("steps", "block_size") else float(v)
    for tag in which:
        cfg = dict(CONFIGS[tag], **overrides)
        steps = cfg.pop("steps")
        cfg.setdefault("cfl", 0.7)
        t0 = time.time()
        case = build_rae2822(**cfg)
        print(f"[{tag}] cells={case.dom.ncells} build={time.time()-t0:.0f}s",
              flush=True)
        P = case.P0
        resume = os.environ.get("IBX_ORACLE_RESUME")
        seed = os.environ.get("IBX_ORACLE_SEED")
        if resume and os.path.exists(resume):
            P = case.apply_bcs(jax.numpy.asarray(np.load(resume)["P"]))
            print(f"[{tag}] resumed state from {resume}", flush=True)
            relax = os.environ.get("IBX_ORACLE_RELAX")
            if relax:
                # resumed from a RAW grid-transfer state (written by a
                # separate CPU process to keep one big case per TPU
                # process): relax the wall-crossing transfer noise off at
                # low CFL before the accurate march
                soft_case = build_rae2822(**dict(cfg, cfl=float(relax)))
                P = soft_case.march(P, 2000)
                del soft_case
                jax.block_until_ready(P)
                cl_r, _ = force_coefficients(case, np.asarray(P))
                print(f"[{tag}] resume relax done: Cl={cl_r:.4f}",
                      flush=True)
        elif seed:
            # grid sequencing: converge a coarser level first and IDW-
            # transfer it up — the explicit local-dt march at 881k cells
            # needs O(100k) steps from freestream, but only a local
            # relaxation from a converged coarser solution (the standard
            # production startup; reference multigrid transfers
            # src/ImmersedBoundary.jl:1391-1392 are the same operator).
            from ibx.solve.interp_util import idw_interpolator
            from ibx.ops.stencil import apply_stencil
            scfg = dict(CONFIGS[seed])
            s_steps = scfg.pop("steps")
            scfg.setdefault("cfl", 0.7)
            t1 = time.time()
            seed_case = build_rae2822(**scfg)
            s_state = f"/tmp/rae2822_state_{seed}.npz"
            if os.path.exists(s_state):
                # reuse the seed level's converged state (written by its
                # own oracle run earlier in the queue)
                Ps = seed_case.apply_bcs(jax.numpy.asarray(
                    np.load(s_state)["P"]))
                print(f"[{tag}] seed state loaded from {s_state}",
                      flush=True)
            else:
                Ps = seed_case.P0
                for _ in range(s_steps // 2000):
                    Ps = seed_case.march(Ps, 2000)
                    jax.block_until_ready(Ps)
            cl_s, cd_s = force_coefficients(seed_case, np.asarray(Ps))
            print(f"[{tag}] seed {seed} converged: Cl={cl_s:.4f} "
                  f"Cd={cd_s:.5f} ({time.time()-t1:.0f}s)", flush=True)
            st = jax.device_put(idw_interpolator(
                seed_case.dom.centers, case.dom.centers))
            P = case.apply_bcs(apply_stencil(st, jax.numpy.asarray(Ps)))
            del seed_case, Ps
            # the transfer leaves wall-crossing discontinuities that the
            # fine cells amplify; relax them off before the accurate march.
            # Default: the positivity-safe first-order+Einfeldt march.
            # IBX_ORACLE_SOFT_START: low-CFL relax with the NORMAL scheme
            # instead — the march_robust program deterministically faults
            # the TPU backend at the xfine [1741,8,8,C] block-grid shape
            # (3/3, same opaque relay 'kernel fault' class as the
            # documented [580,16,16,C] case; the normal march at the
            # SAME shape is fine)
            soft = os.environ.get("IBX_ORACLE_SOFT_START")
            if soft:
                soft_case = build_rae2822(**dict(cfg, cfl=float(soft)))
                P = soft_case.march(P, 2000)
                del soft_case
            else:
                P = case.march_robust(P, 2000)
            jax.block_until_ready(P)
            cl_r, cd_r = force_coefficients(case, np.asarray(P))
            print(f"[{tag}] startup relax done: Cl={cl_r:.4f}", flush=True)
        cl_hist = []
        t0 = time.time()
        chunk = 2000
        partial = f"/tmp/rae2822_partial_{tag}.npz"
        i0 = 0
        if os.path.exists(partial):
            d = np.load(partial)
            P = case.apply_bcs(jax.numpy.asarray(d["P"]))
            i0 = int(d["i"])
            cl_hist = [tuple(r) for r in d["cl_hist"]]
            print(f"[{tag}] resumed partial at chunk {i0}", flush=True)
        for i in range(i0, steps // chunk):
            # the TPU relay sporadically kills dispatches ("TPU device
            # error", transient per CLAUDE.md); checkpoint every 5 chunks
            # so a wrapper can relaunch and resume
            P = case.march(P, chunk)
            jax.block_until_ready(P)
            cl, cd = force_coefficients(case, np.asarray(P))
            cl_hist.append((cl, cd))
            print(f"[{tag}] step {(i+1)*chunk}: Cl={cl:.4f} Cd={cd:.5f}",
                  flush=True)
            if (i + 1) % 5 == 0:
                np.savez(partial, P=np.asarray(P), i=i + 1,
                         cl_hist=np.asarray(cl_hist, np.float32))
        # limit-cycle phase sweep
        cp_phases = []
        for _ in range(N_PHASE):
            P = case.march(P, PHASE_STRIDE)
            jax.block_until_ready(P)
            cp_phases.append(wall_cp(case, np.asarray(P)))
            cl, cd = force_coefficients(case, np.asarray(P))
            cl_hist.append((cl, cd))
        Pn = np.asarray(P)
        assert np.isfinite(Pn).all()
        np.savez(f"/tmp/rae2822_state_{tag}.npz", P=Pn)   # restart file
        if os.path.exists(partial):
            os.remove(partial)
        cp = wall_cp(case, Pn)
        surf = case.dom.surfaces["wall"]
        cl, cd = force_coefficients(case, Pn)
        out = os.path.join(OUT, f"rae2822_cp_{tag}.npz")
        save = dict(
            x=surf.points[:, 0], y=surf.points[:, 1], cp=cp,
            cl=cl, cd=cd,
            cl_hist=np.asarray(cl_hist, np.float32),
            cp_phases=np.asarray(cp_phases, np.float32),
            meta=json.dumps(dict(cfg, steps=steps, mach=0.73, alpha=2.31,
                                 cells=case.dom.ncells,
                                 phase_stride=PHASE_STRIDE)),
        )
        # converged STATE for drift-regression tests (march from here and
        # assert mean |dCp| stays ~1e-2): commit-sized below ~1M cells
        if case.dom.ncells <= 1_000_000:
            save["P"] = Pn
        np.savez_compressed(out, **save)
        print(f"[{tag}] wrote {out}  Cl={cl:.4f} Cd={cd:.5f} "
              f"march={time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
