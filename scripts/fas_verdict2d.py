"""FAS verdict, 2D subsonic arm (VERDICT r3 item 3).

The 3D wing harness (fas_verdict.py) showed the workload-5 residual is
essentially FLAT over any practical budget (0.989 of the warm-start
value after 4.3k steps / 240 s at 810k cells) — nothing can show a drop
there in minutes.  This script asks the question on a case where
convergence actually happens inside a TPU budget: subsonic (M = 0.4,
no shock) RAE2822, where a steady state exists and multigrid should
shine if it ever does (smooth elliptic-dominated flow; reference FAS
semantics ``src/solver.jl:39-91``).

Arms (identical fine-level smoother = the production TVD-RK2 map
``r = RK2(Q) - Q``, so the ONLY difference is the coarse-grid
correction; the reference recipe's forward-Euler fixed point was
measured linearly unstable on this smooth case at any cfl —
scripts/fas_smoother_probe.py, FasEuler docstring):
  smooth      fas.smooth_only(n_iter=25) repeated
  fas2 / fas3 fas.cycle(n_iter=25) with 2 / 3 levels
  rk2         the production block-path TVD-RK2 march (context arm:
              what the framework actually ships)

Metric: L2 of dt*R(Q) at fixed cfl 0.7 — a common functional
independent of each arm's smoother map — vs wall-clock; drop clocks
measured from the PEAK of each curve (the impulsive start rises
first).  Everything restarts from the same freestream state.

Usage: python scripts/fas_verdict2d.py [wall_h=2e-2] [budget_s=120]
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from ibx.cases.rae2822 import RAE_DAT                      # noqa: E402
from ibx.geometry import (DistanceField, build_mesh,        # noqa: E402
                          feature_regions, load_surface, merge_points)
from ibx.geometry.inside import points_inside               # noqa: E402
from ibx.physics import apply_flow_bc, flow_bc, make_fluid  # noqa: E402
from ibx.solve.fas_euler import FasEuler                    # noqa: E402
from ibx.topology import Domain                             # noqa: E402

WALL_H = float(sys.argv[1]) if len(sys.argv) > 1 else 2e-2
BUDGET = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
# the rk2-map smoother is stable at the production CFL (the euler fixed
# point diverged at 0.5 AND 0.35 — see module docstring)
SMOOTH_CFL = float(sys.argv[3]) if len(sys.argv) > 3 else 0.7
# optional arm subset, e.g. "smooth,fas2" (argv[4]); default all
ARMS = (sys.argv[4].split(",") if len(sys.argv) > 4
        else ["smooth", "fas2", "fas3", "rk2_block"])
MACH = 0.4
ALPHA = 0.0403  # rad (2.31 deg, the flagship's alpha)
TARGETS = (0.3, 0.1, 0.03, 0.01)


def build_case():
    """ONE domain for every arm (the rk2 block march and the FAS
    hierarchy's fine level share cells, ordering and BCs)."""
    from ibx.cases.rae2822 import build_rae2822
    return build_rae2822(wall_h=WALL_H, feature_h=WALL_H / 2, mach=MACH,
                         alpha_deg=float(np.degrees(ALPHA)), cfl=0.7)


def build_fe(case, max_levels):
    stl = merge_points(load_surface(RAE_DAT))
    fluid = case.fluid
    P_inf = np.asarray(case.P_inf, np.float32)
    far = flow_bc(fluid, P_inf)
    wall = flow_bc(fluid, [float(P_inf[0]), float(P_inf[1]), 0.0],
                   normal_flow=True)

    def make_bcs(d):
        def apply_bcs(P):
            P = d.impose_bc(
                "farfield",
                lambda b, Pi: apply_flow_bc(far, Pi, b.normals), P)
            P = d.impose_bc(
                "wall",
                lambda b, Pi: apply_flow_bc(wall, Pi, b.normals), P)
            return P
        return apply_bcs

    return FasEuler(case.dom, fluid, make_bcs, max_levels=max_levels,
                    cfl=SMOOTH_CFL, smoother="rk2",
                    inside_fn=lambda c: points_inside(stl, c))


_SOLVED_MASK = {}


def solved_mask(fe):
    """SOLVED-cell mask: excludes in-solid cells AND ghost cells of every
    BC family.  Ghost cells are overwritten by ``impose_bc`` each step —
    their dt*R never relaxes — and on a fully converged steady state they
    carry >99.99% of the naive functional's energy (round-5 measurement,
    fine-level oracle: L2 all = 3.1e5 vs L2 solved-only = 1.4e3).  Any
    convergence metric that includes them is floored at its initial
    value, which is exactly what the round-4 harness curves showed."""
    dom = fe.domains[0]
    key = id(dom)
    if key not in _SOLVED_MASK:
        import numpy as np
        ghost = np.zeros(dom.ncells, bool)
        for _, hb in dom._host_boundaries.items():
            ghost[hb.ghosts] = True
        m = (~ghost).astype(np.float32)
        if fe.active[0] is not None:
            m = m * np.asarray(fe.active[0])
        _SOLVED_MASK[key] = jnp.asarray(m)
    return _SOLVED_MASK[key]


def res_l2(fe, Q):
    """Common metric across arms: L2 of dt*R over SOLVED cells at fixed
    cfl 0.7 (NOT the arm's own smoother map; see `solved_mask`)."""
    from ibx.physics.fluid import physicality_guard, state2primitive
    from ibx.solve.euler import euler_rhs, local_timestep
    part = fe.domains[0].partitions[0]
    P = fe.bcs[0](physicality_guard(state2primitive(fe.fluid, Q)))
    R = euler_rhs(part, fe.fluid, P, high_order=fe.high_order)
    dt = local_timestep(part, fe.fluid, P, 0.7) * solved_mask(fe)
    r = R * dt[:, None]
    return float(jnp.sqrt((r.astype(jnp.float32) ** 2).sum()))


def run_arm(name, fe, Q0, use_cycle, budget=BUDGET):
    fn = (jax.jit(lambda Q: fe.cycle(Q, n_iter=25, rtol=1e-6)[0])
          if use_cycle else
          jax.jit(lambda Q: fe.smooth_only(Q, n_iter=25, rtol=1e-6)[0]))
    Q = fn(Q0)                     # compile outside the timed window
    jax.block_until_ready(Q)
    Q = Q0
    curve = [(0.0, res_l2(fe, Q0))]
    t0 = time.time()
    while time.time() - t0 < budget:
        Q = fn(Q)
        jax.block_until_ready(Q)
        curve.append((time.time() - t0, res_l2(fe, Q)))
    report(name, curve)
    return curve


def report(name, curve):
    rs = [r for _, r in curve]
    pk = int(np.argmax(rs))
    peak = rs[pk]
    out = {"arm": name, "res0": rs[0], "peak": peak,
           "final_ratio": rs[-1] / peak}
    for tgt in TARGETS:
        hit = next((t for t, r in curve[pk:] if r <= tgt * peak), None)
        out[f"t_to_{tgt}"] = None if hit is None else round(hit, 2)
    print(json.dumps(out), flush=True)


def run_rk2_arm(case, fe, budget=BUDGET):
    """Production block-path TVD-RK2 march on the same domain, with the
    residual probed through the same FasEuler functional."""
    P = case.P0
    P, _ = case.step(P)
    jax.block_until_ready(P)       # compile
    P = case.P0
    curve = [(0.0, res_l2(fe, fe.init_state(P)))]
    t0 = time.time()
    while time.time() - t0 < budget:
        P = case.march(P, 25)
        jax.block_until_ready(P)
        curve.append((time.time() - t0,
                      res_l2(fe, fe.init_state(P))))
    report("rk2_block", curve)
    return curve


def main():
    t0 = time.time()
    case = build_case()
    fe2 = build_fe(case, 2)
    print(f"cells={case.dom.ncells} build={time.time()-t0:.0f}s",
          flush=True)
    Q0 = fe2.init_state(case.P0)

    curves = {}
    if "smooth" in ARMS:
        curves["smooth"] = run_arm("smooth", fe2, Q0, use_cycle=False)
    if "fas2" in ARMS:
        curves["fas2"] = run_arm("fas2", fe2, Q0, use_cycle=True)

    if "fas3" in ARMS:
        t0 = time.time()
        fe3 = build_fe(case, 3)
        print(f"3-level build={time.time()-t0:.0f}s", flush=True)
        curves["fas3"] = run_arm("fas3", fe3, Q0, use_cycle=True)

    if "rk2_block" in ARMS:
        curves["rk2_block"] = run_rk2_arm(case, fe2)

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       f"fas_verdict2d_{WALL_H:g}.npz")
    np.savez(out, **{k: np.asarray(v) for k, v in curves.items()})
    print(f"curves -> {out}", flush=True)


if __name__ == "__main__":
    main()
