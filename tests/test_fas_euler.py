"""FAS-accelerated Euler on the RAE2822 hierarchy: cycles run, reduce the
residual, and keep the state physical."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.cases.rae2822 import RAE_DAT
from ibx.geometry import DistanceField, build_mesh, feature_regions, \
    load_surface, merge_points
from ibx.geometry.inside import points_inside
from ibx.physics import apply_flow_bc, flow_bc, make_fluid
from ibx.solve.fas_euler import FasEuler
from ibx.topology import Domain


@pytest.fixture(scope="module")
def solver():
    stl = merge_points(load_surface(RAE_DAT))
    features = DistanceField(feature_regions(stl, radius=0.05))
    msh = build_mesh(
        [-25.0, -25.0], [50.0, 50.0],
        ("wall", stl, 4e-2),
        refinement_regions=[(features, 2e-2)],
    )
    dom = Domain(msh, hypercube_families=[
        ("farfield", [(0, False), (0, True), (1, False), (1, True)]),
    ])
    fluid = make_fluid()
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    P_inf = np.array([p_inf, T_inf, 0.73 * a * np.cos(0.0403),
                      0.73 * a * np.sin(0.0403)], np.float32)
    far = flow_bc(fluid, P_inf)
    wall = flow_bc(fluid, [p_inf, T_inf, 0.0], normal_flow=True)

    def make_bcs(d):
        def apply_bcs(P):
            P = d.impose_bc(
                "farfield",
                lambda b, Pi: apply_flow_bc(far, Pi, b.normals), P)
            P = d.impose_bc(
                "wall", lambda b, Pi: apply_flow_bc(wall, Pi, b.normals), P)
            return P
        return apply_bcs

    fe = FasEuler(dom, fluid, make_bcs, max_levels=2, cfl=0.5,
                  inside_fn=lambda c: points_inside(stl, c))
    fe_rk2 = FasEuler(dom, fluid, make_bcs, max_levels=2, cfl=0.7,
                      smoother="rk2",
                      inside_fn=lambda c: points_inside(stl, c))
    P0 = np.tile(P_inf, (dom.ncells, 1))
    P0[points_inside(stl, dom.centers), 2:] = 0.0
    return fe, fe_rk2, jnp.asarray(P0)


def test_fas_euler_cycles(solver):
    fe, _, P0 = solver
    Q = fe.init_state(P0)
    cycle = jax.jit(lambda Q: fe.cycle(Q, n_iter=10, rtol=1e-3))
    ratios = []
    for _ in range(4):
        Q, r = cycle(Q)
        ratios.append(float(r))
    Qn = np.asarray(Q)
    assert np.isfinite(Qn).all()
    # residual is being reduced within cycles
    assert min(ratios) < 1.0
    # physical ranges over ACTIVE (fluid) cells; frozen solid-interior cells
    # accumulate unrelaxed coarse corrections and are don't-care
    P = np.asarray(fe.primitives(Q))
    act = np.asarray(fe.active[0]) > 0
    assert P[act, 0].min() > 1e3 and P[act, 0].max() < 1e6
    assert (P[act, 1] > 50).all()


def test_fas_vs_smoothing(solver):
    """Coarse-grid correction must not hurt fine-level convergence for the
    same fine-level work."""
    fe, _, P0 = solver
    Q0 = fe.init_state(P0)
    cyc = jax.jit(lambda Q: fe.cycle(Q, n_iter=10, rtol=1e-6))
    smo = jax.jit(lambda Q: fe.smooth_only(Q, n_iter=10, rtol=1e-6))
    Qc, Qs = Q0, Q0
    for _ in range(3):
        Qc, _ = cyc(Qc)
        Qs, _ = smo(Qs)
    rc, _ = fe._f(0, Qc)
    rs, _ = fe._f(0, Qs)
    nc = float(jnp.sqrt((rc ** 2).sum()))
    ns = float(jnp.sqrt((rs ** 2).sum()))
    assert np.isfinite(nc) and np.isfinite(ns)
    assert nc < ns * 2.0  # coarse correction comparable or better


def test_fas_euler_rk2_smoother(solver):
    """The rk2-map smoother (FasEuler docstring: the stable production
    fixed point, vs the linearly unstable forward-Euler recipe on smooth
    cases) cycles stably and keeps reducing the residual."""
    _, fe, P0 = solver
    Q = fe.init_state(P0)
    cycle = jax.jit(lambda Q: fe.cycle(Q, n_iter=10, rtol=1e-6))
    norms = []
    for _ in range(4):
        Q, _ = cycle(Q)
        r, _ = fe._f(0, Q)
        norms.append(float(jnp.sqrt((r.astype(jnp.float32) ** 2).sum())))
    assert np.isfinite(norms).all()
    # bounded (no blow-up) and net-decreasing after the first cycle
    assert norms[-1] < norms[0]
    P = np.asarray(fe.primitives(Q))
    act = np.asarray(fe.active[0]) > 0
    assert P[act, 0].min() > 1e3 and P[act, 0].max() < 1e6
    assert (P[act, 1] > 50).all()
