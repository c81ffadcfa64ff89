"""End-to-end 2D linear advection — the reference's `test/advection.jl`
workload, fully jitted (mesh -> domain -> MUSCL/JST residual -> ghost BCs ->
CFL-bounded explicit march), with real assertions instead of visual checks.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.geometry import Line, build_mesh, polyline
from ibx.io import export_vtk
from ibx.ops import operators as ops
from ibx.topology import Domain


@pytest.fixture(scope="module")
def setup():
    lower = polyline(np.array([[0.0, 0.0], [1.0, 0.0]]), closed=False)
    upper = polyline(np.array([[0.0, 0.0], [0.0, 1.0]]), closed=False)
    msh = build_mesh(
        [0.0, 0.0], [1.0, 1.0],
        ("lower", lower, 2e-2),
        ("upper", upper, 2e-2),
        refinement_regions=[
            (Line([0.0, 0.0], [1.0, 1.0]), 4e-2),
            (Line([0.0, 0.0], [0.5, 0.5]), 2e-2),
        ],
    )
    dom = Domain(
        msh,
        hypercube_families=[("outlet", [(0, True), (1, True)])],
    )
    return msh, dom


def _apply_bcs(dom, u):
    u = dom.impose_bc("upper", lambda b, ui: jnp.ones_like(ui), u)
    u = dom.impose_bc("lower", lambda b, ui: jnp.zeros_like(ui), u)
    u = dom.impose_bc("outlet", lambda b, ui: ui, u)
    return u


def test_advection_end_to_end(setup, tmp_path):
    msh, dom = setup
    part = dom.partitions[0]
    N = dom.ncells

    Cx = jnp.ones(N)
    Cy = jnp.ones(N)
    C = (Cx, Cy)

    def cfl_dt():
        bound = jnp.maximum(
            ops.unsigned_green_gauss(part, ops.at_faces(part, Cx, 0), 0),
            ops.unsigned_green_gauss(part, ops.at_faces(part, Cy, 1), 1),
        )
        return 0.5 / bound.max()

    def residual(u):
        D = ops.jst_sensor(part, u)
        ud = jnp.zeros_like(u)
        for dim in range(2):
            Cf = ops.at_faces(part, C[dim], dim)
            du = ops.cell_gradient(part, u, dim)
            uL, uR = ops.muscl(part, u, du, dim, D=D, high_order=True)
            flux = (uL + uR) * Cf / 2 + jnp.abs(Cf) * (uL - uR) / 2
            ud = ud - ops.green_gauss(part, flux, dim)
        return ud

    dt = 0.75 * cfl_dt()

    @jax.jit
    def march(u, n_steps):
        def body(_, u):
            u = u + residual(u) * dt
            return _apply_bcs(dom, u)
        return jax.lax.fori_loop(0, n_steps, body, u)

    u = jnp.zeros(N)
    u = _apply_bcs(dom, u)
    u = march(u, 800)
    un = np.asarray(u)

    assert np.isfinite(un).all()
    # steady state of du/dt + du/dx + du/dy = 0 with u=1 above the diagonal
    # inflow and u=0 below: a smeared step along y = x
    x, y = dom.centers[:, 0], dom.centers[:, 1]
    above = (y - x) > 0.15
    below = (x - y) > 0.15
    assert un[above].min() > 0.85
    assert np.abs(un[below]).max() < 0.15
    # MUSCL + minmod keeps the solution essentially bound-preserving
    assert un.min() > -0.05 and un.max() < 1.05

    # VTK export round-trip
    out = os.path.join(tmp_path, "advection")
    export_vtk(out, dom, u=un)
    assert os.path.isfile(os.path.join(out, "VOLUME.vtm"))
    assert os.path.isfile(os.path.join(out, "lower.vtp"))


def test_dissipation_end_to_end(setup):
    """The reference's `test/dissipation.jl`: pure diffusion of a 2-component
    field with Dirichlet walls and Neumann outer boundaries."""
    msh, dom = setup
    part = dom.partitions[0]
    N = dom.ncells

    def apply_bcs(uv):
        uv = dom.impose_bc(
            "upper",
            lambda b, i: jnp.broadcast_to(jnp.asarray([1.0, 0.0]), i.shape),
            uv,
        )
        uv = dom.impose_bc(
            "lower",
            lambda b, i: jnp.broadcast_to(jnp.asarray([0.0, 1.0]), i.shape),
            uv,
        )
        uv = dom.impose_bc("outlet", lambda b, i: i, uv)
        return uv

    bound = (
        ops.unsigned_green_gauss(part, 1.0 / ops.face_distance(part, 0), 0)
        + ops.unsigned_green_gauss(part, 1.0 / ops.face_distance(part, 1), 1)
    )
    dt = 0.5 / bound.max()

    @jax.jit
    def march(uv, n):
        def body(_, uv):
            d = jnp.zeros_like(uv)
            for dim in range(2):
                d = d + ops.green_gauss(
                    part, ops.face_gradient(part, uv, dim), dim
                )
            return apply_bcs(uv + d * dt)
        return jax.lax.fori_loop(0, n, body, uv)

    uv = apply_bcs(jnp.zeros((N, 2)))
    uv = march(uv, 400)
    uvn = np.asarray(uv)
    assert np.isfinite(uvn).all()
    # diffusion obeys the maximum principle
    assert uvn.min() > -0.01 and uvn.max() < 1.01
    # field has actually diffused into the interior
    interior = (dom.centers.min(axis=1) > 0.2) & (dom.centers.max(axis=1) < 0.8)
    assert uvn[interior].sum() > 0.1
