"""3D capability: octree mesh over an STL sphere, ghost-cell IB, Euler march.

The reference's 3D path (triangulated STL, octree, 3D operators/fluxes) has
no committed test; this exercises it end to end with assertions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.geometry import (
    DistanceField,
    Stereolitography,
    build_mesh,
    get_cells,
    merge_points,
    refine_to_length,
)
from ibx.ops import operators as ops
from ibx.physics import apply_flow_bc, flow_bc, make_fluid
from ibx.solve.euler import euler_rhs, local_timestep, rk2_step
from ibx.topology import Domain


def icosphere(radius=0.5, center=(0.0, 0.0, 0.0)):
    """Icosahedron-based sphere surface."""
    phi = (1 + np.sqrt(5)) / 2
    verts = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], dtype=np.float32)
    verts /= np.linalg.norm(verts[0])
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)
    stl = Stereolitography(verts * radius + np.asarray(center, np.float32),
                           faces)
    # refine + reproject to the sphere for a decent approximation
    stl = refine_to_length(stl, 0.35 * radius)
    c = np.asarray(center, np.float32)
    r = stl.points - c
    stl.points = c + r * (radius / np.linalg.norm(r, axis=1))[:, None]
    return stl


@pytest.fixture(scope="module")
def sphere_case():
    stl = merge_points(icosphere())
    msh = build_mesh(
        [-4.0, -4.0, -4.0], [8.0, 8.0, 8.0],
        ("wall", stl, 0.25),
        block_size=4,
    )
    dom = Domain(
        msh,
        hypercube_families=[(
            "farfield",
            [(0, False), (0, True), (1, False), (1, True),
             (2, False), (2, True)],
        )],
    )
    return msh, dom


def test_3d_mesh_and_domain(sphere_case):
    msh, dom = sphere_case
    assert dom.nd == 3
    assert dom.ncells == len(msh)
    # volume covered exactly
    np.testing.assert_allclose(
        float(dom.volume_integral(jnp.ones(dom.ncells))), 512.0, rtol=1e-4
    )
    # ghosts exist around the sphere and the farfield box
    assert dom.boundaries["wall"][0].n_ghost > 100
    assert dom.boundaries["farfield"][0].n_ghost > 100
    # wall normals are unit and roughly radial
    b = dom.boundaries["wall"][0]
    n = np.asarray(b.normals)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)


def test_3d_gradients(sphere_case):
    msh, dom = sphere_case
    part = dom.partitions[0]
    z = jnp.asarray(dom.centers[:, 2])
    gz = np.asarray(ops.cell_gradient(part, z, 2))
    # interior far from sphere and box
    c = dom.centers
    r = np.linalg.norm(c, axis=1)
    inner = (r > 1.5) & (np.abs(c).max(axis=1) < 3.0)
    # uniform far region
    w = dom.widths
    fo, fn = dom.face_owner, dom.face_neighbor
    ok = (fo >= 0) & (fn >= 0)
    jump = ~np.isclose(w[fo[ok], 0], w[fn[ok], 0])
    uni = np.ones(dom.ncells, bool)
    uni[fo[ok][jump]] = False
    uni[fn[ok][jump]] = False
    np.testing.assert_allclose(gz[inner & uni], 1.0, atol=5e-3)


def test_3d_euler_march(sphere_case):
    msh, dom = sphere_case
    part = dom.partitions[0]
    fluid = make_fluid()
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    P_inf = np.array([p_inf, T_inf, 0.3 * a, 0.0, 0.0], dtype=np.float32)
    far = flow_bc(fluid, P_inf)
    wall = flow_bc(fluid, [p_inf, T_inf, 0.0], normal_flow=True)

    def apply_bcs(P):
        P = dom.impose_bc(
            "farfield", lambda b, Pi: apply_flow_bc(far, Pi, b.normals), P)
        P = dom.impose_bc(
            "wall", lambda b, Pi: apply_flow_bc(wall, Pi, b.normals), P)
        return P

    @jax.jit
    def march(P, n):
        def body(_, P):
            return rk2_step(part, fluid, P, apply_bcs, cfl=0.5)[0]
        return jax.lax.fori_loop(0, n, body, P)

    P = apply_bcs(jnp.broadcast_to(jnp.asarray(P_inf), (dom.ncells, 5)))
    P = march(P, 30)
    Pn = np.asarray(P)
    assert np.isfinite(Pn).all()
    # stagnation: pressure rises ahead of the sphere (flow +x, front at x<0)
    c = dom.centers
    front = (np.abs(c[:, 1]) < 0.3) & (np.abs(c[:, 2]) < 0.3) & \
            (c[:, 0] > -1.2) & (c[:, 0] < -0.55)
    assert Pn[front, 0].mean() > p_inf * 1.01


def test_checkpoint_roundtrip(tmp_path):
    from ibx.io.checkpoint import load_checkpoint, save_checkpoint

    state = {"P": np.random.default_rng(0).normal(size=(64, 4)).astype(
        np.float32), "t": np.float32(1.25)}
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, step=42, meta={"case": "sphere"})
    loaded, step, meta = load_checkpoint(path)
    assert step == 42
    assert meta["case"] == "sphere"
    np.testing.assert_array_equal(loaded["P"], state["P"])
