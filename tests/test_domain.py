import numpy as np
import jax.numpy as jnp
import pytest

from ibx.geometry import Line, Mesh, build_mesh, polyline
from ibx.ops import operators as ops
from ibx.topology import Domain


@pytest.fixture(scope="module")
def adv_mesh():
    # the advection test geometry (reference test/advection.jl:4-20), coarser
    lower = polyline(np.array([[0.0, 0.0], [1.0, 0.0]]), closed=False)
    upper = polyline(np.array([[0.0, 0.0], [0.0, 1.0]]), closed=False)
    return build_mesh(
        [0.0, 0.0], [1.0, 1.0],
        ("lower", lower, 4e-2),
        ("upper", upper, 4e-2),
        refinement_regions=[(Line([0.0, 0.0], [1.0, 1.0]), 8e-2)],
        block_size=4,
    )


@pytest.fixture(scope="module")
def adv_domain(adv_mesh):
    return Domain(
        adv_mesh,
        hypercube_families=[("outlet", [(0, True), (1, True)])],
    )


def _interior_mask(dom, margin=2):
    # cells at least `margin` diameters away from any hypercube wall AND not
    # adjacent to a refinement-level jump (Green-Gauss is only exactly
    # linear-preserving on locally uniform grids — same as the reference
    # scheme, whose hanging-face interpolation is first-order there)
    c = dom.centers
    w = dom.widths
    d = np.minimum(c, 1.0 - c).min(axis=1)
    mask = d > margin * w.max(axis=1)
    fo, fn = dom.face_owner, dom.face_neighbor
    interior = (fo >= 0) & (fn >= 0)
    o, n = fo[interior], fn[interior]
    jump = ~np.isclose(w[o, 0], w[n, 0])
    uniform = np.ones(dom.ncells, dtype=bool)
    uniform[o[jump]] = False
    uniform[n[jump]] = False
    return mask & uniform


def test_face_counts_uniform():
    # single 4x4 block: 2*(3*4) interior faces + 2*2*4 hcube faces
    msh = Mesh(
        origin=np.zeros(2, np.float32), widths=np.ones(2, np.float32),
        block_size=4,
        block_origins=np.zeros((1, 2), np.float32),
        block_widths=np.ones((1, 2), np.float32),
        distance_fields={},
    )
    dom = Domain(msh)
    assert dom.face_dim.size == 24 + 16
    part = dom.partitions[0]
    # every cell has exactly one left/right face per dim in a uniform grid
    for d in range(2):
        assert part.face_owner[d].shape[0] == 12 + 8


def test_green_gauss_exact_linear(adv_domain):
    dom = adv_domain
    part = dom.partitions[0]
    x = jnp.asarray(dom.centers[:, 0])
    gg = np.asarray(ops.green_gauss(part, ops.at_faces(part, x, 0), 0))
    inner = _interior_mask(dom)
    np.testing.assert_allclose(gg[inner], 1.0, atol=2e-3)
    gg_y = np.asarray(ops.green_gauss(part, ops.at_faces(part, x, 1), 1))
    np.testing.assert_allclose(gg_y[inner], 0.0, atol=2e-3)


def test_unsigned_green_gauss_and_distances(adv_domain):
    dom = adv_domain
    part = dom.partitions[0]
    ones_f = jnp.ones(part.face_owner[0].shape[0])
    ugg = np.asarray(ops.unsigned_green_gauss(part, ones_f, 0))
    # uniform region: (1 + 1) / h
    inner = _interior_mask(dom)
    h = dom.widths[:, 0]
    np.testing.assert_allclose(ugg[inner], 2.0 / h[inner], rtol=1e-4)


def test_conservation_telescoping(adv_domain):
    # sum of volume * green_gauss(uf) == net boundary flux; with uf = const,
    # total must vanish (closed box) up to roundoff
    dom = adv_domain
    part = dom.partitions[0]
    uf = jnp.ones(part.face_owner[0].shape[0])
    gg = np.asarray(ops.green_gauss(part, uf, 0))
    vol = np.prod(dom.widths, axis=1)
    total = (gg * vol).sum()
    np.testing.assert_allclose(total, 0.0, atol=1e-4)


def test_face_gradient_linear(adv_domain):
    dom = adv_domain
    part = dom.partitions[0]
    u = jnp.asarray(2.0 * dom.centers[:, 0] + 1.0)
    fg = np.asarray(ops.face_gradient(part, u, 0))
    own = np.asarray(part.face_owner[0])
    nb = np.asarray(part.face_neighbor[0])
    two_sided = own != nb
    np.testing.assert_allclose(fg[two_sided], 2.0, atol=1e-3)


def test_muscl_constant_preservation(adv_domain):
    dom = adv_domain
    part = dom.partitions[0]
    u = jnp.full(dom.ncells, 3.0)
    du = ops.cell_gradient(part, u, 0)
    uL, uR = ops.muscl(part, u, du, 0)
    np.testing.assert_allclose(np.asarray(uL), 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(uR), 3.0, atol=1e-5)


def test_jst_sensor_smooth_vs_shock(adv_domain):
    dom = adv_domain
    part = dom.partitions[0]
    # field with nonvanishing gradient in BOTH dims and no interior extrema:
    # the sensor returns (eps + |GG(du)|) / (eps + UGG(|du|)) per dim, which
    # is 0/0 -> 1 for a constant direction and 1 at extrema (like the
    # reference formula)
    x, y = dom.centers[:, 0], dom.centers[:, 1]
    smooth = jnp.asarray(np.exp(x + 0.5 * y))
    nu_s = np.asarray(ops.jst_sensor(part, smooth))
    inner = _interior_mask(dom)
    assert nu_s[inner].max() < 0.2
    shock = jnp.asarray((dom.centers[:, 0] > 0.5).astype(np.float32))
    nu_k = np.asarray(ops.jst_sensor(part, shock))
    assert nu_k.max() > 0.5


def test_impose_bc_dirichlet(adv_domain):
    dom = adv_domain
    u = jnp.zeros(dom.ncells)
    u = dom.impose_bc("upper", lambda b, ui: jnp.ones_like(ui), u)
    bdry = dom.boundaries["upper"][0]
    ghosts = np.asarray(bdry.ghost)
    un = np.asarray(u)
    assert ghosts.size > 0
    # ghost value = eta * image(0) + (1 - eta) * 1
    eta = np.asarray(bdry.eta)
    np.testing.assert_allclose(un[ghosts], 1.0 - eta, atol=1e-5)
    assert un.sum() > 0


def test_volume_integral(adv_domain):
    dom = adv_domain
    ones = jnp.ones(dom.ncells)
    np.testing.assert_allclose(float(dom.volume_integral(ones)), 1.0, rtol=1e-5)
    X = jnp.asarray(dom.centers)
    cg = np.asarray(dom.volume_integral(X))
    np.testing.assert_allclose(cg, [0.5, 0.5], atol=1e-4)


def test_partition_invariance(adv_mesh):
    # the halo-exchange correctness oracle: residuals must not depend on the
    # partition count (SURVEY.md §4)
    dom1 = Domain(adv_mesh, hypercube_families=[("out", [(0, True)])])
    dom4 = Domain(adv_mesh, n_partitions=4,
                  hypercube_families=[("out", [(0, True)])])

    u0 = np.sin(3.0 * dom1.centers[:, 0]) * np.cos(2.0 * dom1.centers[:, 1])
    u0 = u0.astype(np.float32)

    def residual(part, u):
        D = ops.jst_sensor(part, u)
        r = jnp.zeros_like(u)
        for dim in range(part.nd):
            du = ops.cell_gradient(part, u, dim)
            uL, uR = ops.muscl(part, u, du, dim, D=D, high_order=True)
            flux = (uL + uR) / 2 + (uL - uR) / 2
            r = r - ops.green_gauss(part, flux, dim)
        return u + 0.01 * r

    r1 = np.asarray(dom1.map(residual, jnp.asarray(u0)))
    r4 = np.asarray(dom4.map(residual, jnp.asarray(u0)))
    np.testing.assert_allclose(r1, r4, atol=1e-5)


def test_surface_sampling(adv_domain):
    dom = adv_domain
    surf = dom.surfaces["lower"]
    x = jnp.asarray(dom.centers[:, 0])
    xs = np.asarray(surf(x))
    np.testing.assert_allclose(xs, surf.points[:, 0], atol=0.05)


def test_fluid_ghost_ratio_flag():
    """fluid_ghost_ratio=0 keeps only in-solid wall ghosts (flagged
    deviation from the reference's unsigned straddling band); the farfield
    hypercube band is untouched and a short march stays finite."""
    import jax.numpy as jnp
    from ibx.cases import build_rae2822
    from ibx.geometry.inside import points_inside

    kw = dict(wall_h=4e-2, feature_h=2e-2, block_size=8)
    base = build_rae2822(**kw)
    solid = build_rae2822(fluid_ghost_ratio=0.0, **kw)
    hb_b = base.dom._host_boundaries["wall"]
    hb_s = solid.dom._host_boundaries["wall"]
    stl = base.dom.mesh.distance_fields["wall"].stl
    assert hb_s.ghosts.size < hb_b.ghosts.size
    assert points_inside(stl, solid.dom.centers[hb_s.ghosts]).all()
    # farfield family unchanged
    assert (solid.dom._host_boundaries["farfield"].ghosts
            == base.dom._host_boundaries["farfield"].ghosts).all()
    import numpy as np
    P = solid.march(solid.P0, 200)
    assert np.isfinite(np.asarray(P)).all()


def test_block_face_detection_matches_generic():
    """octree2faces_blocks (structural, per-size-octave adjacency) must
    produce EXACTLY the generic KDTree sweep's face set."""
    from ibx.cases.rae2822 import RAE_DAT
    from ibx.geometry import (DistanceField, build_mesh, feature_regions,
                              load_surface, merge_points)
    from ibx.geometry.octree import get_cells
    from ibx.topology.faces import octree2faces, octree2faces_blocks

    stl = merge_points(load_surface(RAE_DAT))
    features = DistanceField(feature_regions(stl, radius=0.05))
    msh = build_mesh([-25.0, -25.0], [50.0, 50.0], ("wall", stl, 4e-2),
                     refinement_regions=[(features, 2e-2)])
    centers, widths, _ = get_cells(msh)
    origins = centers - widths / 2
    d1, o1, n1 = octree2faces(origins, widths)
    d2, o2, n2 = octree2faces_blocks(msh, origins, widths)

    def key(d, o, n):
        lo, hi = np.minimum(o, n), np.maximum(o, n)
        return set(zip(d.tolist(), lo.tolist(), hi.tolist()))

    assert key(d1, o1, n1) == key(d2, o2, n2)
