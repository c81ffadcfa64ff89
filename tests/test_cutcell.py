"""Cut-cell wall treatment (flagged; `ibx.geometry.cutcell`).

The watertight-closure property gives an exact discrete steady state for
uniform flow parallel to a FLAT SLANTED wall — the case the reference's
staircase ghost wall cannot represent (its wall normals are axis-aligned,
so a slanted wall deflects a parallel freestream; that spurious deflection
is the seed of the fine-mesh pseudo-boundary-layer, BASELINE.md round 3).
"""

import numpy as np

import jax.numpy as jnp

from ibx.geometry import build_mesh
from ibx.geometry.cutcell import cut_metrics_2d
from ibx.geometry.inside import points_inside
from ibx.geometry.stereolitography import polyline
from ibx.ops.block_ops import euler_rhs_grid, to_blocks
from ibx.physics.bc import apply_flow_bc, flow_bc
from ibx.physics.fluid import make_fluid, physicality_guard
from ibx.topology.blocked_bc import build_blocked_bc
from ibx.topology.blocks import build_block_tables
from ibx.topology.domain import Domain


def _slant_case(theta_deg=25.0):
    """Box [0,1]^2 with a solid wedge below the line through (0.5, 0.2)
    at angle theta; freestream aligned with the wall."""
    th = np.deg2rad(theta_deg)
    t = np.array([np.cos(th), np.sin(th)])
    # closed polygon well beyond the box: the half-plane below the line
    p0 = np.array([0.5, 0.25]) - 5.0 * t
    p1 = np.array([0.5, 0.25]) + 5.0 * t
    n = np.array([-np.sin(th), np.cos(th)])
    poly = np.stack([p0, p1, p1 - 6.0 * n, p0 - 6.0 * n])
    stl = polyline(poly, closed=True)

    msh = build_mesh([0.0, 0.0], [1.0, 1.0], ("wall", stl, 0.05),
                     block_size=8)

    from ibx.geometry.cutcell import fluid_fractions_2d
    from ibx.geometry.octree import get_cells

    centers, widths, _ = get_cells(msh)
    inside = points_inside(stl, centers)
    alpha = fluid_fractions_2d(stl, msh.distance_fields["wall"],
                               centers, widths, inside)
    solved = ~inside | (alpha > 0.05)

    dom = Domain(
        msh,
        hypercube_families=[
            ("farfield", [(0, False), (0, True), (1, False), (1, True)]),
        ],
        fluid_ghost_ratio=0.0,
        reflect_solid_images=True,
        solve_inside_cells=inside & (alpha > 0.05),
    )
    cm = cut_metrics_2d(stl, msh.distance_fields["wall"], dom.centers,
                        dom.widths, solved, dom.face_dim, dom.face_owner,
                        dom.face_neighbor, alpha=alpha)
    return stl, dom, solved, cm, t


def test_cut_metrics_consistency():
    stl, dom, solved, cm, _ = _slant_case()
    assert cm["n_cut_faces"] > 0
    assert cm["wall_cells"].size > 0
    a = cm["alpha"]
    assert (a > 0).all() and (a <= 1.0).all()
    # wall vectors point into the solid (negative dot with the outward
    # fluid normal of the wedge); box-corner cells where the wall meets
    # the outer boundary may deviate, so test the interior wall cells
    wvec = cm["wall_coef"]
    th = np.deg2rad(25.0)
    n_fluid = np.array([-np.sin(th), np.cos(th)])  # out of the solid
    proj = wvec @ n_fluid
    wmag = np.sqrt((wvec ** 2).sum(1))
    c = dom.centers[cm["wall_cells"]]
    interior = (c[:, 0] > 0.1) & (c[:, 0] < 0.9)
    assert (proj[interior] <= 1e-5 * wmag[interior]).all()
    # every cut face touches at least one solved cell
    for d in range(2):
        assert (solved[cm["owner"][d]] | solved[cm["neighbor"][d]]).all()


def test_slanted_wall_parallel_freestream_is_steady():
    stl, dom, solved, cm, t = _slant_case()
    fluid = make_fluid()
    T_inf, p_inf = 288.15, 101325.0
    a = float(np.sqrt(1.4 * 283.0 * T_inf))
    V = 0.4 * a
    P_inf = np.array([p_inf, T_inf, V * t[0], V * t[1]], np.float32)

    bt = build_block_tables(dom)
    bbc = build_blocked_bc(dom, ["farfield", "wall"])
    far = flow_bc(fluid, P_inf)
    wall = flow_bc(fluid, [p_inf, T_inf, 0.0], normal_flow=True)
    fns = {
        "farfield": lambda Pi, nrm: apply_flow_bc(far, Pi, nrm),
        "wall": lambda Pi, nrm: apply_flow_bc(wall, Pi, nrm),
    }

    P0 = np.tile(P_inf, (dom.ncells, 1)).astype(np.float32)
    P3 = to_blocks(bt, jnp.asarray(P0))
    P3 = bbc(P3, fns, guard=physicality_guard, mirror=("wall",))

    cut3 = dict(
        owner=tuple(jnp.asarray(o) for o in cm["owner"]),
        neighbor=tuple(jnp.asarray(n) for n in cm["neighbor"]),
        wr=tuple(jnp.asarray(w) for w in cm["wr"]),
        wl=tuple(jnp.asarray(w) for w in cm["wl"]),
        wall_cells=jnp.asarray(cm["wall_cells"]),
        wall_coef=jnp.asarray(cm["wall_coef"]),
        xw_rel=jnp.asarray(cm["xw_rel"]),
        inv_alpha3=to_blocks(bt, jnp.asarray(cm["inv_alpha"])[:, None]),
        alpha3=to_blocks(bt, jnp.asarray(cm["alpha"])[:, None])[..., 0],
    )

    solved3 = to_blocks(
        bt, jnp.asarray(solved.astype(np.float32))[:, None])[..., 0]

    R_cut = euler_rhs_grid(bt, fluid, P3, cut3=cut3) * solved3[..., None]

    # exact discrete cancellation: for u . wall_vec = 0 and uniform p,
    # sum_faces (1-a) A F_n + wall term = p (wall_vec - wall_vec) = 0,
    # which exercises every sign/weight/closure in the cut machinery.
    # (The reference staircase scheme is ALSO steady at a uniform state —
    # its failure needs curvature; that is the RAE2822 resolution study.)
    rho = p_inf / (283.0 * T_inf)
    scale = rho * V * V / 0.05
    r_cut = float(jnp.abs(R_cut[..., 2:4]).max()) / scale
    assert r_cut < 2e-3, r_cut

    # and the residual must stay small under a short march (cut tables,
    # dt scale and BCs compose without drift at the exact steady state)
    from ibx.ops.block_ops import rk2_step_grid

    def bcs3(Pg):
        return bbc(Pg, fns, guard=physicality_guard, mirror=("wall",))

    Pm = P3
    for _ in range(5):
        Pm, _res = rk2_step_grid(bt, fluid, Pm, bcs3, cfl=0.7,
                                 active3=solved3, cut3=cut3)
    drift = np.asarray(jnp.abs((Pm - P3))[..., 2:4].max()) / V
    assert drift < 5e-3, drift
