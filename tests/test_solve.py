import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.geometry import build_mesh, polyline
from ibx.ops import operators as ops
from ibx.solve import (
    coarsener_and_prolongator,
    fas,
    hutchinson_block_diagonal,
    linearize,
    multigrid,
    multigrid_levels,
    solve,
)
from ibx.topology import Domain


def test_mgrid_transfer_partition_of_unity():
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(256, 2)).astype(np.float32)
    c, p = coarsener_and_prolongator(X, 1)
    const = jnp.ones(256)
    cc = np.asarray(c(const))
    np.testing.assert_allclose(cc, 1.0, atol=1e-6)
    back = np.asarray(p(c(const)))
    np.testing.assert_allclose(back, 1.0, atol=1e-6)
    mg = multigrid_levels(X, 2)
    assert len(mg.coarseners) == 2


def test_hutchinson_diagonal_vector():
    # diagonal map: f(x) = d * x  -> estimated diagonal == d exactly
    d = jnp.asarray(np.linspace(1.0, 3.0, 32, dtype=np.float32))
    f = lambda x: d * x
    est = hutchinson_block_diagonal(f, jnp.ones(32), 8)
    np.testing.assert_allclose(np.asarray(est), np.asarray(d), rtol=1e-5)


def test_hutchinson_block_diagonal_matrix():
    # per-row 2x2 blocks: f(X)[n] = B[n] @ X[n]
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.normal(size=(16, 2, 2)).astype(np.float32))
    f = lambda X: jnp.einsum("nji,ni->nj", B, X)
    D = hutchinson_block_diagonal(f, jnp.ones((16, 2)), 16)
    np.testing.assert_allclose(np.asarray(D), np.asarray(B), atol=1e-4)


def test_point_implicit_solves_block_system():
    rng = np.random.default_rng(2)
    # well-conditioned block-diagonal-dominant system
    N, m = 64, 3
    B = rng.normal(size=(N, m, m)).astype(np.float32) * 0.1
    B += np.eye(m, dtype=np.float32) * 2.0
    Bj = jnp.asarray(B)
    x_true = jnp.asarray(rng.normal(size=(N, m)).astype(np.float32))

    def f(X):
        # block op + weak coupling between consecutive rows
        y = jnp.einsum("nji,ni->nj", Bj, X)
        y = y + 0.1 * jnp.roll(X, 1, axis=0)
        return y - b

    b = jnp.zeros((N, m))
    b = jnp.einsum("nji,ni->nj", Bj, x_true) + 0.1 * jnp.roll(x_true, 1, axis=0)

    A, rhs, prec = linearize(f, jnp.zeros((N, m)), n_hutchinson_samples=30)
    x, ratio = solve(A, rhs, prec, n_iter=200, rtol=1e-5)
    assert float(ratio) < 1e-4
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-2)


@pytest.fixture(scope="module")
def diff_setup():
    lower = polyline(np.array([[0.0, 0.0], [1.0, 0.0]]), closed=False)
    msh = build_mesh(
        [0.0, 0.0], [1.0, 1.0],
        ("lower", lower, 5e-2),
        block_size=8,
    )
    dom = Domain(msh, hypercube_families=[("outer", [
        (0, False), (0, True), (1, True)])])
    return msh, dom


def test_domain_multigrid_hierarchy(diff_setup):
    msh, dom = diff_setup
    hier = multigrid(dom)
    assert len(hier.coarse_domains) == 3  # block 8 -> 4 -> 2 -> 1
    assert hier.coarse_domains[0].ncells == dom.ncells // 4
    # coarsener/prolongator approximately preserve constants
    const = jnp.ones(dom.ncells)
    c0 = np.asarray(hier.coarseners[0](const))
    np.testing.assert_allclose(c0, 1.0, atol=1e-3)
    back = np.asarray(hier.prolongators[0](hier.coarseners[0](const)))
    np.testing.assert_allclose(back, 1.0, atol=1e-3)


def test_fas_accelerates_diffusion(diff_setup):
    """FAS on the pseudo-time diffusion problem must reduce the residual at
    least as fast per fine-grid work unit as plain smoothing."""
    msh, dom = diff_setup
    hier = multigrid(dom)
    doms = [dom] + list(hier.coarse_domains)

    def apply_bcs(lvl, u):
        d = doms[lvl]
        u = d.impose_bc("lower", lambda b, i: jnp.ones_like(i), u)
        u = d.impose_bc("outer", lambda b, i: jnp.zeros_like(i), u)
        return u

    def f(lvl, u):
        d = doms[lvl]
        part = d.partitions[0]
        u = apply_bcs(lvl, u)
        r = jnp.zeros_like(u)
        bound = jnp.zeros_like(u)
        for dim in range(2):
            r = r + ops.green_gauss(part, ops.face_gradient(part, u, dim), dim)
            bound = bound + ops.unsigned_green_gauss(
                part, 1.0 / ops.face_distance(part, dim), dim
            )
        omega = 0.5 / bound
        return r * omega, jnp.ones_like(u)  # pre-relaxed residual, omega=1

    u0 = jnp.zeros(dom.ncells)

    u_fas, ratio_fas = fas(
        f, u0,
        coarseners=hier.coarseners, prolongators=hier.prolongators,
        n_iter=20, rtol=1e-3,
    )
    assert float(ratio_fas) < 1.0
    # smoothing-only baseline with the same fine-level iteration count
    u_sm, ratio_sm = fas(f, u0, n_iter=20, rtol=1e-3)
    r_fas, _ = f(0, u_fas)
    r_sm, _ = f(0, u_sm)
    n_fas = float(jnp.abs(r_fas).max())
    n_sm = float(jnp.abs(r_sm).max())
    assert n_fas <= n_sm * 1.5  # multigrid must not be worse
    assert np.isfinite(np.asarray(u_fas)).all()
