"""Point-implicit pseudo stepping on the RAE2822 Euler flagship."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibx.cases import build_rae2822
from ibx.ops.block_ops import euler_rhs_block
from ibx.solve.point_implicit_euler import point_implicit_step
from ibx.topology.blocks import build_block_tables


@pytest.mark.slow   # ~8 min measured (round-5 durations)
def test_point_implicit_euler_reduces_residual():
    case = build_rae2822(wall_h=8e-2, feature_h=4e-2, cfl=0.7)
    bt = build_block_tables(case.dom)
    from ibx.geometry.inside import points_inside
    from ibx.geometry import load_surface, merge_points
    from ibx.cases.rae2822 import RAE_DAT

    stl = merge_points(load_surface(RAE_DAT))
    active = jnp.asarray(
        (~points_inside(stl, case.dom.centers)).astype(np.float32))

    # start from a partially-developed state (explicit warmup)
    P = case.march(case.P0, 200)

    def resnorm(P):
        R = euler_rhs_block(bt, case.fluid, case.apply_bcs(P))
        R = R * active[:, None]
        return float(jnp.sqrt((R ** 2).sum()))

    r0 = resnorm(P)
    step = jax.jit(lambda P, k: point_implicit_step(
        bt, case.fluid, P, case.apply_bcs, cfl=5.0, active=active,
        relax=0.8, key=k))
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        P, ratio = step(P, sub)
        assert np.isfinite(np.asarray(P)).all()
        assert float(ratio) < 1.0   # the linear solve made progress
    r1 = resnorm(P)
    assert np.isfinite(r1)
    # implicit steps should not blow the steady residual up
    assert r1 < 3.0 * r0
