import numpy as np
import jax.numpy as jnp

from ibx.ops import (
    apply_stencil,
    reindex_stencil,
    stencil_domain,
    stencil_from_lists,
)
from ibx.topology.interp import interpolator


def test_accumulator_example():
    # mirrors the docstring example of the reference Accumulator
    # (src/accumulator.jl:23-34)
    acc = stencil_from_lists(
        [[0, 1], [1, 2, 3]], [[-1.0, 2.0], [3.0, 4.0, 5.0]]
    )
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    out = np.asarray(acc(v))
    np.testing.assert_allclose(out, [3.0, 38.0])


def test_variable_length_and_empty():
    acc = stencil_from_lists([[2], [], [0, 1, 2, 3]],
                             [[2.0], [], [1.0, 1.0, 1.0, 1.0]])
    v = jnp.arange(4.0)
    out = np.asarray(acc(v))
    np.testing.assert_allclose(out, [4.0, 0.0, 6.0])


def test_multicomponent_and_delta():
    acc = stencil_from_lists([[1], [0]], [[1.0], [1.0]])
    v = jnp.asarray([[1.0, 10.0], [3.0, 30.0]])
    out = np.asarray(acc(v))
    np.testing.assert_allclose(out, [[3.0, 30.0], [1.0, 10.0]])
    # delta: subtract own row
    out = np.asarray(acc(v, delta=True))
    np.testing.assert_allclose(out, [[2.0, 20.0], [-2.0, -20.0]])


def test_max_op_ignores_padding():
    acc = stencil_from_lists([[0, 1], [2]], [[1.0, 1.0], [1.0]])
    v = jnp.asarray([5.0, -3.0, 7.0])
    out = np.asarray(apply_stencil(acc, v, op="max"))
    np.testing.assert_allclose(out, [5.0, 7.0])


def test_reindex_and_domain():
    acc = stencil_from_lists([[4, 7], [7, 9]], [[0.5, 0.5], [0.25, 0.75]])
    dom, inv = stencil_domain(acc)
    np.testing.assert_array_equal(dom, [4, 7, 9])
    local = reindex_stencil(acc, inv)
    v = np.zeros(10, np.float32)
    v[[4, 7, 9]] = [1.0, 2.0, 3.0]
    full = np.asarray(acc(jnp.asarray(v)))
    loc = np.asarray(local(jnp.asarray(v[dom])))
    np.testing.assert_allclose(full, loc)


def test_linear_interpolation_exactness_2d():
    # linear_weights must reproduce affine fields exactly
    # (the property of src/nninterp.jl:16-42)
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(500, 2)).astype(np.float32)
    Xq = rng.uniform(0.2, 0.8, size=(50, 2)).astype(np.float32)
    st = interpolator(X, Xq, linear=True)
    f = lambda P: 2.0 + 3.0 * P[:, 0] - 1.5 * P[:, 1]
    out = np.asarray(st(jnp.asarray(f(X))))
    np.testing.assert_allclose(out, f(Xq), rtol=0, atol=5e-4)


def test_linear_interpolation_exactness_3d():
    rng = np.random.default_rng(1)
    X = rng.uniform(size=(800, 3)).astype(np.float32)
    Xq = rng.uniform(0.3, 0.7, size=(20, 3)).astype(np.float32)
    st = interpolator(X, Xq, linear=True)
    f = lambda P: -1.0 + P[:, 0] + 2.0 * P[:, 1] - 0.5 * P[:, 2]
    out = np.asarray(st(jnp.asarray(f(X))))
    np.testing.assert_allclose(out, f(Xq), rtol=0, atol=5e-4)


def test_idw_weights_partition_of_unity():
    rng = np.random.default_rng(2)
    X = rng.uniform(size=(100, 2)).astype(np.float32)
    Xq = rng.uniform(size=(10, 2)).astype(np.float32)
    st = interpolator(X, Xq, linear=False)
    const = np.asarray(st(jnp.ones(100)))
    np.testing.assert_allclose(const, np.ones(10), atol=1e-3)
