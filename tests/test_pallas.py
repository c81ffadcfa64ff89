import numpy as np
import jax.numpy as jnp

from ibx.ops.pallas_gather import gather_rows


def test_pallas_gather_interpret():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 256, 64).astype(np.int32))
    out = np.asarray(gather_rows(u, idx, interpret=True))
    np.testing.assert_array_equal(out, np.asarray(u)[np.asarray(idx)])
