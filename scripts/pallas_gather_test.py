"""Feasibility: Pallas TPU kernel for row gathers from a VMEM-resident table.

If Mosaic vectorizes dynamic gathers from VMEM, the sparse-face path can be
orders faster than XLA's per-row gather/scatter.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def march_time(fn, *args, K=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(K):
        out = f(*args)
    jax.block_until_ready(out)
    return round((time.time() - t0) / K * 1000, 3)


def pallas_gather_rows(u, idx):
    """out[i, :] = u[idx[i], :] with u resident in VMEM."""
    F = idx.shape[0]
    C = u.shape[1]

    def kernel(u_ref, idx_ref, out_ref):
        out_ref[:] = u_ref[idx_ref[:], :]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, C), u.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(u, idx)


def main():
    rng = np.random.default_rng(0)
    N = 220288
    for F in (9376, 40000, 221000):
        u = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, F).astype(np.int32))
        try:
            t = march_time(pallas_gather_rows, u, idx)
            ref = np.asarray(jnp.take(u, idx, axis=0))
            got = np.asarray(pallas_gather_rows(u, idx))
            ok = np.allclose(ref, got)
            print(f"pallas_gather F={F}: {t} ms, correct={ok}", flush=True)
        except Exception as e:
            print(f"pallas_gather F={F}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            break
        print(f"xla_gather    F={F}:",
              march_time(lambda u, i: jnp.take(u, i, axis=0), u, idx), "ms",
              flush=True)


if __name__ == "__main__":
    main()
