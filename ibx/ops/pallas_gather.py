"""Pallas TPU kernels for indexed row movement.

XLA lowers arbitrary-index gathers on this TPU generation to a per-row path
(~30-60 ns/row); for the framework's remaining gather surfaces (boundary
stencils, halo tables) this kernel pipelines row DMAs through
``PrefetchScalarGridSpec``: the index vector is prefetched to SMEM, each grid
step's BlockSpec index_map selects the source row, and Mosaic double-buffers
the copies. Used behind a flag; the generic `jnp.take` path remains the
default (and the reference semantics oracle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas is TPU/infra dependent; degrade gracefully
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _copy_kernel(idx_ref, u_ref, out_ref):
    out_ref[:] = u_ref[:]


def gather_rows(u, idx, *, rows_per_step: int = 8, interpret: bool = False):
    """out[i, :] = u[idx[i], :] as a Pallas kernel.

    u: [N, C]; idx: int32[F] with F a multiple of ``rows_per_step`` (pad the
    index table at compile time). Each grid step moves one source row through
    VMEM; the scalar-prefetched index drives the input BlockSpec.
    """
    if not HAVE_PALLAS:
        return jnp.take(u, idx, axis=0)
    F = idx.shape[0]
    C = u.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i, idx_ref: (idx_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, C), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((F, C), u.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32), u)
