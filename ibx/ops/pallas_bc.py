"""Pallas TPU kernel: ghost-BC write-back on the block-grid state.

Replaces the XLA phase-view placement + blend + block-row scatter of
`ibx.topology.blocked_bc` (three HBM passes over padded tile tables,
~0.6 ms per BC application at 24k ghosts) with ONE kernel:

  grid = one program per ghost block;
  the program DMAs its block tile in (the state buffer is aliased
  in-place), accumulates the blended ghost values from run windows of the
  (VMEM-resident) value array with dynamic-start static-size slices, and
  writes the merged tile back. Blocks without ghosts are never touched.

Run decomposition: sorted ghosts split into runs of consecutive cell ids =
consecutive value rows AND consecutive block slots, so each run is one
`g_pad[start : start + npb]` window plus an interval mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bc_write_kernel(npb, bs, nd, C, R,
                     gb_ref, gs_ref, s0_ref, ln_ref,
                     p_ref, g_ref, m_ref, o_ref):
    i = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (npb, 1), 0)

    def body(r, acc):
        st = gs_ref[i, r]
        s0 = s0_ref[i, r]
        ln = ln_ref[i, r]
        win = g_ref[pl.ds(st, npb), :]
        msk = ((iota >= s0) & (iota < s0 + ln)).astype(win.dtype)
        return acc + win * msk

    acc = jax.lax.fori_loop(0, R, body, jnp.zeros((npb, C), jnp.float32))
    tile = p_ref[0].reshape(npb, C)
    m = m_ref[0]
    o_ref[0] = (m * acc + (1.0 - m) * tile).reshape(p_ref.shape[1:])


def bc_write(P3, g_pad, gblocks, gstart, s0, rlen, gmask_flat, *,
             interpret: bool = False):
    """In-place ghost write-back.

    P3: [B, bs.., C] state (donated/aliased). g_pad: [Gpad, C] blended
    ghost values with front/back zero padding. gblocks: int32[GB];
    gstart/s0/rlen: int32[GB, R] run tables (window start into g_pad,
    first slot, length; length 0 on padding). gmask_flat: f32[GB, npb, 1].
    """
    B = P3.shape[0]
    C = P3.shape[-1]
    nd = P3.ndim - 2
    bs = P3.shape[1]
    npb = bs ** nd
    GB, R = gstart.shape
    if GB == 0:
        return P3
    assert g_pad.shape[0] * C * g_pad.dtype.itemsize <= 8 * 2 ** 20, (
        "g_pad would not fit VMEM-resident; chunk the ghost set"
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(GB,),
        in_specs=[
            pl.BlockSpec(
                (1,) + P3.shape[1:],
                lambda i, gb, gs, s0, ln: (gb[i],) + (0,) * (nd + 1),
            ),
            # g_pad is VMEM-resident for the whole grid: Gpad * C * 4 bytes
            # must fit well under the ~16 MB scoped-VMEM budget (checked
            # below; ~1M ghost rows at C=4 before this is a concern)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npb, 1), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1,) + P3.shape[1:],
            lambda i, gb, gs, s0, ln: (gb[i],) + (0,) * (nd + 1),
        ),
    )
    kernel = functools.partial(_bc_write_kernel, npb, bs, nd, C, R)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(P3.shape, P3.dtype),
        input_output_aliases={4: 0},    # P3 (after 4 scalar-prefetch args)
        interpret=interpret,
    )(gblocks, gstart, s0, rlen, P3, g_pad, gmask_flat)
