"""Layout microbenchmark: achieved HBM bandwidth by physical array shape.

TPU v5e tiles f32 arrays as (8 sublanes, 128 lanes) on the two minormost
dims; a minor dim of 4 or 16 pads to 128 lanes and wastes bandwidth on
every materialization. This measures elementwise-copy throughput (read +
write) for the candidate state layouts of the block fast path.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

K = 200


def bw(shape, note=""):
    x = jnp.asarray(np.random.rand(*shape).astype(np.float32))

    @jax.jit
    def m(x):
        def body(i, x):
            return jnp.abs(x) * 1.000001 - 1e-9
        return jax.lax.fori_loop(0, K, body, x)

    out = m(x)
    jax.block_until_ready(out)
    t0 = time.time()
    out = m(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / K
    nbytes = x.size * 4
    gbps = 2 * nbytes / dt / 1e9  # read + write
    print(f"{str(shape):28s} {note:22s} {gbps:8.1f} GB/s  ({dt*1e3:.3f} ms)")
    return gbps


def bw_roll(shape, axis, note=""):
    x = jnp.asarray(np.random.rand(*shape).astype(np.float32))

    @jax.jit
    def m(x):
        def body(i, x):
            return jnp.abs(jnp.roll(x, 1, axis=axis)) * 1.000001
        return jax.lax.fori_loop(0, K, body, x)

    out = m(x)
    jax.block_until_ready(out)
    t0 = time.time()
    out = m(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / K
    nbytes = x.size * 4
    gbps = 2 * nbytes / dt / 1e9
    print(f"{str(shape):28s} roll ax{axis} {note:14s} {gbps:8.1f} GB/s  ({dt*1e3:.3f} ms)")
    return gbps


def main():
    print(f"platform: {jax.devices()[0].platform}")
    B, bs, C = 3441, 16, 4
    N = B * bs * bs
    # candidate layouts, all ~3.5M cells x 4 comps
    bw((B, bs, bs, C), "current block grid")
    bw((B, bs, bs, C + 1), "5-channel grid")
    bw((B, bs, bs, 2 * C + 1), "9-channel grid")
    bw((B, bs * bs, C), "[B,256,C]")
    bw((B, C, bs * bs), "[B,C,256]")
    bw((C, B, bs * bs), "[C,B,256] planes")
    bw((N, C), "flat [N,C]")
    bw((C, N), "flat [C,N]")
    bw((N * C,), "flat 1-D")
    bw((B, bs, bs * C), "[B,16,64] folded")
    bw((B * bs, bs * C), "[B*16,64] folded")
    # face-array shapes (bs+1 on one axis)
    bw((B, bs, bs + 1, C), "face grid (pass B)")
    bw((B, bs, bs + 1, 2 * C + 1), "face grid 9ch")
    # lane rolls for the pallas-style formulation
    bw_roll((C, B, bs * bs), 2, "[C,B,256]")
    bw_roll((B, bs, bs, C), 2, "block grid x-shift")


if __name__ == "__main__":
    main()
