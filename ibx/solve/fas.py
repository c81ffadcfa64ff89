"""Full Approximation Scheme multigrid driver (device side).

Counterpart of reference ``src/solver.jl:39-91``: recursive FAS over a user
function ``f(level, Q) -> (r, omega)`` (residual and relaxation factor), with
tau-corrected coarse-grid recursion and relaxed fixed-point smoothing. The
smoothing loop runs under ``lax.while_loop`` so a whole FAS cycle jits into a
single XLA executable.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _l2(r):
    return jnp.sqrt((r.astype(jnp.float32) ** 2).sum())


def fas(
    f: Callable,
    Q,
    *,
    coarseners: Sequence = (),
    prolongators: Sequence = (),
    prescribed_f=None,
    multigrid_level: int = 0,
    n_iter: int = 50,
    rtol: float = 0.1,
    atol: float = 1e-7,
):
    """One FAS cycle. Returns (Q, residual_reduction_ratio).

    Semantics follow the reference exactly, including its convention that the
    last coarsener in the list is never recursed into
    (``src/solver.jl:60-77``: recursion only while more than one remains).
    """
    level = multigrid_level
    fQ, omega = f(level, Q)

    if prescribed_f is not None:
        source = prescribed_f - fQ
    else:
        source = jnp.zeros_like(fQ)

    r = fQ + source
    nr0 = _l2(r)

    if len(coarseners) > 1:
        coarsen = coarseners[0]
        prolong = prolongators[0]
        Qc = coarsen(Q)
        Qc_old = Qc
        pfQc = coarsen(r)
        Qc, _ = fas(
            f, Qc,
            coarseners=coarseners[1:], prolongators=prolongators[1:],
            prescribed_f=pfQc, multigrid_level=level + 1,
            n_iter=n_iter, rtol=rtol, atol=atol,
        )
        Q = Q + prolong(Qc - Qc_old)

    def cond(carry):
        it, Q, nr = carry
        return (it < n_iter) & (nr >= nr0 * rtol + atol)

    def body(carry):
        it, Q, _ = carry
        r, omega = f(level, Q)
        r = r + source
        Q = Q + jnp.clip(omega, 0.0, 1.0) * r
        return it + 1, Q, _l2(r)

    _, Q, nr = jax.lax.while_loop(cond, body, (0, Q, jnp.float32(jnp.inf)))
    return Q, nr / (nr0 + jnp.finfo(jnp.float32).eps)
