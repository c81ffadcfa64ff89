"""Integral boundary-layer closures (device side).

Counterpart of reference ``src/ibl.jl`` (White's-method correlations and
theta-/m-based closures for the ``mdot = -div(u j) + tau`` coupling). The
reference never includes this module in its main package — it is advertised
capability; here it is a first-class citizen.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

_EPS32 = float(np.finfo(np.float32).eps)


def white_H(Lam, Re_theta):
    """Shape-parameter correlation (reference ``src/ibl.jl:12-23``)."""
    rth = jnp.clip(Re_theta, 1e2, 1e6)
    lam = jnp.clip(Lam, -4.52859e-3, 4.5e-3)
    L = jnp.log10(rth)
    H = (
        -4.072 * jnp.log(lam + 4.5286e-3)
        / (-0.1331 * L ** 2 + 1.3061 * L + 6.0)
        - 1.085
    )
    return jnp.clip(H, 1.0, 2.38)


def white_Cf(Lam, Re_theta):
    """Skin-friction correlation (reference ``src/ibl.jl:25-36``)."""
    rth = jnp.clip(Re_theta, 1e2, 1e6)
    L = jnp.log10(rth)
    H = white_H(Lam, Re_theta)
    return 0.3 * jnp.exp(-1.33 * H) / (L ** (1.74 + 0.31 * H))


class IBLState(NamedTuple):
    theta: jnp.ndarray
    Cf: jnp.ndarray
    H: jnp.ndarray
    delta_star: jnp.ndarray
    V: jnp.ndarray
    dV_ds: jnp.ndarray
    rho: jnp.ndarray
    m: jnp.ndarray
    j: jnp.ndarray
    tau: jnp.ndarray


def _edge_quantities(velocity, pressure_gradient, rho):
    u = velocity
    V = jnp.sqrt((u ** 2).sum(axis=1)) + _EPS32
    if jnp.ndim(pressure_gradient) == 0:
        px = jnp.zeros_like(V)
    else:
        px = (u * pressure_gradient / V[:, None]).sum(axis=1)
    dV_ds = px / (V * rho)
    return V, dV_ds


def theta_closure(theta, velocity, nu, *, pressure_gradient=0.0, rho=1.0):
    """BL parameters from momentum thickness (reference ``src/ibl.jl:62-97``)."""
    rho = jnp.broadcast_to(jnp.asarray(rho, jnp.float32), theta.shape)
    V, dV_ds = _edge_quantities(velocity, pressure_gradient, rho)
    Lam = dV_ds * theta / V
    Re_theta = theta * V / nu
    Cf = white_Cf(Lam, Re_theta)
    H = white_H(Lam, Re_theta)
    delta_star = H * theta
    return IBLState(
        theta=theta, Cf=Cf, H=H, delta_star=delta_star, V=V, dV_ds=dV_ds,
        rho=rho, m=delta_star * V * rho, j=theta * V * rho,
        tau=Cf * V ** 2 * rho / 2,
    )


def m_closure(m, velocity, nu, *, pressure_gradient=0.0, rho=1.0,
              n_iter: int = 20, omega: float = 0.8):
    """BL parameters from the mass defect, fixed-point in H
    (reference ``src/ibl.jl:123-175``)."""
    rho = jnp.broadcast_to(jnp.asarray(rho, jnp.float32), m.shape)
    V, dV_ds = _edge_quantities(velocity, pressure_gradient, rho)
    Lam_mult = dV_ds / V ** 2 * rho
    Re_mult = 1.0 / nu / rho

    H0 = jnp.full_like(m, 1.5)
    Lam = Lam_mult * m / H0
    Re_theta = Re_mult * m / H0
    Cf0 = white_Cf(Lam, Re_theta)
    H1 = white_H(Lam, Re_theta)

    def body(_, carry):
        Cf, H = carry
        Lam = Lam_mult * m / H
        Re_theta = Re_mult * m / H
        Cf = white_Cf(Lam, Re_theta) * omega + Cf * (1.0 - omega)
        H = white_H(Lam, Re_theta) * omega + H * (1.0 - omega)
        return Cf, H

    Cf, H = jax.lax.fori_loop(0, n_iter, body, (Cf0, H1))
    delta_star = m / rho / V
    theta = delta_star / H
    return IBLState(
        theta=theta, Cf=Cf, H=H, delta_star=delta_star, V=V, dV_ds=dV_ds,
        rho=rho, m=m, j=theta * V * rho, tau=Cf * V ** 2 * rho / 2,
    )
