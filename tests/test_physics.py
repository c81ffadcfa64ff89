import numpy as np
import jax.numpy as jnp

from ibx.physics import (
    adjust_reynolds,
    apply_flow_bc,
    dynamic_viscosity,
    flow_bc,
    heat_conductivity,
    inviscid_fluxes_dissipative,
    inviscid_fluxes_hll,
    isa_atmosphere,
    jst_sensor_3pt,
    make_fluid,
    pressure_coefficient,
    primitive2state,
    reynolds_number,
    shock_sensor,
    speed_of_sound,
    state2primitive,
    viscous_fluxes,
)
from ibx.physics import ibl, turbulence


def test_fluid_defaults_and_transport():
    f = make_fluid()
    a = float(speed_of_sound(f, jnp.asarray(288.15)))
    np.testing.assert_allclose(a, np.sqrt(1.4 * 283.0 * 288.15), rtol=1e-5)
    # reference quirk: T^(2/3) law -> mu(Tref) = mu_ref exactly
    mu = float(dynamic_viscosity(f, jnp.asarray(273.15)))
    np.testing.assert_allclose(mu, 1.716e-5, rtol=1e-6)
    k = float(heat_conductivity(f, jnp.asarray(300.0)))
    np.testing.assert_allclose(k, 0.00646 + 6.468e-5 * 300.0, rtol=1e-5)


def test_transform_roundtrip():
    f = make_fluid()
    P = jnp.asarray(
        [[1.0e5, 288.15, 100.0, 10.0], [5.0e4, 250.0, -30.0, 5.0]],
        dtype=jnp.float32,
    )
    Q = primitive2state(f, P)
    P2 = state2primitive(f, Q)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P), rtol=1e-4)


def test_hll_consistency():
    # PL == PR and smooth flow -> flux equals the analytic Euler flux
    f = make_fluid()
    P = jnp.asarray([[1.0e5, 288.15, 100.0, 0.0]], dtype=jnp.float32)
    F = np.asarray(inviscid_fluxes_hll(f, P, P, 0))
    rho = 1e5 / (283.0 * 288.15)
    E = rho * (283.0 / 0.4 * 288.15 + 100.0 ** 2 / 2)
    expect = np.array([
        rho * 100.0,
        (E + 1e5) * 100.0,
        rho * 100.0 ** 2 + 1e5,
        0.0,
    ])
    np.testing.assert_allclose(F[0], expect, rtol=1e-3)


def test_dissipative_flux_consistency():
    f = make_fluid()
    P = jnp.asarray([[1.0e5, 288.15, 100.0, 0.0]], dtype=jnp.float32)
    nu = jnp.zeros(1)
    F = np.asarray(inviscid_fluxes_dissipative(f, P, P, nu, nu, 0))
    F_hll = np.asarray(inviscid_fluxes_hll(f, P, P, 0))
    np.testing.assert_allclose(F, F_hll, rtol=1e-3)


def test_flux_normal_matrix_matches_axis():
    f = make_fluid()
    PL = jnp.asarray([[1.0e5, 288.0, 100.0, 10.0]], dtype=jnp.float32)
    PR = jnp.asarray([[0.9e5, 280.0, 90.0, -5.0]], dtype=jnp.float32)
    n = jnp.asarray([[1.0, 0.0]], dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(inviscid_fluxes_hll(f, PL, PR, n)),
        np.asarray(inviscid_fluxes_hll(f, PL, PR, 0)),
        rtol=1e-5,
    )


def test_viscous_fluxes_couette():
    # pure shear du/dy = s: F_x momentum flux through y-faces = mu * s
    f = make_fluid()
    T = 288.15
    P = jnp.asarray([[1.0e5, T, 10.0, 0.0]], dtype=jnp.float32)
    s = 50.0
    zeros = jnp.zeros((1, 4))
    grad_y = jnp.asarray([[0.0, 0.0, s, 0.0]], dtype=jnp.float32)
    F = np.asarray(viscous_fluxes(f, P, (zeros, grad_y), 1))
    mu = float(dynamic_viscosity(f, jnp.asarray(T)))
    np.testing.assert_allclose(F[0, 2], mu * s, rtol=1e-5)
    # energy flux carries tau * u
    np.testing.assert_allclose(F[0, 1], mu * s * 10.0, rtol=1e-5)


def test_flow_bc_switching():
    f = make_fluid()
    # subsonic inflow: u_n < 0 -> p from freestream? reference: un<0, M<=1 ->
    # p = p_inf; T = T (interior); u = interior
    bc = flow_bc(f, [1.0e5, 288.15, 100.0, 0.0])
    P = jnp.asarray([[0.9e5, 280.0, 50.0, 0.0]], dtype=jnp.float32)
    n_in = jnp.asarray([[-1.0, 0.0]], dtype=jnp.float32)   # u_inf . n < 0
    out = np.asarray(apply_flow_bc(bc, P, n_in))
    np.testing.assert_allclose(out[0, 0], 1.0e5)   # p from freestream
    np.testing.assert_allclose(out[0, 1], 280.0)   # T from interior
    np.testing.assert_allclose(out[0, 2], 50.0)    # u from interior
    # subsonic outflow: u_n > 0 -> p interior, T/u freestream
    n_out = jnp.asarray([[1.0, 0.0]], dtype=jnp.float32)
    out = np.asarray(apply_flow_bc(bc, P, n_out))
    np.testing.assert_allclose(out[0, 0], 0.9e5)
    np.testing.assert_allclose(out[0, 1], 288.15)
    np.testing.assert_allclose(out[0, 2], 100.0)


def test_flow_bc_slip_wall():
    f = make_fluid()
    bc = flow_bc(f, [1.0e5, 288.15, 0.0], normal_flow=True)
    P = jnp.asarray([[1.0e5, 288.15, 30.0, 40.0]], dtype=jnp.float32)
    n = jnp.asarray([[0.0, 1.0]], dtype=jnp.float32)
    out = np.asarray(apply_flow_bc(bc, P, n))
    # normal component removed, tangential kept
    np.testing.assert_allclose(out[0, 2:], [30.0, 0.0], atol=1e-4)


def test_isa_atmosphere():
    fluid, P = isa_atmosphere(0.0, Mach=0.5, direction=[1.0, 0.0])
    np.testing.assert_allclose(P[0], 101325.0, rtol=1e-5)
    np.testing.assert_allclose(P[1], 288.15, rtol=1e-5)
    a = np.sqrt(1.4 * 283.0 * 288.15)
    np.testing.assert_allclose(P[2], 0.5 * a, rtol=1e-4)
    np.testing.assert_allclose(P[3], 0.0, atol=1e-6)
    # 11 km tropopause
    _, P11 = isa_atmosphere(11000.0)
    np.testing.assert_allclose(P11[1], 216.65, rtol=1e-4)
    np.testing.assert_allclose(P11[0], 22632.0, rtol=1e-2)


def test_reynolds_adjust():
    f = make_fluid()
    P = jnp.asarray([1.0e5, 288.15, 100.0, 0.0])
    Re = float(reynolds_number(f, P, 1.0))
    f2 = adjust_reynolds(f, P, 1.0, 1e6)
    np.testing.assert_allclose(float(reynolds_number(f2, P, 1.0)), 1e6,
                               rtol=1e-4)
    assert Re != 1e6


def test_sensors():
    # jst 3pt: smooth -> small, kink -> O(1)
    s = float(jst_sensor_3pt(jnp.asarray(1.0), jnp.asarray(1.1),
                             jnp.asarray(1.2)))
    assert s < 0.05
    s = float(jst_sensor_3pt(jnp.asarray(1.0), jnp.asarray(2.0),
                             jnp.asarray(1.0)))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)
    # shock sensor: pure divergence -> 1; pure rotation -> 0
    one = jnp.ones(4)
    zero = jnp.zeros(4)
    div_field = ((one, zero), (zero, one))
    rot_field = ((zero, -one), (one, zero))
    np.testing.assert_allclose(np.asarray(shock_sensor(div_field)), 1.0)
    assert np.asarray(shock_sensor(rot_field)).max() < 1e-5


def test_wall_function_laminar_and_log_limits():
    # very small Rey -> y+ = u+ = sqrt(Rey) (laminar sublayer)
    out = turbulence.wall_function_units(jnp.asarray([1e-2]))
    np.testing.assert_allclose(float(out.y_plus[0]), 0.1, rtol=0.05)
    np.testing.assert_allclose(float(out.u_plus[0]), 0.1, rtol=0.05)
    # large Rey -> log law: u+ = ln(y+)/k + C
    out = turbulence.wall_function_units(jnp.asarray([1e6]))
    up = float(out.u_plus[0])
    yp = float(out.y_plus[0])
    np.testing.assert_allclose(up, np.log(yp) / 0.41 + 4.9, rtol=1e-2)


def test_wall_function_physical():
    ws = turbulence.wall_function(
        jnp.asarray([1e-3]), jnp.asarray([10.0]), jnp.asarray([1.5e-5])
    )
    assert float(ws.u_tau[0]) > 0
    assert float(ws.nu_t[0]) >= 0
    assert np.isfinite(float(ws.du_dn[0]))


def test_turbulence_closures_shapes():
    N = 8
    rng = np.random.default_rng(0)
    g = [[jnp.asarray(rng.normal(size=N).astype(np.float32))
          for _ in range(2)] for _ in range(2)]
    S = turbulence.shear_rate(g)
    assert S.shape == (N,)
    nu = turbulence.smagorinsky_nu_sgs(jnp.full(N, 0.1), S)
    assert float(nu.min()) >= 0
    ke = turbulence.standard_k_epsilon(jnp.full(N, 1.0), jnp.full(N, 10.0), S)
    assert set(ke) == {"nu_k", "nu_eps", "Sk", "Seps", "nu_t"}
    wa = turbulence.wray_agarwal(
        jnp.full(N, 1e-3), S,
        jnp.zeros((N, 2)), jnp.zeros((N, 2)),
    )
    np.testing.assert_allclose(np.asarray(wa["nu_t"]), 1e-3)
    g3 = [[jnp.asarray(rng.normal(size=N).astype(np.float32))
           for _ in range(3)] for _ in range(3)]
    nu3 = turbulence.wale_nu_sgs(jnp.full(N, 0.1), g3)
    assert np.isfinite(np.asarray(nu3)).all()
    d = turbulence.ducros_sensor(g)
    assert (np.asarray(d) >= 0).all() and (np.asarray(d) <= 1).all()


def test_ibl_closures():
    N = 5
    theta = jnp.full(N, 1e-3)
    vel = jnp.concatenate(
        [jnp.full((N, 1), 30.0), jnp.zeros((N, 1))], axis=1
    )
    st = ibl.theta_closure(theta, vel, 1.5e-5)
    assert (np.asarray(st.H) >= 1.0).all() and (np.asarray(st.H) <= 2.38).all()
    assert (np.asarray(st.Cf) > 0).all()
    np.testing.assert_allclose(np.asarray(st.j), np.asarray(theta) * 30.0,
                               rtol=1e-4)
    # m_closure should roughly invert theta_closure's m
    st2 = ibl.m_closure(st.m, vel, 1.5e-5)
    np.testing.assert_allclose(np.asarray(st2.theta), np.asarray(st.theta),
                               rtol=0.2)


def test_pressure_coefficient():
    f = make_fluid()
    cp = float(pressure_coefficient(f, jnp.asarray(1.1e5), 1.0e5, 0.5))
    np.testing.assert_allclose(cp, 2 * 0.1 / (0.25 * 1.4), rtol=1e-5)
