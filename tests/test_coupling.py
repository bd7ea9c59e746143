"""Coupling-op unit tests: weights, deposits, drag laws, point force."""

import jax
import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import grid as g

PER = (True, True, True)
WALL = (False, False, False)


def make_particles(pos, radius=0.01, vel=None):
    pos = jnp.asarray(pos, jnp.float32)
    n = pos.shape[0]
    return cp.ParticleFields(
        pos=pos,
        vel=jnp.zeros((n, 3)) if vel is None else jnp.asarray(vel, jnp.float32),
        angvel=jnp.zeros((n, 3)),
        radius=jnp.full((n,), radius, jnp.float32),
        active=jnp.ones((n,), bool),
    )


def test_locate():
    grid = g.Grid.cube(8, 1.0)
    pos = jnp.array([[0.05, 0.05, 0.05], [0.99, 0.5, 0.5], [-0.1, 0.5, 0.5]])
    idx, inside = cp.locate(pos, grid)
    np.testing.assert_array_equal(np.asarray(idx[0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(idx[1]), [7, 4, 4])
    assert bool(inside[0]) and bool(inside[1]) and not bool(inside[2])


def test_gaussian_weights_normalized():
    grid = g.Grid.cube(16, 1.0)
    cfg = cp.CouplingConfig()
    pf = make_particles([[0.5, 0.5, 0.5], [0.31, 0.77, 0.12]])
    sup = cp.gaussian_support(pf.pos, pf.active, grid, PER, cfg)
    s = np.asarray(jnp.sum(sup.weights, axis=1))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)


def test_gaussian_weights_symmetric_at_cell_center():
    """Particle exactly at a cell centre: the 6 face-neighbors get equal
    weight (the symmetry the reference's 12-cap priority queue breaks)."""
    grid = g.Grid.cube(16, 1.0)
    cfg = cp.CouplingConfig()
    pf = make_particles([[0.5 + 1.0 / 32, 0.5 + 1.0 / 32, 0.5 + 1.0 / 32]])
    sup = cp.gaussian_support(pf.pos, pf.active, grid, PER, cfg)
    w = np.asarray(sup.weights[0])
    d2 = []  # weights of the 6 face neighbours must match
    offs = np.asarray(cp._stencil_offsets(3))
    face = np.abs(offs).sum(1) == 1
    np.testing.assert_allclose(w[face], w[face][0], rtol=1e-4)


def test_deposit_gather_consistency():
    """segment_sum deposit conserves the deposited quantity."""
    grid = g.Grid.cube(8, 1.0)
    cfg = cp.CouplingConfig()
    pf = make_particles(np.random.RandomState(0).uniform(0.2, 0.8, (20, 3)))
    sup = cp.gaussian_support(pf.pos, pf.active, grid, PER, cfg)
    vals = sup.weights * 3.0
    f = cp.deposit(vals, sup, grid)
    np.testing.assert_allclose(float(jnp.sum(f)), 60.0, rtol=1e-4)


def test_volume_fraction_clamp():
    """alpha = max(1 - pvol/Vcell, 0.10) — the clamp of FoamYade.C:324."""
    grid = g.Grid.cube(8, 0.08)       # h = 1 cm, Vc = 1e-6 m^3
    cfg = cp.CouplingConfig()
    # a particle with volume >> cell volume forces the clamp
    pf = make_particles([[0.04, 0.04, 0.04]], radius=0.02)
    sup = cp.gaussian_support(pf.pos, pf.active, grid, PER, cfg)
    alpha, up = cp.volume_fraction_fields(pf, sup, grid, cfg)
    assert float(jnp.min(alpha)) >= 0.10 - 1e-6
    assert float(jnp.max(alpha)) <= 1.0 + 1e-6


def test_drag_coefficient_regimes():
    """Hand-checked values of the Wen-Yu / Ergun blend (FoamYade.C:366-379)."""
    nu, rho_f, dia = 1e-6, 1000.0, 1e-4
    # dilute, low Re -> Stokes limit: coeff ~ 0.75*cd*af*ap*rho*|ur|*af^-2.65
    alpha_f, mag_ur = jnp.float32(0.99), jnp.float32(1e-3)
    alpha_p = 1.0 - alpha_f
    Re = float(mag_ur * dia / nu)  # = 0.1
    cd = 24.0 / Re * (1 + 0.15 * Re ** 0.687)
    expect = 0.75 * cd * 0.99 * 0.01 * rho_f * 1e-3 * 0.99 ** (-2.65)
    got = float(cp.drag_coefficient(alpha_f, alpha_p, mag_ur, dia, nu, rho_f))
    np.testing.assert_allclose(got, expect, rtol=1e-3)

    # dense -> Ergun
    alpha_f = jnp.float32(0.5)
    alpha_p = 0.5
    got = float(cp.drag_coefficient(alpha_f, alpha_p, mag_ur, dia, nu, rho_f))
    expect = 150.0 * (0.25 / 0.5) * (nu * rho_f) / dia ** 2 + 1.75 * 0.5 * rho_f * 1e-3 / dia
    np.testing.assert_allclose(got, expect, rtol=1e-3)


def test_stokes_point_force_value():
    """Uniform flow u0 past a still particle: F = 3 pi d mu u0
    (FoamYade.C:437-443) and momentum is conserved into uSource."""
    grid = g.Grid.cube(8, 1.0)
    cfg = cp.CouplingConfig(gaussian=False)
    nu, rho_f = 1e-6, 1000.0
    u0 = 0.01
    U = jnp.zeros((3,) + grid.shape).at[0].set(u0)
    curl = jnp.zeros((3,) + grid.shape)
    pf = make_particles([[0.5, 0.5, 0.5]], radius=5e-4)
    res = cp.point_force_coupling(pf, U, curl, grid, WALL, nu, rho_f, cfg)
    d = 1e-3
    expect = 3 * np.pi * d * nu * rho_f * u0
    np.testing.assert_allclose(float(res.force[0, 0]), expect, rtol=1e-4)
    # reaction: integral of uSource * Vcell * rho_f = -F
    mom = float(jnp.sum(res.u_source[0])) * grid.cell_volume * rho_f
    np.testing.assert_allclose(mom, -expect, rtol=1e-4)


def test_gaussian_coupling_reaction_balance():
    """Gaussian drag: grid reaction ~ -(sum of particle drag forces) when
    uParticle field ~ particle velocity (momentum-conservation identity)."""
    grid = g.Grid.cube(16, 0.16)
    cfg = cp.CouplingConfig(gaussian=True, use_torque=False)
    nu, rho_f = 1e-6, 1000.0
    U = jnp.zeros((3,) + grid.shape).at[0].set(0.01)
    zeros = jnp.zeros((3,) + grid.shape)
    pf = make_particles(
        np.random.RandomState(1).uniform(0.05, 0.11, (10, 3)), radius=2e-3
    )
    res = cp.gaussian_coupling(
        pf, U, zeros, zeros, zeros, zeros, grid, PER, nu, rho_f, 1e-3, cfg
    )
    assert int(jnp.sum(res.found)) == 10
    # drag force on particles is positive-x (fluid pushes particles)
    assert float(jnp.sum(res.force[:, 0])) > 0.0
    # implicit drag field must be non-positive
    assert float(jnp.max(res.u_source_drag)) <= 0.0
    # alpha dips below 1 where particles sit
    assert float(jnp.min(res.alpha)) < 1.0


def test_inactive_particles_ignored():
    grid = g.Grid.cube(8, 1.0)
    cfg = cp.CouplingConfig()
    pf = make_particles([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    pf = pf._replace(active=jnp.array([True, False]))
    sup = cp.gaussian_support(pf.pos, pf.active, grid, PER, cfg)
    assert float(jnp.sum(sup.weights[1])) == 0.0
