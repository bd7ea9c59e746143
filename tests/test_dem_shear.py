"""Tangential shear history (Yade Law2_ScGeom_FrictPhys_CundallStrack
parity): spring accumulation, Coulomb slip, persistence across rebuilds,
and static friction (no creep) vs the history-less viscous model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops.grid import Grid


def _params(**kw):
    d = dict(kn=1e3, kt_over_kn=0.5, restitution=0.9, friction=0.3,
             rho_p=2500.0)
    d.update(kw)
    return dem.ContactParams(**d)


def _cfg(**kw):
    d = dict(params=_params(), neighbor="cells", cell_capacity=8,
             max_neighbors=8, gravity=(0.0, 0.0, 0.0),
             wall_axes=(False, False, False), shear_history=True,
             cundall_damping=0.2)
    d.update(kw)
    return dem.DEMConfig(**d)


def test_shear_spring_accumulates_and_slips():
    """Two touching particles with steady tangential sliding: the spring
    force grows as kt * integral(v_t dt) until the Coulomb cone, then locks
    at friction * f_n."""
    r = 0.05
    grid = Grid.cube(16, 1.0)
    pos = jnp.asarray([[0.5, 0.5, 0.5], [0.5 + 1.9 * r, 0.5, 0.5]], jnp.float32)
    # pure tangential relative motion (y), constant overlap
    vel = jnp.asarray([[0.0, 1e-3, 0.0], [0.0, -1e-3, 0.0]], jnp.float32)
    ang = jnp.zeros((2, 3), jnp.float32)
    rad = jnp.full((2,), r, jnp.float32)
    act = jnp.ones((2,), bool)
    cfg = _cfg()
    p = cfg.params

    nbr = dem.build_neighbor_list(pos, act, grid, cfg, r)
    xi = jnp.zeros((2, cfg.max_neighbors, 3), jnp.float32)
    dt = 5e-3
    overlap = 2 * r - 1.9 * r
    f_n = p.kn * overlap                      # no normal motion -> spring only
    kt = p.kt_over_kn * p.kn

    step = jax.jit(lambda xi: dem.neighbor_contact_forces(
        nbr, pos, vel, ang, rad, act, grid, cfg, xi, dt))
    f_hist = []
    for _ in range(400):
        f, t, xi = step(xi)
        f_hist.append(float(f[0, 1]))

    # early: spring (one dt of sliding at v_rel=2e-3) + tangential dashpot
    m = 2500.0 * (4.0 / 3.0) * np.pi * r ** 3
    ln_e = np.log(p.restitution)
    beta = -ln_e / np.sqrt(np.pi ** 2 + ln_e ** 2)
    ct = 2.0 * beta * np.sqrt(kt * m / 2.0)
    expect_first = -(kt * 2e-3 * dt + ct * 2e-3)
    np.testing.assert_allclose(f_hist[0], expect_first, rtol=1e-3)
    # late: locked at the Coulomb cone
    np.testing.assert_allclose(abs(f_hist[-1]), p.friction * f_n, rtol=1e-4)
    # monotone growth to the cap
    assert abs(f_hist[5]) > abs(f_hist[0])


def test_shear_history_persists_across_rebuilds():
    """Two dem_substeps calls (list rebuilt at each entry) match one call
    with the same total substeps and an in-call rebuild at the same point."""
    r = 0.05
    grid = Grid.cube(16, 1.0)
    rng = np.random.RandomState(3)
    n = 12
    pos = jnp.asarray(0.3 + 0.4 * rng.rand(n, 3), jnp.float32)
    vel = jnp.asarray(rng.randn(n, 3) * 1e-2, jnp.float32)
    ang = jnp.zeros((n, 3), jnp.float32)
    rad = jnp.full((n,), r, jnp.float32)
    act = jnp.ones((n,), bool)
    cfg = _cfg()
    hydro = dem.DEMForces(jnp.zeros((n, 3)), jnp.zeros((n, 3)))
    dt = 2e-4

    sh = dem.make_shear_state(n, cfg.max_neighbors)
    p1, v1, a1, _, sh1 = dem.dem_substeps(
        pos, vel, ang, rad, act, hydro, grid, cfg, dt, 4, r, shear=sh)
    p1, v1, a1, _, sh1 = dem.dem_substeps(
        p1, v1, a1, rad, act, hydro, grid, cfg, dt, 4, r, shear=sh1)

    cfg8 = _cfg(list_rebuild_every=4)
    p2, v2, a2, _, _ = dem.dem_substeps(
        pos, vel, ang, rad, act, hydro, grid, cfg8, dt, 8, r,
        shear=dem.make_shear_state(n, cfg.max_neighbors))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-8)


def test_rolling_without_slip_on_floor():
    """A ball on the floor pushed below the friction cone rolls. With the
    history spring the contact slip velocity -> ~0 (rolling without
    sliding — static friction at the contact); the viscous model needs a
    persistent slip v = f_t/c_t to transmit the rolling friction force.
    The wall normal is fixed, so the scenario is unconditionally
    well-posed (a pressed pair rotates its contact frame)."""
    r = 0.05
    grid = Grid.cube(16, 1.0)
    kn = 1e5
    act = jnp.ones((1,), bool)
    rad = jnp.full((1,), r, jnp.float32)
    m = 2500.0 * (4.0 / 3.0) * np.pi * r ** 3
    g = 9.81
    dt = 2e-4        # << dt_crit = 0.2*sqrt(m/kn) ~ 7e-4

    def run(shear_history, n_outer=120):
        cfg = _cfg(shear_history=shear_history,
                   params=_params(kn=kn),
                   gravity=(0.0, 0.0, -g),
                   wall_axes=(False, False, True))
        p = cfg.params
        overlap_eq = m * g / kn
        pos = jnp.asarray([[0.5, 0.5, r - overlap_eq]], jnp.float32)
        f_n = m * g
        fx = p.friction * f_n * 0.5                  # inside the cone
        hydro = dem.DEMForces(
            jnp.asarray([[fx, 0.0, 0.0]], jnp.float32),
            jnp.zeros((1, 3), jnp.float32))
        vel, ang = jnp.zeros((1, 3)), jnp.zeros((1, 3))
        sh = dem.make_shear_state(1, cfg.max_neighbors)
        if shear_history:
            step = jax.jit(lambda pos, vel, ang, sh: dem.dem_substeps(
                pos, vel, ang, rad, act, hydro, grid, cfg, dt, 4, r,
                shear=sh))
        else:
            step = jax.jit(lambda pos, vel, ang: dem.dem_substeps(
                pos, vel, ang, rad, act, hydro, grid, cfg, dt, 4, r))
        tail = []
        for it in range(n_outer):
            if shear_history:
                pos, vel, ang, _, sh = step(pos, vel, ang, sh)
            else:
                pos, vel, ang, _ = step(pos, vel, ang)
            if it >= n_outer - 30:
                # contact slip at the floor: (v + omega x (-r zhat))_x
                # = v_x - r*omega_y
                slip_x = float(vel[0, 0]) - r * float(ang[0, 1])
                tail.append(abs(slip_x))
        # the ball must actually be rolling, not parked
        assert abs(float(vel[0, 0])) > 0.05
        return float(np.mean(tail))

    v_hist = run(True)
    v_visc = run(False)
    assert v_hist < 0.25 * v_visc, (v_hist, v_visc)
