"""Dynamic DEM sub-step count (DEMConfig.dynamic_substeps) — true
exchangeDT parity: the reference negotiates dt per step and Yade runs
ceil(dt_fluid/dt_DEM) substeps of its own stable dt
(/root/reference/FoamYade/FoamYade.C:537-553). Here the substep count
adapts in-graph (static-max scan, masked zero-dt tail) so stiff contacts
no longer throttle the FLUID dt the way `enforce_critical_dt` does."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.fields import (
    make_fluid_state,
    make_particle_state,
    make_turbulence_state,
)
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
from yade_openfoam_coupling_tpu.models.piso import FluidBCs
from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops.grid import Grid
from yade_openfoam_coupling_tpu.utils.diagnostics import TimeControls


def _rand_state(n=24, seed=0, box=1.0):
    rng = np.random.RandomState(seed)
    pos = jnp.asarray(rng.uniform(0.2 * box, 0.8 * box, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.05, (n, 3)), jnp.float32)
    ang = jnp.asarray(rng.normal(0, 0.05, (n, 3)), jnp.float32)
    return pos, vel, ang


def test_masked_tail_is_noop():
    """dt_seq = [h,h,h,0,0] over a 5-substep scan == 3 substeps of h:
    a zero-dt velocity-Verlet substep leaves the state bit-identical."""
    grid = Grid.cube(16, 1.0)
    r = 0.03
    pos, vel, ang = _rand_state()
    rad = jnp.full((pos.shape[0],), r, jnp.float32)
    act = jnp.ones((pos.shape[0],), bool)
    cfg = dem.DEMConfig(params=dem.ContactParams(kn=1e3, rho_p=2500.0),
                        neighbor="allpairs")
    hydro = dem.DEMForces(jnp.zeros_like(pos), jnp.zeros_like(pos))
    h = jnp.float32(1e-4)

    p3, v3, a3, _ = dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid,
                                     cfg, h, 3, r)
    seq = jnp.array([1e-4, 1e-4, 1e-4, 0.0, 0.0], jnp.float32)
    p5, v5, a5, _ = dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid,
                                     cfg, h, 5, r, dt_seq=seq)
    np.testing.assert_array_equal(np.asarray(p3), np.asarray(p5))
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(v5))
    np.testing.assert_array_equal(np.asarray(a3), np.asarray(a5))


def test_masked_tail_is_noop_carry_contact():
    """Same masked-tail equality through the carry_contact branch (the
    carried force of a zero-dt tail evaluation equals the live one — the
    state it was evaluated at is unchanged)."""
    grid = Grid.cube(16, 1.0)
    r = 0.03
    pos, vel, ang = _rand_state(seed=3)
    rad = jnp.full((pos.shape[0],), r, jnp.float32)
    act = jnp.ones((pos.shape[0],), bool)
    cfg = dem.DEMConfig(params=dem.ContactParams(kn=1e3, rho_p=2500.0),
                        neighbor="cells", cell_capacity=32, max_neighbors=16,
                        carry_contact=True)
    nbr = dem.build_neighbor_list(pos, act, grid, cfg, r)
    hydro = dem.DEMForces(jnp.zeros_like(pos), jnp.zeros_like(pos))
    h = jnp.float32(1e-4)

    p3, v3, a3, _, fc3, tc3 = dem.dem_substeps(
        pos, vel, ang, rad, act, hydro, grid, cfg, h, 3, r, nbr=nbr)
    seq = jnp.array([1e-4, 1e-4, 1e-4, 0.0], jnp.float32)
    p4, v4, a4, _, fc4, tc4 = dem.dem_substeps(
        pos, vel, ang, rad, act, hydro, grid, cfg, h, 4, r, nbr=nbr,
        dt_seq=seq)
    np.testing.assert_array_equal(np.asarray(p3), np.asarray(p4))
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(v4))
    # the carried forces compile through a different scan (xs vs closure
    # dt) — allow FP-reassociation noise, nothing more
    np.testing.assert_allclose(np.asarray(fc3), np.asarray(fc4),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(tc3), np.asarray(tc4),
                               rtol=1e-6, atol=1e-8)


def _case(grid, r, params, n_sub, dynamic, enforce=False, adaptive=False):
    return cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   exchange="planes", slot_capacity=8),
        dem=dem.DEMConfig(params=params, neighbor="allpairs",
                          periodic=(True, True, False),
                          wall_axes=(False, False, True),
                          dynamic_substeps=dynamic,
                          enforce_critical_dt=enforce),
        pimple=PIMPLEConfig(n_outer=1, n_correctors=1),
        time=TimeControls(adjust_time_step=adaptive, max_co=0.5, max_dt=1.0),
        n_dem_substeps=n_sub, r_max=r,
    )


def _init(cfg, grid, r, dt, n=16, seed=1):
    L = grid.lengths[0]
    rng = np.random.RandomState(seed)
    pos0 = rng.uniform(0.3 * L, 0.7 * L, (n, 3))
    return cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=pos0, radius=r),
        make_turbulence_state(grid, k0=1e-6),
        cfg, dt=dt)


def test_dynamic_matches_static_substep_run():
    """Fixed fluid dt: a dynamic run (max 8) resolves n_eff =
    ceil(dt/dt_crit) and its trajectory equals a static run with exactly
    n_dem_substeps = n_eff — the VERDICT r3 item-5 'matching a
    fixed-substep reference run' criterion."""
    grid = Grid.cube(16, 16e-3)
    r = 4e-4
    params = dem.ContactParams(kn=100.0, rho_p=2500.0)
    dt = 5e-5
    dt_c = dem.critical_dt(r, params)
    k = int(np.ceil(dt / dt_c))
    assert 1 < k < 8, f"premise: k={k} strictly inside [2, 7]"

    def run(cfg):
        state = _init(cfg, grid, r, dt)
        step = cd.make_step_fn(cfg)
        subs = []
        for _ in range(4):
            state, diag = step(state)
            subs.append(int(diag.n_dem_sub))
        return state, subs

    st_dyn, subs_dyn = run(_case(grid, r, params, 8, dynamic=True))
    st_ref, subs_ref = run(_case(grid, r, params, k, dynamic=False))
    assert subs_dyn == [k] * 4, subs_dyn
    assert subs_ref == [k] * 4
    np.testing.assert_allclose(np.asarray(st_dyn.particles.pos),
                               np.asarray(st_ref.particles.pos),
                               rtol=0, atol=1e-7 * 16e-3)
    np.testing.assert_allclose(np.asarray(st_dyn.particles.vel),
                               np.asarray(st_ref.particles.vel),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_dyn.fluid.p),
                               np.asarray(st_ref.fluid.p),
                               rtol=1e-5, atol=1e-10)


def test_dynamic_keeps_courant_dt_where_enforce_throttles():
    """Adaptive dt + stiff contacts: with dynamic_substeps the fluid dt
    follows the pure-Courant trajectory (substeps scale up instead), while
    enforce_critical_dt must throttle dt itself."""
    grid = Grid.cube(16, 16e-3)
    r = 4e-4
    params = dem.ContactParams(kn=100.0, rho_p=2500.0)
    dt_c = dem.critical_dt(r, params)
    n_steps = 8

    def run(cfg):
        state = _init(cfg, grid, r, dt=1e-5)
        step = cd.make_step_fn(cfg)
        dts, subs = [], []
        for _ in range(n_steps):
            state, diag = step(state)
            dts.append(float(state.dt))
            subs.append(int(diag.n_dem_sub))
        return dts, subs

    dts_free, _ = run(_case(grid, r, params, 2, dynamic=False,
                            adaptive=True))
    # premise: the Courant-grown dt does exceed 2 substeps' stability bound
    assert max(dts_free) / 2 > dt_c
    # but stays within the dynamic run's static max of 8
    assert max(dts_free) / 8 < dt_c

    dts_dyn, subs_dyn = run(_case(grid, r, params, 8, dynamic=True,
                                  adaptive=True))
    np.testing.assert_allclose(dts_dyn, dts_free, rtol=1e-6)
    assert subs_dyn[-1] == int(np.ceil(dts_dyn[-1] / dt_c))
    assert max(subs_dyn) > 2  # the substep count is what adapted

    dts_enf, _ = run(_case(grid, r, params, 2, dynamic=False, enforce=True,
                           adaptive=True))
    assert dts_enf[-1] < dts_dyn[-1]  # enforce throttles the fluid
    assert all(d / 2 <= dt_c * 1.0001 for d in dts_enf)
