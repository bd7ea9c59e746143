"""Slot-table dense exchange: equivalence with the sparse plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.fields import (
    make_fluid_state, make_particle_state, make_turbulence_state,
)
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
from yade_openfoam_coupling_tpu.models.piso import FluidBCs
from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import coupling_slots as cps
from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops.grid import Grid


def _fields(grid, seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rng.randn(*s) * 1e-2, jnp.float32)
    return (f(3, *grid.shape), f(3, *grid.shape), f(3, *grid.shape),
            f(3, *grid.shape), f(3, *grid.shape))


def _particles(grid, n, seed=1, pad=0):
    rng = np.random.RandomState(seed)
    lo = [grid.origin[a] + 0.08 * grid.lengths[a] for a in range(3)]
    hi = [grid.origin[a] + 0.92 * grid.lengths[a] for a in range(3)]
    pos = rng.uniform(lo, hi, (n, 3))
    ps = make_particle_state(pos=pos, radius=4e-4, capacity=n + pad)
    vel = jnp.asarray(rng.randn(n + pad, 3) * 1e-3, jnp.float32)
    ang = jnp.asarray(rng.randn(n + pad, 3) * 1e-2, jnp.float32)
    return cp.ParticleFields(ps.pos, vel, ang, ps.radius, ps.active)


@pytest.mark.parametrize("periodic", [(True, True, False), (False, False, False)])
@pytest.mark.parametrize("lag", [False, True])
def test_slots_matches_sparse(periodic, lag):
    grid = Grid.cube(12, 0.012)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=lag,
                            stencil_shape="sphere2",
                            exchange="slots", slot_capacity=6)
    pf = _particles(grid, 40, pad=3)
    u, gp, dtau, ddtu, curl = _fields(grid)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97

    sparse = cp.gaussian_coupling(pf, u, gp, dtau, ddtu, curl, grid,
                                  periodic, 1e-6, 1000.0, 1e-4, cfg,
                                  prev_alpha=prev_alpha)
    slots = cps.gaussian_coupling_slots(pf, u, gp, dtau, ddtu, curl, grid,
                                        periodic, 1e-6, 1000.0, 1e-4, cfg,
                                        prev_alpha=prev_alpha)

    assert int(slots.n_overflow) == 0
    np.testing.assert_array_equal(np.asarray(slots.found),
                                  np.asarray(sparse.found))
    np.testing.assert_allclose(np.asarray(slots.alpha),
                               np.asarray(sparse.alpha), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(slots.u_particle),
                               np.asarray(sparse.u_particle), rtol=1e-4,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(slots.u_source_drag),
                               np.asarray(sparse.u_source_drag), rtol=1e-4,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(slots.u_source),
                               np.asarray(sparse.u_source), rtol=1e-3,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(slots.force),
                               np.asarray(sparse.force), rtol=1e-4, atol=1e-12)


def test_slots_with_torque_matches_sparse():
    grid = Grid.cube(10, 0.01)
    cfg = cp.CouplingConfig(gaussian=True, use_torque=True,
                            exchange="slots", slot_capacity=6)
    pf = _particles(grid, 25)
    u, gp, dtau, ddtu, curl = _fields(grid, seed=4)
    pa = jnp.ones(grid.shape, jnp.float32)
    sparse = cp.gaussian_coupling(pf, u, gp, dtau, ddtu, curl, grid,
                                  (False,) * 3, 1e-6, 1000.0, 1e-4, cfg,
                                  prev_alpha=pa)
    slots = cps.gaussian_coupling_slots(pf, u, gp, dtau, ddtu, curl, grid,
                                        (False,) * 3, 1e-6, 1000.0, 1e-4, cfg,
                                        prev_alpha=pa)
    np.testing.assert_allclose(np.asarray(slots.torque),
                               np.asarray(sparse.torque), rtol=1e-4, atol=1e-12)


def test_slots_overflow_counted_and_masked():
    grid = Grid.cube(8, 0.008)
    cfg = cp.CouplingConfig(gaussian=True, exchange="slots", slot_capacity=2)
    # 6 particles in the same cell: 4 must overflow
    pos = np.full((6, 3), 4.5e-3) + np.random.RandomState(0).uniform(
        0, 2e-4, (6, 3))
    ps = make_particle_state(pos=pos, radius=2e-4)
    pf = cp.ParticleFields(ps.pos, ps.vel, ps.angvel, ps.radius, ps.active)
    u, gp, dtau, ddtu, curl = _fields(grid, seed=2)
    res = cps.gaussian_coupling_slots(pf, u, gp, dtau, ddtu, curl, grid,
                                      (False,) * 3, 1e-6, 1000.0, 1e-4, cfg,
                                      prev_alpha=jnp.ones(grid.shape))
    assert int(res.n_overflow) == 4
    assert int(jnp.sum(res.found.astype(jnp.int32))) == 2
    # overflowed particles get zero force
    f = np.asarray(res.force)
    assert (np.abs(f) > 0).any()
    assert int((np.abs(f).sum(axis=1) > 0).sum()) == 2


def test_coupled_step_with_slots_runs():
    grid = Grid.cube(12, 0.012)
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange="slots", slot_capacity=4),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=10.0, rho_p=2500.0),
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells",
        ),
        pimple=PIMPLEConfig(n_outer=1, n_correctors=1,
                            pressure=pr.PressureSolverConfig(
                                solver="pcg", tol=1e-6, maxiter=200)),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=2, r_max=4e-4,
    )
    rng = np.random.RandomState(0)
    pos = rng.uniform(0.002, 0.010, (50, 3))
    state = cd.initialize_state(
        make_fluid_state(grid), make_particle_state(pos=pos, radius=4e-4),
        make_turbulence_state(grid), cfg, dt=1e-4,
    )
    out, diag = cd.make_scan_fn(cfg, 3)(state)
    assert bool(jnp.all(jnp.isfinite(out.fluid.u)))
    assert int(diag.n_found[-1]) == 50
    assert int(diag.n_coupling_overflow[-1]) == 0
