"""End-to-end coupled CFD-DEM physics: Stokes settling terminal velocity.

The canonical validation case of the reference's example suite
(example_icoFoamYade, README.md:10 / SURVEY.md §6 config #1): a single
sphere settling in quiescent fluid under gravity with point-force two-way
coupling; terminal velocity must match the analytic Stokes value
v_t = (rho_p - rho_f) V g / (3 pi d mu).
"""

import jax
import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.fields import (
    SimState,
    make_fluid_state,
    make_particle_state,
    make_turbulence_state,
)
from yade_openfoam_coupling_tpu.models.piso import FluidBCs, PISOConfig
from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops.grid import Grid


def settling_case():
    grid = Grid.cube(16, 8e-3)          # 8 mm box, h = 0.5 mm
    nu, rho_f, rho_p = 1e-6, 1000.0, 2500.0
    radius = 50e-6                      # d = 100 um
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.box_noslip(),
        transport=cd.TransportProperties(nu=nu, rho_f=rho_f, rho_p=rho_p),
        solver="piso",
        coupling=cp.CouplingConfig(gaussian=False),
        dem=dem.DEMConfig(
            params=dem.ContactParams(rho_p=rho_p),
            gravity=(0.0, 0.0, -9.81),
            buoyancy=True,
            rho_f=rho_f,
        ),
        piso=PISOConfig(n_correctors=1),
        n_dem_substeps=10,
    )
    return cfg, radius


def analytic_terminal_velocity(radius, rho_p, rho_f, nu):
    d = 2 * radius
    V = 4.0 / 3.0 * np.pi * radius ** 3
    mu = nu * rho_f
    return (rho_p - rho_f) * V * 9.81 / (3 * np.pi * d * mu)


def test_single_sphere_settling_terminal_velocity():
    cfg, radius = settling_case()
    grid = cfg.grid

    fluid = make_fluid_state(grid)
    particles = make_particle_state(
        pos=[[4e-3, 4e-3, 6e-3]], radius=radius, capacity=4
    )
    turb = make_turbulence_state(grid)
    dt = 2e-4
    state = SimState(
        fluid=fluid, particles=particles, turb=turb,
        t=jnp.float32(0.0), dt=jnp.float32(dt), step=jnp.int32(0),
    )

    run = cd.make_scan_fn(cfg, 60)       # 12 ms ~ 8.6 relaxation times
    state, diags = run(state)

    v_t = analytic_terminal_velocity(radius, 2500.0, 1000.0, 1e-6)
    vz = -float(state.particles.vel[0, 2])
    np.testing.assert_allclose(vz, v_t, rtol=0.05)
    # particle must still be inside and found every step
    assert int(diags.n_found[-1]) == 1
    assert bool(jnp.all(jnp.isfinite(state.fluid.u)))
    # fluid acquired a small downward wake under the particle
    assert float(jnp.min(state.fluid.u[2])) < 0.0


def test_coupled_step_jit_and_shapes():
    cfg, radius = settling_case()
    grid = cfg.grid
    state = SimState(
        fluid=make_fluid_state(grid),
        particles=make_particle_state(pos=[[4e-3, 4e-3, 4e-3]], radius=radius),
        turb=make_turbulence_state(grid),
        t=jnp.float32(0.0), dt=jnp.float32(1e-4), step=jnp.int32(0),
    )
    step = cd.make_step_fn(cfg)
    s1, d1 = step(state)
    assert s1.fluid.u.shape == (3,) + grid.shape
    assert int(s1.step) == 1
    assert float(s1.t) > 0.0


def test_gaussian_4way_fluidization_smoke():
    """PIMPLE 4-way: a dense plug of particles with upward gravity-driven
    flow stays finite and produces alpha < 1 (smoke test of config #3's
    machinery; quantitative bed height is a later-round validation)."""
    grid = Grid.cube(12, 0.012)
    nu, rho_f, rho_p = 1e-6, 1000.0, 2500.0
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
    from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=nu, rho_f=rho_f, rho_p=rho_p),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=10.0, rho_p=rho_p),
            gravity=(0.0, 0.0, -9.81),
            rho_f=rho_f,
            periodic=(True, True, False),
            wall_axes=(False, False, True),
        ),
        pimple=PIMPLEConfig(n_outer=1, n_correctors=1),
        turbulence=TurbulenceConfig(model="laminar"),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=5,
        r_max=4e-4,
    )
    rng = np.random.RandomState(0)
    pos = rng.uniform(0.002, 0.010, (32, 3))
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=pos, radius=4e-4),
        make_turbulence_state(grid),
        cfg, dt=5e-5,
    )
    run = cd.make_scan_fn(cfg, 10)
    state, diags = run(state)
    assert bool(jnp.all(jnp.isfinite(state.fluid.u)))
    assert bool(jnp.all(jnp.isfinite(state.particles.pos)))
    assert float(jnp.min(state.fluid.alpha)) < 1.0
    assert int(diags.n_found[-1]) == 32


def test_pressure_warm_start_extrapolation_same_solution():
    """PIMPLEConfig.p_extrapolate changes only the initial CG guess: the
    converged coupled trajectories match the non-extrapolated run."""
    import numpy as _np
    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem as demod
    from yade_openfoam_coupling_tpu.ops import pressure as pr
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    grid = Grid.cube(16, 16e-3)
    rng = _np.random.RandomState(5)
    pos0 = rng.uniform(0.3 * 16e-3, 0.7 * 16e-3, (24, 3))

    def run(extrap):
        cfg = cd.CaseConfig(
            grid=grid, bcs=FluidBCs.channel_z(),
            transport=cd.TransportProperties(),
            solver="pimple",
            coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                       stencil_shape="sphere2",
                                       exchange="planes", slot_capacity=8),
            dem=demod.DEMConfig(neighbor="allpairs",
                                periodic=(True, True, False),
                                wall_axes=(False, False, True)),
            pimple=PIMPLEConfig(
                n_outer=1, n_correctors=1, p_extrapolate=extrap,
                pressure=pr.PressureSolverConfig(solver="mgpcg", tol=1e-7,
                                                 maxiter=200)),
            n_dem_substeps=2, r_max=4e-4,
            gravity_fluid=(0.0, 0.0, -9.81),
        )
        state = cd.initialize_state(
            make_fluid_state(grid),
            make_particle_state(pos=pos0, radius=4e-4),
            make_turbulence_state(grid, k0=1e-6),
            cfg, dt=5e-5)
        step = cd.make_step_fn(cfg)
        iters = []
        for _ in range(5):
            state, diag = step(state)
            iters.append(int(diag.p_iters))
        return state, iters

    s0, it0 = run(0.0)
    s1, it1 = run(1.0)
    _np.testing.assert_allclose(_np.asarray(s1.fluid.p),
                                _np.asarray(s0.fluid.p),
                                rtol=2e-4, atol=1e-8)
    _np.testing.assert_allclose(_np.asarray(s1.particles.pos),
                                _np.asarray(s0.particles.pos),
                                rtol=1e-6, atol=1e-10)
