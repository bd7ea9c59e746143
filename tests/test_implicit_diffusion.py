"""Implicit momentum diffusion (PIMPLEConfig.implicit_diffusion) — the
reference's `fvm::laplacian(nuEff, U)` parity
(/root/reference/pimpleFoamYade/UcEqn.H:6,
/root/reference/icoFoamYade/icoFoamYade.C:83): high-nu / strongly
turbulent cases step at the Courant limit instead of the explicit
h^2/(6 nu_eff) bound."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.fields import (
    make_fluid_state,
    make_particle_state,
    make_turbulence_state,
)
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig, pimple_step
from yade_openfoam_coupling_tpu.models.piso import FluidBCs
from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig
from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import dem as demod
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops.grid import FieldBC, Grid
from yade_openfoam_coupling_tpu.utils.diagnostics import (
    TimeControls,
    diffusive_dt_bound,
)


def test_helmholtz_manufactured():
    """solve_helmholtz recovers a manufactured solution of
    a*x - div(gamma grad x) = rhs, incl. nonzero-Dirichlet BC folding."""
    rng = np.random.RandomState(0)
    grid = Grid.cube(12, 1.0)
    bc = FieldBC.channel_z(wall_value=0.3)   # nonzero Dirichlet walls
    x_true = jnp.asarray(rng.normal(0, 1, grid.shape), jnp.float32)
    a = jnp.asarray(rng.uniform(5.0, 10.0, grid.shape), jnp.float32)
    gam = jnp.asarray(rng.uniform(0.5, 1.5, grid.shape), jnp.float32)
    from yade_openfoam_coupling_tpu.ops import stencil as st
    from yade_openfoam_coupling_tpu.ops.grid import pad_scalar
    gamma_f = st.face_interp_all_padded(
        pad_scalar(gam, FieldBC.uniform("neumann")))
    pad = lambda f: pad_scalar(f, bc)
    rhs = a * x_true - pr.poisson_apply(x_true, gamma_f, grid, pad)
    res = pr.solve_helmholtz(
        a, gamma_f, rhs, jnp.zeros_like(rhs), grid, bc,
        pr.PressureSolverConfig(tol=1e-7, maxiter=400))
    assert int(res.iters) < 400
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true),
                               rtol=1e-3, atol=1e-4)


def _channel_run(implicit: bool, dt: float, nsteps: int, nu: float,
                 gx: float, grid: Grid):
    bcs = FluidBCs.channel_z()
    fs = make_fluid_state(grid)
    g = jnp.asarray([gx, 0.0, 0.0], jnp.float32)
    cfg = PIMPLEConfig(
        n_outer=1, n_correctors=1,
        pressure=pr.PressureSolverConfig(solver="pcg", tol=1e-7, maxiter=400),
        implicit_diffusion=implicit, full_stress=False,
        momentum=pr.PressureSolverConfig(solver="pcg", tol=1e-7, maxiter=200),
    )
    nut = jnp.zeros(grid.shape)

    @jax.jit
    def run(fs):
        def body(fs, _):
            fs2, _info = pimple_step(fs, grid, bcs, nu, nut, g, dt, cfg)
            return fs2._replace(u_old=fs.u, alpha_old=fs.alpha), None
        return jax.lax.scan(body, fs, None, length=nsteps)[0]

    return run(fs)


def test_implicit_poiseuille_at_8x_explicit_bound():
    """Poiseuille channel with dt ~ 8x the explicit-diffusion stability
    bound: the implicit path is stable and lands on the analytic profile;
    the explicit path at the same dt blows up (the premise the feature
    removes)."""
    H = 1e-3
    nz = 16
    grid = Grid.box((4, 4, nz), (H, H, H))
    nu = 1e-4
    gx = 0.01
    h = H / nz
    bound = float(diffusive_dt_bound(grid, nu, 0.0))
    assert bound < 8e-6
    dt = 8.0 * bound

    # steady state: ~5 relaxation times H^2/nu = 0.01 s
    nsteps = int(0.05 / dt)
    fs = _channel_run(True, dt, nsteps, nu, gx, grid)
    z = (np.arange(nz) + 0.5) * h
    exact = gx / (2 * nu) * z * (H - z)
    got = np.asarray(fs.u[0, 2, 2, :])
    np.testing.assert_allclose(got, exact, rtol=0.05, atol=1e-8)
    # walls stay impermeable
    assert abs(float(fs.phi[2][0, 0, 0])) < 1e-12
    assert abs(float(fs.phi[2][0, 0, -1])) < 1e-12

    # premise: the explicit path is unstable at this dt
    fs_exp = _channel_run(False, dt, 200, nu, gx, grid)
    mx = float(jnp.max(jnp.abs(fs_exp.u)))
    assert not np.isfinite(mx) or mx > 1e3


def test_implicit_matches_explicit_at_small_dt():
    """Both discretizations agree at a dt where the explicit path is
    comfortably stable (O(dt) consistency of the deferred vs implicit
    Laplacian)."""
    H = 1e-3
    grid = Grid.box((4, 4, 16), (H, H, H))
    nu = 1e-4
    gx = 0.01
    dt = 2e-6   # half the explicit bound
    fs_i = _channel_run(True, dt, 300, nu, gx, grid)
    fs_e = _channel_run(False, dt, 300, nu, gx, grid)
    np.testing.assert_allclose(np.asarray(fs_i.u[0]), np.asarray(fs_e.u[0]),
                               rtol=2e-2, atol=1e-9)


def _keps_case(implicit: bool):
    grid = Grid.cube(12, 12e-3)
    r = 2e-4
    return cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   exchange="planes", slot_capacity=8),
        dem=demod.DEMConfig(params=demod.ContactParams(kn=100.0),
                            neighbor="allpairs",
                            periodic=(True, True, False),
                            wall_axes=(False, False, True)),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=1,
            implicit_diffusion=implicit, full_stress=not implicit,
            momentum=pr.PressureSolverConfig(solver="pcg", tol=1e-6,
                                             maxiter=200),
        ),
        turbulence=TurbulenceConfig(model="kEpsilon"),
        time=TimeControls(adjust_time_step=True, max_co=0.5, max_dt=2e-3),
        n_dem_substeps=2, r_max=r,
    )


def test_kepsilon_holds_courant_dt():
    """VERDICT r3 item 7 'done' criterion: a kEpsilon case with
    nu_eff >> nu holds the maxCo/maxDt-limited dt under implicit
    diffusion, where the explicit path is capped at h^2/(6 nu_eff)."""
    r = 2e-4

    def run(implicit):
        cfg = _keps_case(implicit)
        grid = cfg.grid
        L = grid.lengths[0]
        rng = np.random.RandomState(2)
        pos = rng.uniform(0.4 * L, 0.6 * L, (8, 3))
        # nut = Cmu k^2/eps = 0.09e-4/9e-4 = 1e-2 m^2/s >> nu; decay
        # timescale k/eps ~ 11 s >> the simulated time
        state = cd.initialize_state(
            make_fluid_state(grid),
            make_particle_state(pos=pos, radius=r),
            make_turbulence_state(grid, k0=1e-2, eps0=9e-4),
            cfg, dt=1e-5)
        step = cd.make_step_fn(cfg)
        dts = []
        for _ in range(10):
            state, diag = step(state)
            dts.append(float(state.dt))
        nut_max = float(jnp.max(state.turb.nut))
        bound = float(diffusive_dt_bound(cfg.grid, cfg.transport.nu,
                                         nut_max))
        assert np.isfinite(float(jnp.max(jnp.abs(state.fluid.u))))
        return dts, bound

    dts_imp, bound = run(True)
    assert bound < 5e-5, bound          # premise: nu_eff makes the cap bite
    # implicit: dt grows right past the explicit-diffusion cap (1.2x/step
    # from 1e-5 over 10 steps in a quiescent flow)
    assert dts_imp[-1] > 3.0 * bound, (dts_imp, bound)

    dts_exp, bound_e = run(False)
    # explicit: capped at the diffusive bound
    assert dts_exp[-1] <= 1.05 * bound_e, (dts_exp, bound_e)
