"""Adaptive time-step control (setDeltaT.H parity)."""

import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.utils.diagnostics import TimeControls, new_dt


def test_dt_shrinks_when_co_exceeds():
    tc = TimeControls(adjust_time_step=True, max_co=0.5, max_dt=1.0)
    dt = new_dt(jnp.float32(2.0), jnp.float32(1e-3), tc)  # Co = 2 >> 0.5
    np.testing.assert_allclose(float(dt), 1e-3 * 0.25, rtol=1e-5)


def test_dt_grows_damped():
    tc = TimeControls(adjust_time_step=True, max_co=0.5, max_dt=1.0)
    # Co tiny -> factor capped at 1.2 (OpenFOAM growth damper)
    dt = new_dt(jnp.float32(1e-4), jnp.float32(1e-3), tc)
    np.testing.assert_allclose(float(dt), 1.2e-3, rtol=1e-5)


def test_dt_clamped_to_max():
    tc = TimeControls(adjust_time_step=True, max_co=0.5, max_dt=1.1e-3)
    dt = new_dt(jnp.float32(1e-6), jnp.float32(1e-3), tc)
    np.testing.assert_allclose(float(dt), 1.1e-3, rtol=1e-5)


def test_dt_fixed_when_disabled():
    tc = TimeControls(adjust_time_step=False)
    dt = new_dt(jnp.float32(10.0), jnp.float32(1e-3), tc)
    np.testing.assert_allclose(float(dt), 1e-3)


def test_adaptive_dt_in_coupled_loop():
    """Adaptive dt engages inside the jitted coupled step."""
    import dataclasses

    import jax

    from yade_openfoam_coupling_tpu import cases
    from yade_openfoam_coupling_tpu.models import coupled as cd

    cfg, state, dt = cases.settling_sphere(n=8)
    cfg = dataclasses.replace(
        cfg, time=TimeControls(adjust_time_step=True, max_co=0.3, max_dt=5e-3)
    )
    # seed a fast flux so Courant is nonzero
    run = cd.make_scan_fn(cfg, 5)
    state, diags = run(state)
    # dt grew (flow is slow, Co << maxCo), capped by 1.2x per step
    assert float(state.dt) > dt
    assert float(state.dt) <= 5e-3


def test_adaptive_dt_clamped_to_dem_critical():
    """DEMConfig.enforce_critical_dt (exchangeDT parity, FoamYade.C:537):
    with stiff contacts and adaptive dt, dt/n_sub never exceeds the
    Rayleigh critical dt; with the clamp off, the Courant logic alone
    would grow dt past it."""
    import numpy as np
    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem as demod
    from yade_openfoam_coupling_tpu.utils.diagnostics import TimeControls
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    grid = Grid.cube(16, 16e-3)
    r = 4e-4
    # kn high enough that 2 substeps of the Courant-grown dt would
    # integrate past the Rayleigh bound
    params = demod.ContactParams(kn=5e4, rho_p=2500.0)
    n_sub = 2
    dt_c = demod.critical_dt(r, params)

    def run(enforce):
        cfg = cd.CaseConfig(
            grid=grid, bcs=FluidBCs.channel_z(),
            transport=cd.TransportProperties(),
            solver="pimple",
            coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                       exchange="planes", slot_capacity=8),
            dem=demod.DEMConfig(params=params, neighbor="allpairs",
                                periodic=(True, True, False),
                                wall_axes=(False, False, True),
                                enforce_critical_dt=enforce),
            pimple=PIMPLEConfig(n_outer=1, n_correctors=1),
            time=TimeControls(adjust_time_step=True, max_co=0.5,
                              max_dt=1.0),
            n_dem_substeps=n_sub, r_max=r,
        )
        rng = np.random.RandomState(1)
        pos0 = rng.uniform(0.3 * 16e-3, 0.7 * 16e-3, (16, 3))
        state = cd.initialize_state(
            make_fluid_state(grid),
            make_particle_state(pos=pos0, radius=r),
            make_turbulence_state(grid, k0=1e-6),
            cfg, dt=1e-5)
        step = cd.make_step_fn(cfg)
        dts = []
        for _ in range(8):
            state, diag = step(state)
            dts.append(float(state.dt))
        return dts

    dts_off = run(False)
    # quiescent fluid -> Courant tiny -> dt grows 1.2x/step unbounded
    assert max(dts_off) / n_sub > dt_c, "test premise: unclamped dt exceeds"
    dts_on = run(True)
    assert all(d / n_sub <= dt_c * 1.0001 for d in dts_on)
