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
