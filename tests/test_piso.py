"""PISO solver physics tests: Taylor-Green decay, incompressibility."""

import jax
import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.models.fields import make_fluid_state
from yade_openfoam_coupling_tpu.models.piso import FluidBCs, PISOConfig, piso_step
from yade_openfoam_coupling_tpu.ops import grid as g
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops import stencil as st


def taylor_green(grid, nu, t):
    X = grid.cell_centers()
    decay = np.exp(-2.0 * nu * t)
    u = jnp.stack([
        jnp.sin(X[0]) * jnp.cos(X[1]) * decay,
        -jnp.cos(X[0]) * jnp.sin(X[1]) * decay,
        jnp.zeros(grid.shape),
    ])
    p = 0.25 * (jnp.cos(2 * X[0]) + jnp.cos(2 * X[1])) * decay ** 2
    return u, p


def test_taylor_green_decay():
    grid = g.Grid.cube(32, 2 * np.pi)
    bcs = FluidBCs.periodic()
    nu = 0.05
    dt = 0.01
    nsteps = 50

    u0, p0 = taylor_green(grid, nu, 0.0)
    fs = make_fluid_state(grid)._replace(u=u0, p=p0, phi=st.flux(u0, bcs.u, grid))

    cfg = PISOConfig(pressure=pr.PressureSolverConfig(solver="mgpcg", tol=1e-6))

    @jax.jit
    def run(fs):
        def body(fs, _):
            fs, info = piso_step(fs, grid, bcs, nu, dt, cfg)
            return fs, info.iters
        return jax.lax.scan(body, fs, None, length=nsteps)

    fs, iters = run(fs)
    u_exact, _ = taylor_green(grid, nu, nsteps * dt)
    err = float(jnp.max(jnp.abs(fs.u - u_exact)))
    assert err < 0.02, f"TGV error {err}"

    # incompressibility of the corrected flux
    div = st.div_flux(fs.phi, grid)
    assert float(jnp.max(jnp.abs(div))) < 1e-3

    # kinetic energy must decay monotonically-ish
    ke0 = float(jnp.sum(u0 ** 2))
    ke1 = float(jnp.sum(fs.u ** 2))
    assert ke1 < ke0


def test_noslip_box_stability():
    """Decaying flow in a closed no-slip box stays bounded & solenoidal."""
    grid = g.Grid.cube(16, 1.0)
    bcs = FluidBCs.box_noslip()
    nu = 0.01
    dt = 0.002
    X = grid.cell_centers()
    u0 = jnp.stack([
        jnp.sin(np.pi * X[0] / 1.0) * 0.5,
        jnp.zeros(grid.shape),
        jnp.zeros(grid.shape),
    ])
    fs = make_fluid_state(grid)._replace(u=u0, phi=st.flux(u0, bcs.u, grid))
    cfg = PISOConfig(n_correctors=2)

    @jax.jit
    def step(fs):
        fs, info = piso_step(fs, grid, bcs, nu, dt, cfg)
        return fs

    for _ in range(20):
        fs = step(fs)
    assert bool(jnp.all(jnp.isfinite(fs.u)))
    assert float(jnp.max(jnp.abs(fs.u))) < 1.0
    div = st.div_flux(fs.phi, grid)
    assert float(jnp.max(jnp.abs(div))) < 5e-3
