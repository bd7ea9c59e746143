"""Body-force-driven channel flow vs the analytic Poiseuille profile.

Validates the PIMPLE body-force machinery (phicForces face flux +
constrained wall fluxes + pressure balance) without particles: steady
u_x(z) = (g/2nu) z (H - z).
"""

import dataclasses

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
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig, pimple_step
from yade_openfoam_coupling_tpu.models.piso import FluidBCs
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops.grid import Grid


def test_poiseuille_profile():
    H = 1e-3
    grid = Grid.box((4, 4, 16), (H, H, H))
    bcs = FluidBCs.channel_z()
    nu = 1e-4
    gx = 0.01
    dt = 4e-6                      # below the explicit diffusion limit
    nsteps = 400                   # ~1.6 relaxation times... run to steady

    fs = make_fluid_state(grid)
    g = jnp.asarray([gx, 0.0, 0.0], jnp.float32)
    cfg = PIMPLEConfig(
        n_outer=1, n_correctors=1,
        pressure=pr.PressureSolverConfig(solver="pcg", tol=1e-7, maxiter=400),
    )
    nut = jnp.zeros(grid.shape)

    @jax.jit
    def run(fs):
        def body(fs, _):
            fs2, _info = pimple_step(fs, grid, bcs, nu, nut, g, dt, cfg)
            return fs2._replace(u_old=fs.u, alpha_old=fs.alpha), None
        return jax.lax.scan(body, fs, None, length=nsteps)[0]

    # run in chunks until steady
    for _ in range(6):
        fs = run(fs)
    z = (np.arange(16) + 0.5) * (H / 16)
    exact = gx / (2 * nu) * z * (H - z)
    got = np.asarray(fs.u[0, 2, 2, :])
    # discrete steady profile matches analytic within a few percent
    np.testing.assert_allclose(got, exact, rtol=0.05, atol=1e-8)
    # no flow through walls
    assert abs(float(fs.phi[2][0, 0, 0])) < 1e-12
    assert abs(float(fs.phi[2][0, 0, -1])) < 1e-12
