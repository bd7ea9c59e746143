"""Inlet/outflow channel: adjustPhi mass balance and plug-flow transport."""

import jax
import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.models.fields import make_fluid_state
from yade_openfoam_coupling_tpu.models.piso import FluidBCs, PISOConfig, piso_step
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops import stencil as st
from yade_openfoam_coupling_tpu.ops.grid import DIRICHLET, NEUMANN, SLIP, FaceBC, FieldBC, Grid


def inlet_bcs(u0):
    """x-lo inlet (fixed u), x-hi outflow (zero-grad u), y/z slip walls."""
    slip = FaceBC(SLIP)
    return FluidBCs(
        u=FieldBC((
            (FaceBC(DIRICHLET, (u0, 0.0, 0.0)), FaceBC(NEUMANN)),
            (slip, slip), (slip, slip),
        )),
        p=FieldBC.box(NEUMANN),
    )


def test_inlet_outflow_mass_balance():
    grid = Grid.cube(8, 0.008)
    u0 = 0.01
    bcs = inlet_bcs(u0)
    nu, dt = 1e-6, 1e-3
    fs = make_fluid_state(grid)
    cfg = PISOConfig(
        n_correctors=2,
        pressure=pr.PressureSolverConfig(solver="pcg", tol=1e-6, maxiter=500),
    )

    @jax.jit
    def step(fs):
        return piso_step(fs, grid, bcs, nu, dt, cfg)[0]

    for _ in range(30):
        fs = step(fs)

    # solenoidal flux everywhere
    div = st.div_flux(fs.phi, grid)
    assert float(jnp.max(jnp.abs(div))) < 1e-4
    # inflow through x-lo equals outflow through x-hi
    q_in = float(jnp.sum(fs.phi[0][0]))
    q_out = float(jnp.sum(fs.phi[0][-1]))
    np.testing.assert_allclose(q_out, q_in, rtol=1e-3)
    np.testing.assert_allclose(q_in / 64.0, u0, rtol=1e-2)
    # interior develops toward plug flow at u0 (30 steps after an impulsive
    # start: check the section MEAN and boundedness, not the full profile)
    np.testing.assert_allclose(float(jnp.mean(fs.u[0, 4])), u0, rtol=0.1)
    assert float(jnp.max(jnp.abs(fs.u))) < 3 * u0
    assert bool(jnp.all(jnp.isfinite(fs.u)))
