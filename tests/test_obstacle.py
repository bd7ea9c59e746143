"""Masked-cell (immersed-boundary) obstacles: the TPU-native recovery of
the reference's arbitrary-geometry capability (OpenFOAM meshes any domain,
`/root/reference/icoFoamYade/icoFoamYade.C:41-42`) — VERDICT r4 item 7.

Covers: the masked pressure solve (solid identity rows, fluid-restricted
preconditioner, fluid-only nullspace), mass conservation with blocked
faces under body forces, no-slip in solid cells, a drag sanity check
(front/back pressure difference and flow-rate deficit vs the open
channel), and the coupled-step integration via CaseConfig.solid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.fields import (
    make_fluid_state,
    make_particle_state,
    make_turbulence_state,
)
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig, pimple_step
from yade_openfoam_coupling_tpu.models.piso import FluidBCs, PISOConfig, piso_step
from yade_openfoam_coupling_tpu.ops import obstacle as ob
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops import stencil as st
from yade_openfoam_coupling_tpu.ops.grid import FieldBC, Grid


def _channel_x():
    """Periodic in x (flow axis) and y, no-slip walls in z."""
    return FluidBCs.channel_z()


def _block_cfg(n=16, blk=(5, 9)):
    grid = Grid.cube(n, 0.016)
    solid = ob.box_solid(grid.shape, (blk[0], blk[0], blk[0]),
                         (blk[1], blk[1], blk[1]))
    return grid, solid


def test_build_masks_faces():
    grid, solid = _block_cfg()
    m = ob.build_masks(solid, (True, True, False))
    assert m.n_solid == 4 ** 3
    # a face strictly inside the block is blocked; far away is open
    assert float(m.face[0][7, 7, 7]) == 0.0
    assert float(m.face[0][2, 2, 2]) == 1.0
    # faces on the block surface are blocked (one adjacent solid cell)
    assert float(m.face[0][5, 7, 7]) == 0.0    # fluid(4)|solid(5) face
    assert float(m.face[0][9, 7, 7]) == 0.0    # solid(8)|fluid(9) face
    # fluid + solid partition
    np.testing.assert_array_equal(
        np.asarray(m.fluid + m.solid), np.ones(grid.shape, np.float32))


def test_masked_pressure_solve_exact():
    """The masked solve returns p with: masked-operator residual small,
    p == 0 in solid cells, fluid mean pinned to 0."""
    grid, solid = _block_cfg()
    bc = FieldBC.channel_z(kind_wall="neumann")
    m = ob.build_masks(solid, (True, True, False))
    gamma = tuple(jnp.ones_like(f) for f in m.face)
    gamma = ob.mask_flux(gamma, m)
    rng = np.random.RandomState(3)
    rhs = jnp.asarray(rng.randn(*grid.shape).astype(np.float32)) * m.fluid
    rhs = rhs - jnp.sum(rhs) / (grid.ncells - m.n_solid) * m.fluid
    res = pr.solve_pressure(
        gamma, rhs, jnp.zeros(grid.shape), grid, bc,
        pr.PressureSolverConfig(solver="mgpcg", tol=1e-6, maxiter=200),
        solid=m,
    )
    p = res.x
    assert float(jnp.max(jnp.abs(p * m.solid))) == 0.0
    # residual of the masked operator on fluid cells
    from yade_openfoam_coupling_tpu.ops.grid import pad_scalar
    Ap = st.laplacian_facegamma_padded(gamma, pad_scalar(p, bc), grid)
    r = (rhs - Ap) * m.fluid
    assert float(jnp.linalg.norm(r)) <= 2e-5 * float(jnp.linalg.norm(rhs))
    assert abs(float(jnp.sum(p))) < 1e-3


def test_fftpcg_preconditioner_with_mask_converges():
    """The spectral preconditioner ignores the mask (approximate inverse);
    CG must still converge in a reasonable iteration count."""
    grid, solid = _block_cfg()
    bc = FieldBC.channel_z(kind_wall="neumann")
    m = ob.build_masks(solid, (True, True, False))
    gamma = ob.mask_flux(tuple(jnp.ones_like(f) for f in m.face), m)
    rng = np.random.RandomState(4)
    rhs = jnp.asarray(rng.randn(*grid.shape).astype(np.float32)) * m.fluid
    res = pr.solve_pressure(
        gamma, rhs, jnp.zeros(grid.shape), grid, bc,
        pr.PressureSolverConfig(solver="fftpcg", tol=1e-6, maxiter=60),
        solid=m,
    )
    assert float(res.residual) <= 1e-5 * max(float(res.initial_residual), 1.0)
    assert int(res.iters) < 60


def _run_pimple(grid, bcs, masks, g, n_steps, dt=2e-4):
    fs = make_fluid_state(grid)
    cfg = PIMPLEConfig(
        n_outer=1, n_correctors=2,
        pressure=pr.PressureSolverConfig(solver="mgpcg", tol=1e-6,
                                         maxiter=120),
    )
    gv = jnp.asarray(g, jnp.float32)

    @jax.jit
    def step(fs):
        return pimple_step(fs, grid, bcs, 1e-4, jnp.zeros(grid.shape), gv,
                           dt, cfg, masks=masks)

    info = None
    for _ in range(n_steps):
        fs, info = step(fs)
    return fs, info


def test_flow_past_block_mass_and_drag():
    """Body-force-driven channel flow around an internal block: zero flux
    through blocked faces, no-slip in solid cells, div(phi) ~ 0 in fluid,
    positive front-back pressure difference (form drag), and a flow-rate
    deficit vs the open channel."""
    grid, solid = _block_cfg()
    bcs = _channel_x()
    m = ob.build_masks(solid, (True, True, False))
    g = (0.5, 0.0, 0.0)                      # drive along +x
    fs, info = _run_pimple(grid, bcs, m, g, n_steps=30)
    fs_open, _ = _run_pimple(grid, bcs, None, g, n_steps=30)

    # no-slip & blocked faces
    assert float(jnp.max(jnp.abs(fs.u * m.solid[None]))) == 0.0
    for a in range(3):
        assert float(jnp.max(jnp.abs(fs.phi[a] * (1.0 - m.face[a])))) == 0.0
    # continuity in fluid cells
    div = st.div_flux(fs.phi, grid) * m.fluid
    assert float(jnp.max(jnp.abs(div))) < 2e-3 * float(
        jnp.max(jnp.abs(fs.u)) / grid.spacing[0] + 1e-30)
    # flow developed
    assert float(jnp.mean(fs.u[0])) > 0.0
    # form drag: mean pressure on the front face column exceeds the back
    p = np.asarray(fs.p)
    front = p[4, 5:9, 5:9].mean()            # fluid cells just upstream
    back = p[9, 5:9, 5:9].mean()             # just downstream
    assert front - back > 0.0
    # obstacle reduces the bulk flow rate vs the open channel (the block
    # covers 6% of the cross-section; measured deficit ~4% at this
    # still-developing time — assert a robust 2%)
    q_blk = float(jnp.sum(fs.u[0] * m.fluid))
    q_open = float(jnp.sum(fs_open.u[0]))
    assert q_blk < 0.98 * q_open


def test_obstacle_no_forcing_stays_zero():
    grid, solid = _block_cfg()
    bcs = _channel_x()
    m = ob.build_masks(solid, (True, True, False))
    fs, _ = _run_pimple(grid, bcs, m, (0.0, 0.0, 0.0), n_steps=3)
    assert float(jnp.max(jnp.abs(fs.u))) < 1e-12
    for a in range(3):
        assert float(jnp.max(jnp.abs(fs.phi[a]))) < 1e-12


def test_piso_with_obstacle_runs():
    grid, solid = _block_cfg()
    bcs = _channel_x()
    m = ob.build_masks(solid, (True, True, False))
    fs = make_fluid_state(grid)
    # seed a shear flow so the solve has work
    u = np.zeros((3,) + grid.shape, np.float32)
    u[0] = 0.01 * np.sin(
        np.linspace(0, 2 * np.pi, grid.shape[2], endpoint=False))[None, None]
    fs = fs._replace(u=ob.mask_u(jnp.asarray(u), m))
    cfg = PISOConfig(n_correctors=2,
                     pressure=pr.PressureSolverConfig(solver="mgpcg",
                                                      tol=1e-6, maxiter=120))

    @jax.jit
    def step(fs):
        return piso_step(fs, grid, bcs, 1e-5, 2e-4, cfg, masks=m)

    for _ in range(3):
        fs, info = step(fs)
    assert float(jnp.max(jnp.abs(fs.u * m.solid[None]))) == 0.0
    div = st.div_flux(fs.phi, grid) * m.fluid
    assert float(jnp.max(jnp.abs(div))) < 1e-4
    assert np.isfinite(float(jnp.sum(fs.p)))


def test_coupled_step_with_solid_config():
    """End-to-end CaseConfig.solid: particles settle next to the obstacle,
    all diagnostics finite, velocity pinned in solid cells every step."""
    grid, solid = _block_cfg()
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=_channel_x(),
        transport=cd.TransportProperties(nu=1e-5, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange="planes", slot_capacity=6),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=50.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=8, max_neighbors=16,
        ),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=2,
            pressure=pr.PressureSolverConfig(solver="mgpcg", tol=1e-6,
                                             maxiter=120)),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=2,
        r_max=4e-4,
        solid=solid,
    )
    rng = np.random.RandomState(5)
    # particles in the open region x < block
    pos = rng.uniform(0.001, 0.004, (40, 3)).astype(np.float32)
    pos[:, 1] = rng.uniform(0.002, 0.014, 40)
    pos[:, 2] = rng.uniform(0.002, 0.014, 40)
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=pos, radius=4e-4),
        make_turbulence_state(grid),
        cfg, dt=1e-4,
    )
    run = cd.make_scan_fn(cfg, 5)
    state, diags = run(state)
    m = cfg.obstacle_masks()
    assert float(jnp.max(jnp.abs(state.fluid.u * m.solid[None]))) == 0.0
    assert np.all(np.isfinite(np.asarray(diags.cont_err_local)))
    assert float(np.max(np.asarray(diags.cont_err_local))) < 1e-4
    assert int(np.asarray(diags.n_found)[-1]) == 40
