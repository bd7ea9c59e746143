"""Additional coverage: upwind scheme, kEpsilon coupled smoke, CLI pimple."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu import cases
from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
from yade_openfoam_coupling_tpu.models.piso import PISOConfig
from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig


def test_upwind_convection_taylor_green():
    """Upwind convection stays stable and dissipative on TGV."""
    from yade_openfoam_coupling_tpu.models.fields import make_fluid_state
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs, piso_step
    from yade_openfoam_coupling_tpu.ops import stencil as st
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    grid = Grid.cube(16, 2 * np.pi)
    bcs = FluidBCs.periodic()
    X = grid.cell_centers()
    u0 = jnp.stack([
        jnp.sin(X[0]) * jnp.cos(X[1]),
        -jnp.cos(X[0]) * jnp.sin(X[1]),
        jnp.zeros(grid.shape),
    ])
    fs = make_fluid_state(grid)._replace(u=u0, phi=st.flux(u0, bcs.u, grid))
    cfg = PISOConfig(n_correctors=1, convection_scheme="upwind")
    ke0 = float(jnp.sum(u0 ** 2))
    for _ in range(20):
        fs, _ = piso_step(fs, grid, bcs, 0.01, 0.02, cfg)
    assert bool(jnp.all(jnp.isfinite(fs.u)))
    assert float(jnp.sum(fs.u ** 2)) < ke0   # upwind adds dissipation


def test_kepsilon_coupled_smoke():
    cfg, state, dt = cases.fluidized_bed(n_particles=30, n=12,
                                         turbulence="kEpsilon")
    state = state._replace(
        turb=state.turb._replace(
            k=jnp.full(cfg.grid.shape, 1e-4),
            epsilon=jnp.full(cfg.grid.shape, 1e-5),
        )
    )
    step = cd.make_step_fn(cfg)
    for _ in range(3):
        state, diag = step(state)
    assert bool(jnp.all(jnp.isfinite(state.fluid.u)))
    assert float(jnp.min(state.turb.k)) > 0.0
    assert float(jnp.min(state.turb.nut)) >= 0.0


def test_cli_pimplefoam_smoke(tmp_path, capsys):
    (tmp_path / "system").mkdir()
    (tmp_path / "constant").mkdir()
    (tmp_path / "system/controlDict").write_text(
        "deltaT 5e-5; endTime 2e-4; writeInterval 1; maxCo 0.5;"
    )
    (tmp_path / "system/blockMeshDict").write_text(
        "vertices ( (0 0 0) (0.008 0 0) (0.008 0.008 0) (0 0.008 0)"
        " (0 0 0.008) (0.008 0 0.008) (0.008 0.008 0.008) (0 0.008 0.008) );"
        " blocks ( hex (0 1 2 3 4 5 6 7) (8 8 8) simpleGrading (1 1 1) );"
    )
    (tmp_path / "constant/transportProperties").write_text(
        "nu 1e-06; partDensity 2500; fluidDensity 1000;"
    )
    (tmp_path / "constant/turbulenceProperties").write_text(
        "simulationType laminar;"
    )
    (tmp_path / "constant/g").write_text("value (0 0 -9.81);")
    from yade_openfoam_coupling_tpu.cli import main

    rc = main([
        "pimplefoam", str(tmp_path),
        "--random-particles", "8", "--radius", "2e-4",
        "--chunk", "2", "--max-steps", "4",
    ])
    assert rc == 0
    assert "End" in capsys.readouterr().out


def test_chunked_equals_unchunked_in_full_step():
    """A full coupled step with particle_chunks matches unchunked."""
    cfg, state, dt = cases.fluidized_bed(n_particles=64, n=12)
    cfg_l = dataclasses.replace(
        cfg, coupling=dataclasses.replace(cfg.coupling, lag_alpha=True)
    )
    cfg_c = dataclasses.replace(
        cfg_l,
        coupling=dataclasses.replace(cfg_l.coupling, particle_chunks=4),
        dem=dataclasses.replace(cfg_l.dem, force_chunks=4),
    )
    s1, _ = cd.coupled_step(state, cfg_l)
    s2, _ = cd.coupled_step(state, cfg_c)
    # chunked summation reassociates f32 adds; differences are roundoff
    np.testing.assert_allclose(
        np.asarray(s2.fluid.u), np.asarray(s1.fluid.u), rtol=1e-4, atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(s2.particles.pos), np.asarray(s1.particles.pos),
        rtol=1e-5, atol=1e-9,
    )


def test_fluidized_bed_with_inlet():
    """Real fluidization: upward inflow lifts the bed-average fluid flow."""
    cfg, state, dt = cases.fluidized_bed(
        n_particles=40, n=12, turbulence="laminar", inlet_velocity=0.02
    )
    run = cd.make_scan_fn(cfg, 8)
    state, diags = run(state)
    assert bool(jnp.all(jnp.isfinite(state.fluid.u)))
    # mean vertical velocity approaches the superficial inlet velocity
    wbar = float(jnp.mean(state.fluid.u[2]))
    assert wbar > 0.005
    # flux through the top equals flux through the bottom (mass balance)
    q_bot = float(jnp.sum(state.fluid.phi[2][:, :, 0]))
    q_top = float(jnp.sum(state.fluid.phi[2][:, :, -1]))
    np.testing.assert_allclose(q_top, q_bot, rtol=5e-2)


def test_scan_fn_donate_matches_undonated():
    """make_scan_fn(donate=True) donates the input SimState (HBM headroom
    at the 1M/256^3 scale) and must be bit-identical to the undonated
    scan, including with the aliased nbr_ref_pos=pos initial state."""
    cfg, state, dt = cases.sedimentation_cloud(n_particles=60, n=12)
    s_ref, _ = cd.make_scan_fn(cfg, 4)(state)
    s_don, _ = cd.make_scan_fn(cfg, 4, donate=True)(state)
    np.testing.assert_array_equal(np.asarray(s_don.fluid.p),
                                  np.asarray(s_ref.fluid.p))
    np.testing.assert_array_equal(np.asarray(s_don.particles.pos),
                                  np.asarray(s_ref.particles.pos))
