"""Round-2 fixes: exact sharded face carry, polyMesh output, checkpoint
cadence, relTol, DEM overflow surfacing, diffusive dt guard, full stress,
under-relaxation."""

import os

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
from yade_openfoam_coupling_tpu.models.piso import FluidBCs, PISOConfig
from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops.grid import (
    DIRICHLET,
    NEUMANN,
    SLIP,
    FaceBC,
    FieldBC,
    Grid,
)
from yade_openfoam_coupling_tpu.parallel import make_mesh
from yade_openfoam_coupling_tpu.parallel import sharded as sh

_PCFG = pr.PressureSolverConfig(solver="pcg", tol=1e-7, maxiter=600)


# ---------------------------------------------------------------------------
# polyMesh + time-dir output
# ---------------------------------------------------------------------------

def test_polymesh_self_consistency():
    from yade_openfoam_coupling_tpu.utils.foammesh import check_polymesh
    for shape in [(4, 4, 4), (6, 3, 2), (2, 5, 3)]:
        check_polymesh(Grid.box(shape, (1.0, 0.5, 0.25)))


def test_polymesh_write_and_field_ordering(tmp_path):
    """Fields must be written x-fastest to match blockMesh cell ordering,
    with all six patches in boundaryField, and the polyMesh companion."""
    from yade_openfoam_coupling_tpu.utils import checkpoint as ckpt
    from yade_openfoam_coupling_tpu.utils.foammesh import PATCH_NAMES

    grid = Grid.box((4, 3, 2), (4.0, 3.0, 2.0))
    fs = make_fluid_state(grid)
    # p[i,j,k] = i  ->  x-fastest flat must start 0,1,2,3,0,1,2,3,...
    xs = jnp.broadcast_to(jnp.arange(4.0)[:, None, None], grid.shape)
    fs = fs._replace(p=xs)
    state = cd.initialize_state(
        fs, make_particle_state(pos=np.zeros((1, 3)) + 0.5, radius=0.1),
        make_turbulence_state(grid),
        cd.CaseConfig(grid=grid, bcs=FluidBCs.box_noslip(),
                      coupling=cp.CouplingConfig(gaussian=False)),
        dt=1e-3,
    )
    state = state._replace(fluid=state.fluid._replace(p=xs))
    out = ckpt.write_time_dir(str(tmp_path), state, grid=grid)
    txt = (tmp_path / "0" / "p").read_text()
    body = txt.split("(\n", 1)[1].split("\n)", 1)[0].strip().splitlines()
    vals = [float(v) for v in body]
    assert vals[:8] == [0.0, 1.0, 2.0, 3.0, 0.0, 1.0, 2.0, 3.0]
    for p in PATCH_NAMES:
        assert p in txt
    assert (tmp_path / "constant" / "polyMesh" / "points").exists()
    assert (tmp_path / "constant" / "polyMesh" / "boundary").exists()
    assert (tmp_path / "case.foam").exists()
    # boundary startFace/nFaces must tile exactly the non-internal range
    btxt = (tmp_path / "constant" / "polyMesh" / "boundary").read_text()
    import re
    n_faces = sum(int(m) for m in re.findall(r"nFaces\s+(\d+);", btxt))
    assert n_faces == 2 * (3 * 2 + 4 * 2 + 4 * 3)


# ---------------------------------------------------------------------------
# LoFaces exact carry
# ---------------------------------------------------------------------------

def test_lofaces_roundtrip_exact():
    rng = np.random.RandomState(3)
    shape = (8, 4, 4)
    phi = (
        jnp.asarray(rng.randn(9, 4, 4), jnp.float32),
        jnp.asarray(rng.randn(8, 5, 4), jnp.float32),
        jnp.asarray(rng.randn(8, 4, 5), jnp.float32),
    )
    lf = sh.faces_to_lo(phi)
    back = sh.lo_to_faces_host(lf)
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(back[a]), np.asarray(phi[a]))


def _inlet_bcs(u0):
    """x-lo inlet, x-hi outflow (NEUMANN), y/z slip — the exact BC set the
    round-1 sharded reconstruction corrupted (SLIP hi faces copied interior
    flux; NEUMANN hi faces lost the adjustPhi correction)."""
    slip = FaceBC(SLIP)
    return FluidBCs(
        FieldBC((
            (FaceBC(DIRICHLET, (u0, 0.0, 0.0)), FaceBC(NEUMANN)),
            (slip, slip), (slip, slip),
        )),
        FieldBC((
            (FaceBC(NEUMANN), FaceBC(NEUMANN)),
            (FaceBC(NEUMANN), FaceBC(NEUMANN)),
            (FaceBC(NEUMANN), FaceBC(NEUMANN)),
        )),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_inlet_outflow_slip_matches_single():
    """1-vs-8 equivalence with inlet + adjustPhi outflow + SLIP walls, with
    the outflow on the SHARDED axis (the hi-plane carry path)."""
    u0 = 0.01
    grid = Grid.cube(16, 0.016)
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=_inlet_bcs(u0),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="piso",
        coupling=cp.CouplingConfig(gaussian=False),
        dem=dem.DEMConfig(
            params=dem.ContactParams(rho_p=2500.0),
            gravity=(0.0, 0.0, 0.0), rho_f=1000.0,
        ),
        piso=PISOConfig(n_correctors=1, pressure=_PCFG),
        n_dem_substeps=2,
        r_max=50e-6,
    )
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=[[8e-3, 8e-3, 8e-3]], radius=50e-6),
        make_turbulence_state(grid), cfg, dt=1e-4,
    )
    n = 5
    s1, _ = cd.make_scan_fn(cfg, n)(state)
    mesh = make_mesh(8)
    sstate = sh.to_sharded_state(state, cfg, mesh)
    out, _ = sh.make_sharded_scan(cfg, mesh, n)(sstate)
    fluid = out.fluid._replace(phi=sh.lo_to_faces_host(out.fluid.phi))
    np.testing.assert_allclose(
        np.asarray(fluid.u), np.asarray(s1.fluid.u), rtol=1e-4, atol=5e-8,
    )
    # hi faces (x outflow plane) must match EXACTLY what single-device kept
    np.testing.assert_allclose(
        np.asarray(fluid.phi[0][-1]), np.asarray(s1.fluid.phi[0][-1]),
        rtol=1e-5, atol=1e-9,
    )


# ---------------------------------------------------------------------------
# runner cadence
# ---------------------------------------------------------------------------

def test_runner_midrun_checkpoint(tmp_path):
    from yade_openfoam_coupling_tpu.models import runner
    from yade_openfoam_coupling_tpu.utils.config import RunControls

    grid = Grid.cube(8, 8e-3)
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.box_noslip(),
        coupling=cp.CouplingConfig(gaussian=False),
        piso=PISOConfig(n_correctors=1, pressure=_PCFG),
        n_dem_substeps=2,
    )
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=[[4e-3, 4e-3, 4e-3]], radius=50e-6),
        make_turbulence_state(grid), cfg, dt=1e-4,
    )
    controls = RunControls(end_time=2e-3, write_interval=5e-4)
    case_dir = tmp_path / "case"
    ck_dir = tmp_path / "ck"
    res = runner.run(cfg, state, controls, chunk=2,
                     case_dir=str(case_dir), checkpoint_dir=str(ck_dir))
    snaps = sorted(p.name for p in ck_dir.glob("step_*"))
    # a MID-RUN checkpoint must exist (not only the final one)
    assert len(snaps) >= 2, snaps
    assert len(res.wrote) >= 2


# ---------------------------------------------------------------------------
# relTol
# ---------------------------------------------------------------------------

def test_reltol_early_exit():
    grid = Grid.cube(16, 1.0)
    bc = FieldBC.uniform("neumann")
    gamma = tuple(jnp.ones_like(g) for g in
                  (jnp.zeros((17, 16, 16)), jnp.zeros((16, 17, 16)),
                   jnp.zeros((16, 16, 17))))
    rng = np.random.RandomState(0)
    rhs = jnp.asarray(rng.randn(16, 16, 16), jnp.float32)
    rhs = rhs - jnp.mean(rhs)
    tight = pr.solve_pressure(gamma, rhs, jnp.zeros_like(rhs), grid, bc,
                              pr.PressureSolverConfig(solver="pcg", tol=1e-7,
                                                      maxiter=500))
    loose = pr.solve_pressure(gamma, rhs, jnp.zeros_like(rhs), grid, bc,
                              pr.PressureSolverConfig(solver="pcg", tol=1e-7,
                                                      rel_tol=0.1, maxiter=500))
    assert int(loose.iters) < int(tight.iters)
    assert float(loose.residual) <= 0.1 * float(loose.initial_residual) + 1e-12


# ---------------------------------------------------------------------------
# DEM overflow surfacing + periodic bin guard
# ---------------------------------------------------------------------------

def test_neighbor_overflow_counter():
    grid = Grid.cube(16, 0.16)
    r = 4e-3
    cfg_small = dem.DEMConfig(neighbor="cells", cell_capacity=2, max_neighbors=4)
    # 20 particles in one tight cluster: bins and lists must overflow
    pos = jnp.asarray(0.08 + np.random.RandomState(0).uniform(0, 2e-3, (20, 3)),
                      jnp.float32)
    act = jnp.ones(20, bool)
    _, overflow = dem.build_neighbor_list(pos, act, grid, cfg_small, r,
                                          return_overflow=True)
    assert int(overflow) > 0
    # dilute: no overflow
    pos2 = jnp.asarray(np.random.RandomState(1).uniform(0.02, 0.14, (20, 3)),
                       jnp.float32)
    cfg_big = dem.DEMConfig(neighbor="cells", cell_capacity=8, max_neighbors=12)
    _, overflow2 = dem.build_neighbor_list(pos2, act, grid, cfg_big, r,
                                           return_overflow=True)
    assert int(overflow2) == 0


def test_overflow_in_step_diagnostics():
    grid = Grid.cube(8, 0.08)
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=10.0, rho_p=2500.0),
            neighbor="cells", cell_capacity=1, max_neighbors=2,
            periodic=(True, True, False), wall_axes=(False, False, True),
        ),
        pimple=PIMPLEConfig(n_outer=1, n_correctors=1, pressure=_PCFG),
        n_dem_substeps=2, r_max=2e-3,
    )
    pos = 0.04 + np.random.RandomState(0).uniform(0, 1.5e-3, (12, 3))
    state = cd.initialize_state(
        make_fluid_state(grid), make_particle_state(pos=pos, radius=2e-3),
        make_turbulence_state(grid), cfg, dt=1e-4,
    )
    _, diag = cd.coupled_step(state, cfg)
    assert int(diag.n_contact_overflow) > 0


def test_periodic_small_bins_raises():
    grid = Grid.box((16, 16, 2), (0.16, 0.16, 0.02))
    cfg = dem.DEMConfig(neighbor="cells", periodic=(False, False, True))
    pos = jnp.zeros((4, 3), jnp.float32) + 0.01
    act = jnp.ones(4, bool)
    with pytest.raises(ValueError, match="periodic axis"):
        dem.build_neighbor_list(pos, act, grid, cfg, 5e-3)


# ---------------------------------------------------------------------------
# diffusive dt guard
# ---------------------------------------------------------------------------

def test_diffusive_dt_cap():
    from yade_openfoam_coupling_tpu.utils.diagnostics import (
        TimeControls, diffusive_dt_bound, new_dt,
    )
    tc = TimeControls(adjust_time_step=True, max_co=0.5, max_dt=1.0)
    grid = Grid.cube(16, 0.016)  # h = 1 mm
    # nut >> nu: the diffusive bound must cap dt below the Courant choice
    bound = diffusive_dt_bound(grid, 1e-6, jnp.asarray(1e-2))
    dt = new_dt(jnp.asarray(1e-3), jnp.asarray(0.1), tc, dt_diff=bound)
    assert float(dt) <= float(bound) + 1e-12
    assert float(bound) < 0.1


def test_keqn_high_nut_stable_under_adaptive_dt():
    """With kEqn active and a seeded high-k field, the step must remain
    finite thanks to the diffusive dt cap (the reference's fvm::laplacian
    is implicit and has no such limit — ours is explicit)."""
    grid = Grid.cube(12, 0.012)
    from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig
    from yade_openfoam_coupling_tpu.utils.diagnostics import TimeControls
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=10.0, rho_p=2500.0),
            periodic=(True, True, False), wall_axes=(False, False, True),
        ),
        pimple=PIMPLEConfig(n_outer=1, n_correctors=1, pressure=_PCFG),
        turbulence=TurbulenceConfig(model="kEqn"),
        time=TimeControls(adjust_time_step=True, max_co=0.5, max_dt=1.0),
        n_dem_substeps=2, r_max=3e-4,
    )
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=[[6e-3, 6e-3, 6e-3]], radius=3e-4),
        make_turbulence_state(grid, k0=1.0),   # huge seeded k -> nut >> nu
        cfg, dt=5e-3,                          # dt far above diffusive limit
    )
    # seed a velocity field so production is active
    u = state.fluid.u.at[0].set(0.01)
    state = state._replace(fluid=state.fluid._replace(u=u))
    # 2 steps: step 1 raises nut from the seeded k; step 2's dt must then be
    # capped by the diffusive bound (k's own sink decays it afterwards, so
    # later steps can legitimately re-grow dt)
    out, diag = cd.make_scan_fn(cfg, 2)(state)
    assert bool(jnp.all(jnp.isfinite(out.fluid.u)))
    assert bool(jnp.all(jnp.isfinite(out.turb.k)))
    assert float(out.dt) < 4.5e-3, float(out.dt)


# ---------------------------------------------------------------------------
# full stress + relaxation
# ---------------------------------------------------------------------------

def _pimple_fs(grid, alpha=None):
    fs = make_fluid_state(grid)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(3, *grid.shape) * 1e-3, jnp.float32)
    fs = fs._replace(u=u)
    if alpha is not None:
        fs = fs._replace(alpha=alpha, alpha_old=alpha)
    return fs


def test_full_stress_changes_answer_with_grad_alpha():
    grid = Grid.cube(12, 0.012)
    bcs = FluidBCs.channel_z()
    # strong alpha gradient (dense bed bottom)
    z = jnp.broadcast_to(jnp.linspace(0.4, 1.0, 12)[None, None, :], grid.shape)
    fs = _pimple_fs(grid, alpha=z.astype(jnp.float32))
    nut = jnp.zeros(grid.shape, jnp.float32)
    g = jnp.zeros(3, jnp.float32)
    on, _ = pimple_step(fs, grid, bcs, 1e-4, nut, g, 1e-4,
                        PIMPLEConfig(n_outer=1, n_correctors=1, pressure=_PCFG,
                                     full_stress=True))
    off, _ = pimple_step(fs, grid, bcs, 1e-4, nut, g, 1e-4,
                         PIMPLEConfig(n_outer=1, n_correctors=1, pressure=_PCFG,
                                      full_stress=False))
    du = float(jnp.max(jnp.abs(on.u - off.u)))
    assert du > 1e-9, "transpose stress term had no effect where grad(alpha) is large"
    assert bool(jnp.all(jnp.isfinite(on.u)))


def test_relaxation_converges_to_same_fixed_point():
    """Under-relaxed outer iterations must approach the unrelaxed answer
    (fixed points unchanged) and stay finite."""
    grid = Grid.cube(10, 0.01)
    bcs = FluidBCs.channel_z()
    fs = _pimple_fs(grid)
    nut = jnp.zeros(grid.shape, jnp.float32)
    g = jnp.zeros(3, jnp.float32)
    base, _ = pimple_step(fs, grid, bcs, 1e-6, nut, g, 1e-4,
                          PIMPLEConfig(n_outer=6, n_correctors=1,
                                       pressure=_PCFG))
    relaxed, _ = pimple_step(fs, grid, bcs, 1e-6, nut, g, 1e-4,
                             PIMPLEConfig(n_outer=6, n_correctors=1,
                                          pressure=_PCFG,
                                          relax_u=0.7, relax_p=0.5))
    np.testing.assert_allclose(np.asarray(relaxed.u), np.asarray(base.u),
                               rtol=0.05, atol=1e-7)


def test_relaxation_factors_loaded(tmp_path):
    from yade_openfoam_coupling_tpu.utils.config import load_pimple, load_pressure_solver
    case = tmp_path / "case"
    (case / "system").mkdir(parents=True)
    (case / "system" / "fvSolution").write_text("""
FoamFile { version 2.0; format ascii; class dictionary; object fvSolution; }
solvers { p { solver GAMG; tolerance 1e-07; relTol 0.05; } }
PIMPLE { nOuterCorrectors 3; nCorrectors 2; }
relaxationFactors
{
    fields { p 0.3; }
    equations { "U.*" 0.7; }
}
""")
    pcfg = load_pressure_solver(case)
    assert pcfg.rel_tol == pytest.approx(0.05)
    assert pcfg.abs_tol == pytest.approx(1e-7)
    pim = load_pimple(case, pcfg)
    assert pim.relax_p == pytest.approx(0.3)
    assert pim.relax_u == pytest.approx(0.7)
    assert pim.n_outer == 3 and pim.n_correctors == 2
