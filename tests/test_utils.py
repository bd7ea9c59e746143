"""Utils tests: foam dictionary parsing, case loading, checkpoint round-trip."""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.utils import checkpoint as ckpt
from yade_openfoam_coupling_tpu.utils import foamdict as fd


def test_foamdict_basic():
    d = fd.parse(textwrap.dedent("""
        // a comment
        FoamFile { version 2.0; format ascii; object controlDict; }
        application icoFoamYade;   /* inline */
        deltaT 1e-05;
        endTime 0.5;
        adjustTimeStep yes;
        maxCo 0.8;
        writeInterval 20;
    """))
    assert d["application"] == "icoFoamYade"
    assert d["deltaT"] == 1e-5
    assert d["endTime"] == 0.5
    assert d["adjustTimeStep"] is True
    assert d["FoamFile"]["version"] == 2.0


def test_foamdict_dimensioned_and_vectors():
    d = fd.parse(textwrap.dedent("""
        nu              nu [ 0 2 -1 0 0 0 0 ] 1e-06;
        partDensity     partDensity [1 -3 0 0 0 0 0] 2650.0;
        g               (0 0 -9.81);
        value           uniform (1 2 3);
    """))
    assert d["nu"] == 1e-6
    assert d["partDensity"] == 2650.0
    assert d["g"] == [0, 0, -9.81]
    assert d["value"] == [1, 2, 3]


def test_foamdict_nested():
    d = fd.parse(textwrap.dedent("""
        solvers {
            p {
                solver GAMG;
                tolerance 1e-06;
                relTol 0.05;
            }
            U { solver smoothSolver; }
        }
        PISO { nCorrectors 2; nNonOrthogonalCorrectors 0; }
    """))
    assert fd.get(d, "solvers.p.solver") == "GAMG"
    assert fd.get(d, "solvers.p.tolerance") == 1e-6
    assert fd.get(d, "PISO.nCorrectors") == 2
    assert fd.get(d, "missing.path", 42) == 42


def test_load_case(tmp_path):
    (tmp_path / "system").mkdir()
    (tmp_path / "constant").mkdir()
    (tmp_path / "0").mkdir()
    (tmp_path / "system/controlDict").write_text(
        "deltaT 2e-4; endTime 0.1; writeInterval 0.01; adjustTimeStep no; maxCo 0.4;"
    )
    (tmp_path / "system/fvSolution").write_text(
        "solvers { p { solver GAMG; tolerance 1e-07; relTol 0; } }"
        " PISO { nCorrectors 3; } PIMPLE { nOuterCorrectors 2; nCorrectors 1; }"
    )
    (tmp_path / "system/blockMeshDict").write_text(
        "convertToMeters 0.01; vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)"
        " (0 0 1) (1 0 1) (1 1 1) (0 1 1) );"
        " blocks ( hex (0 1 2 3 4 5 6 7) (16 16 16) simpleGrading (1 1 1) );"
    )
    (tmp_path / "constant/transportProperties").write_text(
        "nu nu [0 2 -1 0 0 0 0] 1.5e-06;"
        " partDensity partDensity [1 -3 0 0 0 0 0] 2650;"
        " fluidDensity fluidDensity [1 -3 0 0 0 0 0] 998;"
    )
    (tmp_path / "constant/turbulenceProperties").write_text(
        "simulationType RAS; RAS { RASModel kEpsilon; turbulence on; }"
    )
    (tmp_path / "constant/g").write_text(
        "dimensions [0 1 -2 0 0 0 0]; value (0 0 -9.81);"
    )
    (tmp_path / "0/U").write_text(
        "boundaryField { top { type fixedValue; value uniform (0 0 0); }"
        " bottom { type noSlip; } left { type cyclic; } right { type cyclic; } }"
    )
    (tmp_path / "0/p").write_text(
        "boundaryField { top { type zeroGradient; } bottom { type zeroGradient; } }"
    )

    from yade_openfoam_coupling_tpu.utils.config import load_case

    cfg, rc = load_case(tmp_path, solver="pimple")
    assert cfg.grid.shape == (16, 16, 16)
    np.testing.assert_allclose(cfg.grid.lengths, (0.01, 0.01, 0.01))
    assert cfg.transport.nu == 1.5e-6
    assert cfg.transport.rho_p == 2650
    assert cfg.transport.rho_f == 998
    assert cfg.turbulence.model == "kEpsilon"
    # fvSolution 'tolerance' is absolute in OpenFOAM -> maps to abs_tol
    assert cfg.pimple.pressure.abs_tol == 1e-7
    assert cfg.piso.n_correctors == 3
    assert cfg.pimple.n_outer == 2
    assert cfg.gravity_fluid == (0.0, 0.0, -9.81)
    assert rc.dt == 2e-4
    assert rc.end_time == 0.1
    # BCs: x periodic (cyclic), z walls
    assert cfg.bcs.u.is_periodic(0)
    assert not cfg.bcs.u.is_periodic(2)


def _tiny_state():
    from yade_openfoam_coupling_tpu.models.fields import (
        SimState,
        make_fluid_state,
        make_particle_state,
        make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    grid = Grid.cube(8, 1.0)
    return SimState(
        fluid=make_fluid_state(grid)._replace(p=jnp.ones(grid.shape) * 2.5),
        particles=make_particle_state(pos=[[0.5, 0.5, 0.5]], radius=0.01, capacity=4),
        turb=make_turbulence_state(grid),
        t=jnp.float32(1.25),
        dt=jnp.float32(1e-3),
        step=jnp.int32(42),
    )


def test_checkpoint_roundtrip(tmp_path):
    state = _tiny_state()
    snap = ckpt.save(tmp_path / "ck", state)
    assert ckpt.latest_step(tmp_path / "ck") == 42

    import jax
    template = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore(tmp_path / "ck", template)
    np.testing.assert_allclose(np.asarray(restored.fluid.p), 2.5)
    assert float(restored.t) == 1.25
    assert int(restored.step) == 42
    np.testing.assert_allclose(
        np.asarray(restored.particles.pos[0]), [0.5, 0.5, 0.5]
    )


def test_write_time_dir(tmp_path):
    state = _tiny_state()
    out = ckpt.write_time_dir(tmp_path, state)
    assert (tmp_path / "1.25" / "p").exists()
    assert (tmp_path / "1.25" / "U").exists()
    txt = (tmp_path / "1.25" / "p").read_text()
    assert "volScalarField" in txt and "512" in txt
    pts = np.loadtxt(tmp_path / "1.25" / "particles.xyz")
    np.testing.assert_allclose(pts, [0.5, 0.5, 0.5])
