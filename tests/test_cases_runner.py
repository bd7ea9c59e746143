"""Case builders, host runner, and CLI smoke tests (tiny sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu import cases
from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models import runner
from yade_openfoam_coupling_tpu.utils.config import RunControls


def _run_steps(cfg, state, n=3):
    step = cd.make_step_fn(cfg)
    for _ in range(n):
        state, diag = step(state)
    return state, diag


def test_settling_sphere_builder():
    cfg, state, dt = cases.settling_sphere(n=8)
    state, diag = _run_steps(cfg, state)
    assert bool(jnp.all(jnp.isfinite(state.fluid.u)))
    assert int(diag.n_found) == 1


def test_sedimentation_cloud_builder():
    cfg, state, dt = cases.sedimentation_cloud(n_particles=20, n=8)
    state, diag = _run_steps(cfg, state)
    assert bool(jnp.all(jnp.isfinite(state.particles.pos)))
    assert int(diag.n_found) == 20
    # cloud is sinking
    assert float(jnp.mean(state.particles.vel[:20, 2])) < 0.0


def test_fluidized_bed_builder():
    cfg, state, dt = cases.fluidized_bed(n_particles=50, n=12)
    state, diag = _run_steps(cfg, state, n=2)
    assert bool(jnp.all(jnp.isfinite(state.fluid.u)))
    assert float(jnp.min(state.fluid.alpha)) < 1.0


def test_runner_writes_and_checkpoints(tmp_path):
    cfg, state, dt = cases.settling_sphere(n=8)
    rc = RunControls(dt=dt, end_time=float(state.t) + 12 * dt,
                     write_interval=4 * dt)
    res = runner.run(
        cfg, state, rc, chunk=4,
        case_dir=str(tmp_path / "case"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert res.steps >= 12
    assert len(res.wrote) >= 1
    from yade_openfoam_coupling_tpu.utils import checkpoint as ckpt
    assert ckpt.latest_step(tmp_path / "ck") is not None
    # resume round-trip
    template = jax.tree.map(jnp.zeros_like, res.state)
    restored = ckpt.restore(tmp_path / "ck", template)
    np.testing.assert_allclose(float(restored.t), float(res.state.t))


def test_cli_smoke(tmp_path, capsys):
    (tmp_path / "system").mkdir()
    (tmp_path / "constant").mkdir()
    (tmp_path / "system/controlDict").write_text(
        "deltaT 1e-4; endTime 4e-4; writeInterval 1; maxCo 0.5;"
    )
    (tmp_path / "system/blockMeshDict").write_text(
        "vertices ( (0 0 0) (0.008 0 0) (0.008 0.008 0) (0 0.008 0)"
        " (0 0 0.008) (0.008 0 0.008) (0.008 0.008 0.008) (0 0.008 0.008) );"
        " blocks ( hex (0 1 2 3 4 5 6 7) (8 8 8) simpleGrading (1 1 1) );"
    )
    (tmp_path / "constant/transportProperties").write_text(
        "nu nu [0 2 -1 0 0 0 0] 1e-06; partDensity 2500; fluidDensity 1000;"
    )
    from yade_openfoam_coupling_tpu.cli import main

    rc = main([
        "icofoam", str(tmp_path),
        "--random-particles", "4", "--radius", "1e-4",
        "--chunk", "2", "--max-steps", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "End" in out


def test_cli_fast_smoke(tmp_path, capsys):
    """--fast: the flagship planes/fused-kernel pipeline driven from an
    OpenFOAM case dir (pimplefoam)."""
    (tmp_path / "system").mkdir()
    (tmp_path / "constant").mkdir()
    (tmp_path / "system/controlDict").write_text(
        "deltaT 1e-4; endTime 4e-4; writeInterval 1; maxCo 0.5;"
    )
    (tmp_path / "system/blockMeshDict").write_text(
        "vertices ( (0 0 0) (0.008 0 0) (0.008 0.008 0) (0 0.008 0)"
        " (0 0 0.008) (0.008 0 0.008) (0.008 0.008 0.008) (0 0.008 0.008) );"
        " blocks ( hex (0 1 2 3 4 5 6 7) (8 8 8) simpleGrading (1 1 1) );"
    )
    (tmp_path / "constant/transportProperties").write_text(
        "nu nu [0 2 -1 0 0 0 0] 1e-06; partDensity 2500; fluidDensity 1000;"
    )
    from yade_openfoam_coupling_tpu.cli import main

    rc = main([
        "pimplefoam", str(tmp_path), "--fast",
        "--random-particles", "8", "--radius", "1e-4",
        "--chunk", "2", "--max-steps", "4", "--dem-substeps", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "End" in out
