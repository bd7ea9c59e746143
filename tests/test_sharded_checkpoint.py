"""Checkpoint round-trip through the sharded (lo-face) state layout."""

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
from yade_openfoam_coupling_tpu.parallel import make_mesh
from yade_openfoam_coupling_tpu.parallel import sharded as sh
from yade_openfoam_coupling_tpu.utils import checkpoint as ckpt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_run_checkpoint_resume(tmp_path):
    from tests.test_sharding import _settling_cfg, _initial_state

    cfg = _settling_cfg()
    state = _initial_state(cfg, [[4e-3, 4e-3, 6e-3]], 50e-6)
    mesh = make_mesh(8)
    sstate = sh.to_sharded_state(state, cfg, mesh)
    step = sh.make_sharded_scan(cfg, mesh, 3)
    out, _ = step(sstate)

    # checkpoint the sharded-layout state (device_get handles sharding)
    ckpt.save(tmp_path / "ck", out)
    template = jax.tree.map(jnp.zeros_like, jax.device_get(out))
    restored = ckpt.restore(tmp_path / "ck", template)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out.fluid.u)),
        np.asarray(restored.fluid.u), rtol=1e-6,
    )

    # resume: re-place on the mesh and continue
    resumed = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s.sharding),
        restored, jax.device_get(out) if False else out,
    )
    out2, diags = step(resumed)
    assert bool(jnp.all(jnp.isfinite(out2.fluid.u)))
    assert int(diags.n_found[-1]) == 1
