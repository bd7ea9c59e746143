"""Pallas fused Laplacian kernel vs the reference JAX composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.ops import grid as g
from yade_openfoam_coupling_tpu.ops import stencil as st
from yade_openfoam_coupling_tpu.ops.grid import pad_scalar
from yade_openfoam_coupling_tpu.ops.pallas_stencil import laplacian_facegamma_pallas


@pytest.mark.parametrize("bc_kind", ["periodic", "walls"])
def test_pallas_laplacian_matches_jax(bc_kind):
    grid = g.Grid.box((16, 16, 32), (1.0, 2.0, 1.5))
    if bc_kind == "periodic":
        bc = g.FieldBC.periodic()
    else:
        bc = g.FieldBC.box(g.NEUMANN)
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, grid.shape)
    gamma = 1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(1), grid.shape)
    gamma_f = st.face_interp(gamma, g.FieldBC.uniform(g.NEUMANN), grid)

    pp = pad_scalar(p, bc)
    expect = st.laplacian_facegamma_padded(gamma_f, pp, grid)
    got = laplacian_facegamma_pallas(gamma_f, pp, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-4)
