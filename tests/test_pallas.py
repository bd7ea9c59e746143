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


def test_solve_pressure_use_pallas_matches():
    """The use_pallas production path (interpret mode off-TPU) must solve
    to the same answer as the pure-JAX matvec."""
    from yade_openfoam_coupling_tpu.ops import pressure as pr

    grid = g.Grid.cube(16, 1.0)
    bc = g.FieldBC.uniform(g.NEUMANN)
    gamma = 1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(1), grid.shape)
    gamma_f = st.face_interp(gamma, g.FieldBC.uniform(g.NEUMANN), grid)
    rhs = jax.random.normal(jax.random.PRNGKey(2), grid.shape)
    rhs = rhs - jnp.mean(rhs)

    base = pr.solve_pressure(
        gamma_f, rhs, jnp.zeros_like(rhs), grid, bc,
        pr.PressureSolverConfig(solver="mgpcg", tol=1e-6, maxiter=100),
    )
    pal = pr.solve_pressure(
        gamma_f, rhs, jnp.zeros_like(rhs), grid, bc,
        pr.PressureSolverConfig(solver="mgpcg", tol=1e-6, maxiter=100,
                                use_pallas=True),
    )
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(base.x),
                               rtol=1e-3, atol=1e-5)
    assert abs(int(pal.iters) - int(base.iters)) <= 2


def test_pallas_roll_distribute_matches_jax():
    """distribute_rolls_pallas == the sequential jnp.roll accumulation."""
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops.pallas_rolls import distribute_rolls_pallas

    cfg = cp.CouplingConfig(gaussian=True, stencil_shape="sphere2")
    offsets = cp.stencil_offsets(cfg)
    S, C = len(offsets), 8
    shape = (8, 16, 32)
    bufT = jax.random.normal(jax.random.PRNGKey(2), (S, C) + shape)

    expect = jnp.zeros((C,) + shape)
    for o in range(S):
        dx, dy, dz = (int(v) for v in offsets[o])
        expect = expect + jnp.roll(bufT[o], (dx, dy, dz), axis=(1, 2, 3))
    got = distribute_rolls_pallas(bufT, offsets, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)
