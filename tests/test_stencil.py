"""Stencil-operator unit tests against analytic fields."""

import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.ops import grid as g
from yade_openfoam_coupling_tpu.ops import stencil as st


def make_grid(n=32, L=2 * np.pi):
    return g.Grid.cube(n, L)


def sinusoid(grid):
    X = grid.cell_centers()
    return jnp.sin(X[0]) * jnp.cos(X[1]) * jnp.cos(X[2])


def test_grad_periodic_sinusoid():
    grid = make_grid(48)
    bc = g.FieldBC.periodic()
    f = sinusoid(grid)
    G = st.grad_scalar(f, bc, grid)
    X = grid.cell_centers()
    exact = jnp.stack([
        jnp.cos(X[0]) * jnp.cos(X[1]) * jnp.cos(X[2]),
        -jnp.sin(X[0]) * jnp.sin(X[1]) * jnp.cos(X[2]),
        -jnp.sin(X[0]) * jnp.cos(X[1]) * jnp.sin(X[2]),
    ])
    assert float(jnp.max(jnp.abs(G - exact))) < 5e-3


def test_laplacian_periodic_sinusoid():
    grid = make_grid(48)
    bc = g.FieldBC.periodic()
    f = sinusoid(grid)
    L = st.laplacian(f, bc, grid)
    # lap(sin x cos y cos z) = -3 f
    assert float(jnp.max(jnp.abs(L + 3.0 * f))) < 2e-2


def test_grad_convergence_order():
    """Central differences should be 2nd order."""
    errs = []
    for n in (16, 32):
        grid = make_grid(n)
        f = sinusoid(grid)
        G = st.grad_scalar(f, g.FieldBC.periodic(), grid)
        X = grid.cell_centers()
        exact = jnp.cos(X[0]) * jnp.cos(X[1]) * jnp.cos(X[2])
        errs.append(float(jnp.max(jnp.abs(G[0] - exact))))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.8


def test_div_of_flux_constant_field_zero():
    grid = make_grid(16)
    bc = g.FieldBC.periodic()
    u = jnp.ones((3,) + grid.shape)
    phi = st.flux(u, bc, grid)
    d = st.div_flux(phi, grid)
    assert float(jnp.max(jnp.abs(d))) < 1e-6


def test_div_solenoidal_field():
    """Taylor-Green-type field is divergence-free."""
    grid = make_grid(32)
    bc = g.FieldBC.periodic()
    X = grid.cell_centers()
    u = jnp.stack([
        jnp.sin(X[0]) * jnp.cos(X[1]),
        -jnp.cos(X[0]) * jnp.sin(X[1]),
        jnp.zeros(grid.shape),
    ])
    phi = st.flux(u, bc, grid)
    d = st.div_flux(phi, grid)
    assert float(jnp.max(jnp.abs(d))) < 1e-4  # discrete divergence of linear interp


def test_dirichlet_ghost_face_value():
    """Dirichlet padding makes the face value equal to the BC value."""
    grid = g.Grid.cube(8, 1.0)
    bc = g.FieldBC.box(g.DIRICHLET, 3.0)
    f = jnp.full(grid.shape, 1.0)
    fp = g.pad_scalar(f, bc)
    face = 0.5 * (fp[0, 1:-1, 1:-1] + fp[1, 1:-1, 1:-1])
    np.testing.assert_allclose(np.asarray(face), 3.0, rtol=1e-6)


def test_neumann_ghost_zero_gradient():
    grid = g.Grid.cube(8, 1.0)
    bc = g.FieldBC.box(g.NEUMANN)
    f = jnp.arange(8 * 8 * 8, dtype=jnp.float32).reshape(grid.shape)
    fp = g.pad_scalar(f, bc)
    np.testing.assert_allclose(np.asarray(fp[0, 1:-1, 1:-1]), np.asarray(f[0]))


def test_curl_from_grad():
    """Rigid rotation u = omega x r has curl = 2*omega."""
    grid = make_grid(32, L=1.0)
    bc = g.FieldBC.uniform(g.NEUMANN)
    X = grid.cell_centers()
    omega = jnp.array([0.0, 0.0, 1.5])
    r = X - 0.5
    u = jnp.stack([
        omega[1] * r[2] - omega[2] * r[1],
        omega[2] * r[0] - omega[0] * r[2],
        omega[0] * r[1] - omega[1] * r[0],
    ])
    G = st.grad_vector(u, bc, grid)
    w = st.curl_from_grad(G)
    # interior cells (boundary one-sided values polluted by Neumann pad)
    wc = w[:, 2:-2, 2:-2, 2:-2]
    np.testing.assert_allclose(np.asarray(wc[2]), 3.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(wc[0]), 0.0, atol=1e-3)


def test_reconstruct_roundtrip_linear():
    """reconstruct(flux(u)) == u for a constant field."""
    grid = make_grid(8)
    bc = g.FieldBC.periodic()
    u = jnp.stack([jnp.full(grid.shape, v) for v in (1.0, -2.0, 0.5)])
    rec = st.reconstruct(st.flux(u, bc, grid))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(u), rtol=1e-6)


def test_courant_kernel():
    grid = g.Grid.cube(4, 1.0)
    bc = g.FieldBC.periodic()
    u = jnp.stack([
        jnp.full(grid.shape, 2.0),
        jnp.zeros(grid.shape),
        jnp.zeros(grid.shape),
    ])
    phi = st.flux(u, bc, grid)
    s = st.surface_sum_abs_over_V(phi, grid)
    # |u|*2 faces / h = 2*2/0.25 = 16 ; Co = 0.5*16*dt
    np.testing.assert_allclose(np.asarray(s), 16.0, rtol=1e-6)
