"""Chunked (memory-bounded) coupling matches the unchunked path."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops.grid import Grid

PER = (True, True, False)


def test_chunked_matches_unchunked():
    grid = Grid.cube(16, 0.016)
    rng = np.random.RandomState(0)
    N = 64
    pos = jnp.asarray(rng.uniform(0.002, 0.014, (N, 3)), jnp.float32)
    pf = cp.ParticleFields(
        pos=pos,
        vel=jnp.asarray(rng.normal(0, 0.01, (N, 3)), jnp.float32),
        angvel=jnp.zeros((N, 3)),
        radius=jnp.full((N,), 4e-4),
        active=jnp.ones((N,), bool).at[-3:].set(False),
    )
    rngf = lambda shape: jnp.asarray(rng.normal(0, 1e-3, shape), jnp.float32)
    U = rngf((3,) + grid.shape)
    gp, dtau, ddtu, curl = (rngf((3,) + grid.shape) for _ in range(4))
    prev_alpha = jnp.asarray(1.0 - 0.02 * rng.rand(*grid.shape), jnp.float32)

    cfg1 = cp.CouplingConfig(gaussian=True, lag_alpha=True, particle_chunks=1)
    cfg4 = dataclasses.replace(cfg1, particle_chunks=4)

    r1 = cp.gaussian_coupling(
        pf, U, gp, dtau, ddtu, curl, grid, PER, 1e-6, 1000.0, 1e-4, cfg1,
        prev_alpha=prev_alpha,
    )
    r4 = cp.gaussian_coupling_chunked(
        pf, U, gp, dtau, ddtu, curl, grid, PER, 1e-6, 1000.0, 1e-4, cfg4,
        prev_alpha=prev_alpha,
    )

    np.testing.assert_allclose(np.asarray(r4.force), np.asarray(r1.force),
                               rtol=1e-4, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r4.alpha), np.asarray(r1.alpha),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r4.u_particle), np.asarray(r1.u_particle),
                               rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r4.u_source), np.asarray(r1.u_source),
                               rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(np.asarray(r4.u_source_drag),
                               np.asarray(r1.u_source_drag), rtol=1e-4, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(r4.found), np.asarray(r1.found))


def test_sphere2_stencil_close_to_cube27():
    """The 19-cell support approximates the 27-cell one (both renormalize;
    corners carry the smallest weights)."""
    grid = Grid.cube(16, 0.016)
    rng = np.random.RandomState(1)
    N = 32
    pf = cp.ParticleFields(
        pos=jnp.asarray(rng.uniform(0.003, 0.013, (N, 3)), jnp.float32),
        vel=jnp.zeros((N, 3)),
        angvel=jnp.zeros((N, 3)),
        radius=jnp.full((N,), 4e-4),
        active=jnp.ones((N,), bool),
    )
    U = jnp.zeros((3,) + grid.shape).at[0].set(0.01)
    z = jnp.zeros((3,) + grid.shape)
    args = (pf, U, z, z, z, z, grid, PER, 1e-6, 1000.0, 1e-4)
    r27 = cp.gaussian_coupling(*args, cp.CouplingConfig(gaussian=True))
    r19 = cp.gaussian_coupling(
        *args, cp.CouplingConfig(gaussian=True, stencil_shape="sphere2")
    )
    assert cp.stencil_offsets(
        cp.CouplingConfig(stencil_shape="sphere2")
    ).shape[0] == 19
    np.testing.assert_allclose(
        np.asarray(r19.force), np.asarray(r27.force), rtol=0.08, atol=1e-12
    )
    # same total deposited particle volume (weights normalized)
    v27 = float(jnp.sum((1.0 - r27.alpha)))
    v19 = float(jnp.sum((1.0 - r19.alpha)))
    np.testing.assert_allclose(v19, v27, rtol=0.02)
