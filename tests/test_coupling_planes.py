"""Plane-dense exchange (Pallas kernels, interpret mode): equivalence with
the sparse plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import coupling_planes as cpp
from yade_openfoam_coupling_tpu.ops.grid import Grid


def _fields(grid, seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rng.randn(*s) * 1e-2, jnp.float32)
    return (f(3, *grid.shape), f(3, *grid.shape), f(3, *grid.shape),
            f(3, *grid.shape), f(3, *grid.shape))


def _particles(grid, n, seed=1, pad=0):
    rng = np.random.RandomState(seed)
    lo = [grid.origin[a] + 0.08 * grid.lengths[a] for a in range(3)]
    hi = [grid.origin[a] + 0.92 * grid.lengths[a] for a in range(3)]
    pos = rng.uniform(lo, hi, (n, 3))
    vel = jnp.asarray(rng.randn(n + pad, 3) * 1e-3, jnp.float32)
    ang = jnp.asarray(rng.randn(n + pad, 3) * 1e-2, jnp.float32)
    posp = jnp.concatenate(
        [jnp.asarray(pos, jnp.float32),
         jnp.zeros((pad, 3), jnp.float32)])
    radius = jnp.full((n + pad,), 4e-4, jnp.float32)
    active = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    return cp.ParticleFields(posp, vel, ang, radius, active)


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("periodic", [(True, True, False), (False, False, False)])
def test_planes_matches_sparse(periodic, fast):
    """fast=True turns on the round-3 kernel/unbin variants together
    (dy_in_kernel + packed_unbin; cap=4 so zp=8 divides ncells and the
    packed unbin actually engages)."""
    grid = Grid.cube(12, 0.012)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2",
                            exchange="planes",
                            slot_capacity=4 if fast else 6,
                            dy_in_kernel=fast, packed_unbin=fast)
    pf = _particles(grid, 40, pad=3)
    u, gp, dtau, ddtu, curl = _fields(grid)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97

    sparse = cp.gaussian_coupling(pf, u, gp, dtau, ddtu, curl, grid,
                                  periodic, 1e-6, 1000.0, 1e-4, cfg,
                                  prev_alpha=prev_alpha)
    planes = cpp.gaussian_coupling_planes(pf, u, gp, dtau, ddtu, curl, grid,
                                          periodic, 1e-6, 1000.0, 1e-4, cfg,
                                          prev_alpha=prev_alpha,
                                          interpret=True)

    assert int(planes.n_overflow) == 0
    np.testing.assert_array_equal(np.asarray(planes.found),
                                  np.asarray(sparse.found))
    np.testing.assert_allclose(np.asarray(planes.alpha),
                               np.asarray(sparse.alpha), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(planes.u_particle),
                               np.asarray(sparse.u_particle),
                               rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(planes.u_source_drag),
                               np.asarray(sparse.u_source_drag),
                               rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(planes.u_source),
                               np.asarray(sparse.u_source),
                               rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(planes.force),
                               np.asarray(sparse.force), rtol=2e-4, atol=1e-12)


@pytest.mark.parametrize("layout", [True, "col"])
def test_bin_staging_layouts_match(layout):
    """z4-packed and column-scatter staging produce the identical
    channel-major slot planes as the row layout (CouplingConfig.packed_bin)."""
    grid = Grid.cube(8, 0.008)
    pf = _particles(grid, 60, pad=4)
    row = cpp.bin_particles_planes(pf, grid, cap=4)
    alt = cpp.bin_particles_planes(pf, grid, cap=4, packed_bin=layout)
    np.testing.assert_array_equal(np.asarray(row.D), np.asarray(alt.D))
    np.testing.assert_array_equal(np.asarray(row.keep), np.asarray(alt.keep))


def test_planes_overflow_counted():
    grid = Grid.cube(8, 0.008)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2",
                            exchange="planes", slot_capacity=1)
    # 5 particles in the same cell: 4 overflow with cap=1
    pos = np.tile(np.array([[0.0042, 0.0042, 0.0042]]), (5, 1))
    pf = cp.ParticleFields(
        jnp.asarray(pos, jnp.float32), jnp.zeros((5, 3)), jnp.zeros((5, 3)),
        jnp.full((5,), 4e-4, jnp.float32), jnp.ones(5, bool))
    u = jnp.zeros((3,) + grid.shape)
    res = cpp.gaussian_coupling_planes(
        pf, u, u, u, u, u, grid, (False, False, False), 1e-6, 1000.0, 1e-4,
        cfg, prev_alpha=jnp.ones(grid.shape), interpret=True)
    assert int(res.n_overflow) == 4
    assert int(jnp.sum(res.found.astype(jnp.int32))) == 1


@pytest.mark.parametrize("fused", [True, False])
def test_planes_torque_matches_sparse(fused):
    """Torque mode under the planes exchange (angvel binned as 3 extra
    channels, curl interpolated per slot): per-particle force AND torque
    match the sparse path."""
    grid = Grid.cube(12, 0.012)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2",
                            exchange="planes", slot_capacity=6,
                            use_torque=True, fused_planes=fused)
    pf = _particles(grid, 40, pad=3)
    u, gp, dtau, ddtu, curl = _fields(grid)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97
    periodic = (True, True, False)

    sparse = cp.gaussian_coupling(pf, u, gp, dtau, ddtu, curl, grid,
                                  periodic, 1e-6, 1000.0, 1e-4, cfg,
                                  prev_alpha=prev_alpha)
    planes = cpp.gaussian_coupling_planes(pf, u, gp, dtau, ddtu, curl, grid,
                                          periodic, 1e-6, 1000.0, 1e-4, cfg,
                                          prev_alpha=prev_alpha,
                                          interpret=True)
    assert int(planes.n_overflow) == 0
    np.testing.assert_array_equal(np.asarray(planes.found),
                                  np.asarray(sparse.found))
    np.testing.assert_allclose(np.asarray(planes.force),
                               np.asarray(sparse.force), rtol=2e-4,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(planes.torque),
                               np.asarray(sparse.torque), rtol=2e-4,
                               atol=1e-12)
    assert float(jnp.max(jnp.abs(planes.torque))) > 0.0


@pytest.mark.parametrize("packed_bin", [False, "col"])
@pytest.mark.parametrize("periodic", [(True, True, False), (False, False, False)])
def test_chunked_planes_matches_monolithic(periodic, packed_bin):
    """Slab-chunked exchange (the 256^3 memory-bounding path): identical
    results to the monolithic planes pipeline, including cross-chunk halo
    deposits and the windowed unbin. 'col' additionally covers the clipped
    negative window cells of the column-scatter staging."""
    import dataclasses
    grid = Grid.cube(16, 0.016)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2",
                            exchange="planes", slot_capacity=6)
    cfg_c = dataclasses.replace(cfg, planes_chunks=4, packed_bin=packed_bin)
    pf = _particles(grid, 120, pad=8)
    u, gp, dtau, ddtu, curl = _fields(grid)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97

    mono = cpp.gaussian_coupling_planes(pf, u, gp, dtau, ddtu, curl, grid,
                                        periodic, 1e-6, 1000.0, 1e-4, cfg,
                                        prev_alpha=prev_alpha,
                                        interpret=True)
    chunk = cpp.gaussian_coupling_planes_chunked(
        pf, u, gp, dtau, ddtu, curl, grid, periodic, 1e-6, 1000.0, 1e-4,
        cfg_c, prev_alpha=prev_alpha, interpret=True)

    assert int(chunk.n_overflow) == int(mono.n_overflow) == 0
    np.testing.assert_array_equal(np.asarray(chunk.found),
                                  np.asarray(mono.found))
    for name in ("alpha", "u_particle", "u_source", "u_source_drag"):
        np.testing.assert_allclose(
            np.asarray(getattr(chunk, name)),
            np.asarray(getattr(mono, name)), rtol=2e-5, atol=1e-7,
            err_msg=name)
    np.testing.assert_allclose(np.asarray(chunk.force),
                               np.asarray(mono.force), rtol=2e-4, atol=1e-10)


def test_deposit_kernel_dy_in_kernel_matches():
    """Two-kernel pipeline (fused_planes=False): in-kernel dy rolls give
    the identical deposited fields as the epilogue rolls."""
    import dataclasses
    grid = Grid.cube(10, 0.010)
    pf = _particles(grid, 50, pad=2)
    u, gp, dtau, ddtu, curl = _fields(grid)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.95
    base = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                             stencil_shape="sphere2", exchange="planes",
                             slot_capacity=6, fused_planes=False)
    out = {}
    for dyk in (False, True):
        cfg = dataclasses.replace(base, dy_in_kernel=dyk)
        out[dyk] = cpp.gaussian_coupling_planes(
            pf, u, gp, dtau, ddtu, curl, grid, (True, True, False),
            1e-6, 1000.0, 1e-4, cfg, prev_alpha=prev_alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(out[True].u_source),
                               np.asarray(out[False].u_source),
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out[True].alpha),
                               np.asarray(out[False].alpha),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out[True].force),
                               np.asarray(out[False].force),
                               rtol=1e-6, atol=1e-12)


def test_unbin_gather_matches_select_paths():
    """cfg.unbin_gather (flat per-channel 1-D gathers) must equal both the
    transpose-select and packed_unbin repack paths exactly."""
    rng = np.random.RandomState(11)
    n_res, cap, ncells, N = 4, 4, 4096, 300
    per = jnp.asarray(rng.randn(n_res, cap, ncells), jnp.float32)
    cell = jnp.asarray(
        np.where(rng.rand(N) < 0.1, ncells, rng.randint(0, ncells, N)),
        jnp.int32)
    rank = jnp.asarray(rng.randint(0, cap + 2, N), jnp.int32)
    keep = (rank < cap) & (cell < ncells)

    def run(**kw):
        cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True, **kw)
        return np.asarray(cpp._unbin_rows(per, cell, rank, keep, ncells,
                                          cfg))

    base = run()
    packed = run(packed_unbin=True)
    gathered = run(unbin_gather=True)
    np.testing.assert_allclose(packed, base, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(gathered, base)
