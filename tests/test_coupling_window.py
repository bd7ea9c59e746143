"""Window-staged exchange (`ops/coupling_window.py`, interpret mode):
equivalence with the sparse plumbing and the slot-planes pipeline, plus
the window-overflow contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import coupling_planes as cpp
from yade_openfoam_coupling_tpu.ops import coupling_window as cw
from yade_openfoam_coupling_tpu.ops.grid import Grid

from test_coupling_planes import _fields, _particles


def _run_all(pf, grid, periodic, cfg, prev_alpha, seed=0):
    u, gp, dtau, ddtu, curl = _fields(grid, seed=seed)
    args = (pf, u, gp, dtau, ddtu, curl, grid, periodic, 1e-6, 1000.0,
            1e-4, cfg)
    sparse = cp.gaussian_coupling(*args, prev_alpha=prev_alpha)
    window = cw.gaussian_coupling_window(*args, prev_alpha=prev_alpha,
                                         interpret=True)
    return sparse, window


@pytest.mark.parametrize("dyk", [False, True])
@pytest.mark.parametrize("periodic", [(True, True, False),
                                      (False, False, False)])
def test_window_matches_sparse(periodic, dyk):
    grid = Grid.cube(12, 0.012)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2", exchange="window",
                            slot_capacity=6, dy_in_kernel=dyk)
    pf = _particles(grid, 40, pad=3)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97
    sparse, window = _run_all(pf, grid, periodic, cfg, prev_alpha)

    assert int(window.n_overflow) == 0
    np.testing.assert_array_equal(np.asarray(window.found),
                                  np.asarray(sparse.found))
    np.testing.assert_allclose(np.asarray(window.alpha),
                               np.asarray(sparse.alpha), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(window.u_particle),
                               np.asarray(sparse.u_particle),
                               rtol=3e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(window.u_source_drag),
                               np.asarray(sparse.u_source_drag),
                               rtol=3e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(window.u_source),
                               np.asarray(sparse.u_source),
                               rtol=3e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(window.force),
                               np.asarray(sparse.force), rtol=3e-4,
                               atol=1e-12)


def test_window_matches_planes_torque():
    """Torque mode: angular velocity rides as extra (hi, lo) window
    channels; compare against the slot-planes path bit-for-bit-ish."""
    grid = Grid.cube(10, 0.010)
    periodic = (True, True, False)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2", exchange="window",
                            slot_capacity=4, use_torque=True)
    pf = _particles(grid, 30, pad=2)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97
    u, gp, dtau, ddtu, curl = _fields(grid, seed=2)
    args = (pf, u, gp, dtau, ddtu, curl, grid, periodic, 1e-6, 1000.0,
            1e-4, cfg)
    planes = cpp.gaussian_coupling_planes(*args, prev_alpha=prev_alpha,
                                          interpret=True)
    window = cw.gaussian_coupling_window(*args, prev_alpha=prev_alpha,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(window.found),
                                  np.asarray(planes.found))
    for name in ("alpha", "u_particle", "u_source", "u_source_drag",
                 "force", "torque"):
        np.testing.assert_allclose(
            np.asarray(getattr(window, name)),
            np.asarray(getattr(planes, name)), rtol=3e-4, atol=1e-10,
            err_msg=name)


def test_window_overflow_contract():
    """A window smaller than one plane's population: the excess particles
    are counted in n_overflow and read found=False with zero force, and
    every in-window particle still matches the sparse result."""
    grid = Grid.cube(8, 0.008)
    periodic = (True, True, False)
    n = 40
    rng = np.random.RandomState(4)
    # all particles on ONE x-plane (plane 3), random y/z
    pos = np.stack([
        np.full(n, grid.origin[0] + 3.5 * grid.spacing[0]),
        rng.uniform(grid.origin[1] + 0.1 * grid.lengths[1],
                    grid.origin[1] + 0.9 * grid.lengths[1], n),
        rng.uniform(grid.origin[2] + 0.1 * grid.lengths[2],
                    grid.origin[2] + 0.9 * grid.lengths[2], n),
    ], -1)
    pf = cp.ParticleFields(
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(rng.randn(n, 3) * 1e-3, jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.full((n,), 3e-4, jnp.float32),
        jnp.ones((n,), bool))
    # slot_capacity 8: at 40 particles over 64 (y,z) cells a cap of 4
    # takes occasional slot overflows too — this test isolates the WINDOW
    # contract, so keep slots roomy
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2", exchange="window",
                            slot_capacity=8, planes_window=32)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97
    u, gp, dtau, ddtu, curl = _fields(grid, seed=5)
    args = (pf, u, gp, dtau, ddtu, curl, grid, periodic, 1e-6, 1000.0,
            1e-4, cfg)
    sparse = cp.gaussian_coupling(*args, prev_alpha=prev_alpha)
    window = cw.gaussian_coupling_window(*args, prev_alpha=prev_alpha,
                                         interpret=True)
    assert int(window.n_overflow) == n - 32
    found_w = np.asarray(window.found)
    assert found_w.sum() == 32
    dropped = ~found_w
    np.testing.assert_array_equal(np.asarray(window.force)[dropped], 0.0)
    kept = found_w & np.asarray(sparse.found)
    np.testing.assert_allclose(np.asarray(window.force)[kept],
                               np.asarray(sparse.force)[kept],
                               rtol=3e-4, atol=1e-12)


def test_window_size_auto():
    assert cw.window_size(100_000, 128, 0) == 2048
    assert cw.window_size(100, 128, 0) == 512
    assert cw.window_size(100_000, 128, 777) == 777
    # above the chunking threshold, requested sizes round up to 512 lanes
    assert cw.window_size(1_000_000, 256, 10_000) == 10_240


def test_window_dynamic_counts_match_static():
    """The dynamic per-plane trip-count staging loop (window_dynamic,
    default) must be bitwise-equivalent to the static W/w_chunk loop:
    skipped chunks hold only rows past the plane's population, which carry
    y = -1 and contribute nothing. Distribution stresses the skip logic:
    empty planes, a full plane, and a window-overflowing plane."""
    grid = Grid.cube(8, 0.008)
    periodic = (True, True, False)
    n = 48
    rng = np.random.RandomState(7)
    # plane 1: 40 particles (> planes_window 32 -> overflow); plane 5: 8;
    # all other planes empty
    px = np.concatenate([np.full(40, 1.5), np.full(8, 5.5)])
    pos = np.stack([
        grid.origin[0] + px * grid.spacing[0],
        rng.uniform(grid.origin[1] + 0.1 * grid.lengths[1],
                    grid.origin[1] + 0.9 * grid.lengths[1], n),
        rng.uniform(grid.origin[2] + 0.1 * grid.lengths[2],
                    grid.origin[2] + 0.9 * grid.lengths[2], n),
    ], -1)
    pf = cp.ParticleFields(
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(rng.randn(n, 3) * 1e-3, jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.full((n,), 3e-4, jnp.float32),
        jnp.ones((n,), bool))
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97
    u, gp, dtau, ddtu, curl = _fields(grid, seed=9)
    base = dict(gaussian=True, lag_alpha=True, stencil_shape="sphere2",
                slot_capacity=8, exchange="window", planes_window=32)
    cfg_dyn = cp.CouplingConfig(**base, window_dynamic=True)
    cfg_sta = cp.CouplingConfig(**base, window_dynamic=False)
    args = (pf, u, gp, dtau, ddtu, curl, grid, periodic, 1e-6, 1000.0,
            1e-4)
    dyn = cw.gaussian_coupling_window(*args, cfg_dyn, prev_alpha=prev_alpha,
                                      interpret=True, w_chunk=16)
    sta = cw.gaussian_coupling_window(*args, cfg_sta, prev_alpha=prev_alpha,
                                      interpret=True, w_chunk=16)
    assert int(dyn.n_overflow) == int(sta.n_overflow) == 40 - 32
    for name in ("found", "alpha", "force", "u_particle", "u_source",
                 "u_source_drag"):
        np.testing.assert_array_equal(np.asarray(getattr(dyn, name)),
                                      np.asarray(getattr(sta, name)),
                                      err_msg=name)


def test_window_chunked_staging_matches_unchunked():
    """The fori_loop W-chunked staging path (the 256^3 VMEM fix) must be
    bitwise-equivalent to single-shot staging: same one-hot matmuls, only
    the accumulation order over disjoint window rows differs (each window
    row lands in exactly one (y, z, rank) slot, so chunk-sum order cannot
    change any slot value)."""
    grid = Grid.cube(12, 0.012)
    periodic = (True, True, False)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2", exchange="window",
                            slot_capacity=6, dy_in_kernel=True)
    pf = _particles(grid, 40, pad=3)
    prev_alpha = jnp.ones(grid.shape, jnp.float32) * 0.97
    u, gp, dtau, ddtu, curl = _fields(grid, seed=0)
    args = (pf, u, gp, dtau, ddtu, curl, grid, periodic, 1e-6, 1000.0,
            1e-4, cfg)
    # W = 512 auto at this size; force 4 chunks of 128
    one = cw.gaussian_coupling_window(*args, prev_alpha=prev_alpha,
                                      interpret=True)
    chk = cw.gaussian_coupling_window(*args, prev_alpha=prev_alpha,
                                      interpret=True, w_chunk=128)
    np.testing.assert_array_equal(np.asarray(chk.found),
                                  np.asarray(one.found))
    np.testing.assert_array_equal(np.asarray(chk.alpha),
                                  np.asarray(one.alpha))
    np.testing.assert_array_equal(np.asarray(chk.force),
                                  np.asarray(one.force))
    np.testing.assert_array_equal(np.asarray(chk.u_source),
                                  np.asarray(one.u_source))
    assert int(chk.n_overflow) == 0
