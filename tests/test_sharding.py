"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4's prescription: run the same sharded step on 1 vs N devices
and assert tolerance equality — this validates the ppermute halo exchange,
the owner-shard coupling with halo-reduction deposits, and the psum'd CG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.fields import (
    SimState,
    make_fluid_state,
    make_particle_state,
    make_turbulence_state,
)
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
from yade_openfoam_coupling_tpu.models.piso import FluidBCs, PISOConfig
from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops.grid import Grid
from yade_openfoam_coupling_tpu.parallel import make_mesh
from yade_openfoam_coupling_tpu.parallel import sharded as sh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

# use the same (Jacobi-PCG) pressure path on both sides for comparability
_PCFG = pr.PressureSolverConfig(solver="pcg", tol=1e-7, maxiter=600)


def _settling_cfg():
    grid = Grid.cube(16, 8e-3)
    return cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.box_noslip(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="piso",
        coupling=cp.CouplingConfig(gaussian=False),
        dem=dem.DEMConfig(
            params=dem.ContactParams(rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), buoyancy=True, rho_f=1000.0,
        ),
        piso=PISOConfig(n_correctors=1, pressure=_PCFG),
        n_dem_substeps=4,
        r_max=50e-6,
    )


def _gaussian_cfg():
    grid = Grid.cube(16, 0.016)
    return cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=10.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
        ),
        pimple=PIMPLEConfig(n_outer=1, n_correctors=1, pressure=_PCFG),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=4,
        r_max=4e-4,
    )


def _initial_state(cfg, pos, radius):
    return cd.initialize_state(
        make_fluid_state(cfg.grid),
        make_particle_state(pos=pos, radius=radius),
        make_turbulence_state(cfg.grid),
        cfg, dt=1e-4,
    )


def _run_single(cfg, state, n):
    run = cd.make_scan_fn(cfg, n)
    return run(state)


def _run_sharded(cfg, state, n, n_dev=8):
    mesh = make_mesh(n_dev)
    sstate = sh.to_sharded_state(state, cfg, mesh)
    step = sh.make_sharded_scan(cfg, mesh, n)
    out, diags = step(sstate)
    # back to face-tuple form for comparison
    fluid = out.fluid._replace(
        phi=sh.lo_to_faces_host(out.fluid.phi, cfg.bcs.u)
    )
    return out._replace(fluid=fluid), diags


def test_point_force_sharded_matches_single():
    cfg = _settling_cfg()
    state = _initial_state(cfg, [[4e-3, 4e-3, 6e-3]], 50e-6)
    n = 5
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    np.testing.assert_allclose(p8["vel"], p1["vel"], rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.u), np.asarray(s1.fluid.u), atol=5e-7,
    )
    assert int(d8.n_found[-1]) == 1


def test_gaussian_4way_sharded_matches_single():
    cfg = _gaussian_cfg()
    rng = np.random.RandomState(0)
    pos = rng.uniform(0.003, 0.013, (24, 3))
    state = _initial_state(cfg, pos, 4e-4)
    n = 4
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    np.testing.assert_allclose(
        np.asarray(s8.fluid.alpha), np.asarray(s1.fluid.alpha),
        rtol=1e-4, atol=1e-6,
    )
    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    np.testing.assert_allclose(p8["pos"], p1["pos"], rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.u), np.asarray(s1.fluid.u),
        rtol=1e-2, atol=1e-5,
    )
    assert int(d8.n_found[-1]) == 24
    assert int(d8.n_shard_overflow[-1]) == 0


def test_migration_across_slabs_matches_single():
    """Particles driven across slab boundaries (the ring-migration path)
    must match the single-device run, tracked by pid."""
    from yade_openfoam_coupling_tpu.models.fields import ParticleState

    cfg = _gaussian_cfg()
    # straddle the x slab boundaries (slabs are 2 cells = 2 mm wide) with
    # strong +-x velocities so several particles hop shards within 6 steps
    pos = np.array([
        [1.9e-3, 8e-3, 8e-3], [2.1e-3, 5e-3, 9e-3],
        [7.95e-3, 8e-3, 8e-3], [8.05e-3, 4e-3, 10e-3],
        [13.9e-3, 6e-3, 7e-3], [15.9e-3, 7e-3, 8e-3],  # wraps periodic x
        [0.1e-3, 9e-3, 9e-3],
        [5.0e-3, 5.0e-3, 8e-3],
    ])
    vel = np.zeros((8, 3), np.float32)
    vel[:, 0] = [0.4, -0.4, 0.4, -0.4, 0.4, 0.4, -0.4, 0.0]
    state = _initial_state(cfg, pos, 4e-4)
    ps = state.particles._replace(vel=jnp.asarray(vel))
    state = state._replace(particles=ps)

    n = 6
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    # particles moved ~0.24 mm in x: at least the straddlers changed slab.
    # atol: f32 halo/deposit reordering noise accumulated over 6 steps
    np.testing.assert_allclose(p8["pos"], p1["pos"], rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(p8["vel"], p1["vel"], rtol=1e-3, atol=1e-5)
    assert int(d8.n_shard_overflow[-1]) == 0
    # everyone remains coupled at the end (settled in their owner slabs)
    assert int(d8.n_found[-1]) == 8


def test_halo_pad_matches_bc_pad():
    """ShardCtx.pad_s over 8 shards reproduces pad_scalar on the gathered
    array for periodic and wall BCs."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from yade_openfoam_coupling_tpu.ops.grid import FieldBC, pad_scalar
    from yade_openfoam_coupling_tpu.parallel.ctx import ShardCtx

    mesh = make_mesh(8)
    f = jnp.arange(16 * 4 * 4, dtype=jnp.float32).reshape(16, 4, 4)
    for bc in [FieldBC.periodic(), FieldBC.box("neumann"),
               FieldBC.box("dirichlet", 2.5)]:
        expected = pad_scalar(f, bc)

        def body(fl):
            ctx = ShardCtx(mesh_axes=("x", None, None))
            fp = ctx.pad_s(fl, bc)
            # drop the x ghosts (they overlap neighbours) but keep y/z
            return fp[1:-1]

        got = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P("x"),), out_specs=P("x"),
            check_vma=False,
        ))(f)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected[1:-1]), rtol=1e-6,
        )


def test_gaussian_planes_sharded_matches_single():
    """Plane-dense exchange under sharding (slab Pallas kernels in
    interpret mode + ring deposit halo) vs the single-device planes run."""
    import dataclasses as _dc
    cfg = _gaussian_cfg()
    # round-3 layout variants on: column-scatter staging, in-kernel dy
    # rolls, z-packed unbin (cap=4 so zp=8 divides the local cell count
    # and the packed path actually engages)
    cfg = _dc.replace(
        cfg, coupling=_dc.replace(cfg.coupling, lag_alpha=True,
                                  exchange="planes", slot_capacity=4,
                                  packed_bin="col", dy_in_kernel=True,
                                  packed_unbin=True),
    )
    rng = np.random.RandomState(1)
    pos = rng.uniform(0.003, 0.013, (24, 3))
    state = _initial_state(cfg, pos, 4e-4)
    n = 4
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    np.testing.assert_allclose(
        np.asarray(s8.fluid.alpha), np.asarray(s1.fluid.alpha),
        rtol=1e-4, atol=1e-6,
    )
    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    np.testing.assert_allclose(p8["pos"], p1["pos"], rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.u), np.asarray(s1.fluid.u),
        rtol=1e-2, atol=1e-5,
    )
    assert int(d8.n_found[-1]) == 24
    assert int(d8.n_coupling_overflow[-1]) == 0


def test_fftpcg_sharded_matches_single():
    """Spectral-preconditioned CG under sharding: the preconditioner acts
    block-locally (additive Schwarz via precond_bc, like the MG V-cycle),
    so 1-vs-8 runs use DIFFERENT preconditioners but must converge to the
    same pressure within the CG tolerance. Round-4 flagship solver."""
    import dataclasses as _dc
    cfg = _gaussian_cfg()
    cfg = _dc.replace(
        cfg,
        coupling=_dc.replace(cfg.coupling, lag_alpha=True,
                             exchange="planes", slot_capacity=4,
                             packed_bin="col", dy_in_kernel=True),
        pimple=_dc.replace(cfg.pimple, pressure=pr.PressureSolverConfig(
            solver="fftpcg", tol=1e-7, maxiter=600)),
    )
    rng = np.random.RandomState(3)
    pos = rng.uniform(0.003, 0.013, (24, 3))
    state = _initial_state(cfg, pos, 4e-4)
    n = 4
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    np.testing.assert_allclose(
        np.asarray(s8.fluid.p), np.asarray(s1.fluid.p), rtol=1e-3, atol=1e-7,
    )
    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    np.testing.assert_allclose(p8["pos"], p1["pos"], rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.u), np.asarray(s1.fluid.u), rtol=1e-2, atol=1e-5,
    )
    assert int(d8.n_found[-1]) == 24
    assert int(d8.n_coupling_overflow[-1]) == 0


def test_shear_history_sharded_matches_single():
    """Pid-keyed shear springs under sharding: migration and ghost
    reshuffles must not orphan contact history (1-vs-8 equivalence)."""
    import dataclasses as _dc
    cfg = _gaussian_cfg()
    cfg = _dc.replace(
        cfg,
        dem=_dc.replace(cfg.dem, neighbor="cells", cell_capacity=8,
                        max_neighbors=8, shear_history=True,
                        cundall_damping=0.2, skin=0.1,
                        params=_dc.replace(cfg.dem.params, kn=100.0,
                                           friction=0.4)),
    )
    # a settling chain resting on the floor, spanning several slab
    # boundaries (slabs are 2 mm wide): gravity confines the pile so the
    # particle and wall contacts PERSIST, exercising pid-keyed spring
    # carry through ghost exchange and migration
    r = 4e-4
    xs = 0.002 + np.arange(16) * 1.9 * r        # overlapping chain in x
    pos = np.column_stack([
        xs, np.full(16, 8e-3), np.full(16, r * 0.98)])
    radius = np.full(16, r)
    state = _initial_state(cfg, pos, radius)
    n = 5
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    np.testing.assert_allclose(p8["pos"], p1["pos"], rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(p8["vel"], p1["vel"], rtol=1e-3, atol=1e-7)
    # the boundary-straddling contacts must actually persist (engaged
    # springs), or this equivalence would be vacuous
    assert float(jnp.sum(jnp.abs(s1.particles.shear_xi))) > 0.0
    assert float(jnp.sum(jnp.abs(s8.particles.shear_xi))) > 0.0


@pytest.mark.parametrize("exchange", ["planes", "window"])
def test_bench_scale_sharded_matches_single(exchange):
    """VERDICT r2 item 6: a bench-scale 1-vs-8 equivalence — thousands of
    particles at realistic occupancy, flagship config (planes/window
    exchange + fused kernel + shear history + persistent Verlet list
    single-device), forced cross-slab traffic, all overflow counters zero.
    The 'window' case covers the round-5 sharded port of the in-kernel MXU
    staging exchange (VERDICT r4 item 5)."""
    grid = Grid.cube(24, 0.024)
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange=exchange, slot_capacity=6),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=10, max_neighbors=48,
            shear_history=True,
        ),
        pimple=PIMPLEConfig(n_outer=1, n_correctors=1, pressure=_PCFG),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=2,
        r_max=4e-4,
    )
    rng = np.random.RandomState(11)
    N = 3000
    pos = rng.uniform(0.1 * 0.024, 0.9 * 0.024, (N, 3))
    vel = np.zeros((N, 3), np.float32)
    # cross-slab traffic: strong +-x drift (x is the sharded axis)
    vel[:, 0] = rng.choice([-0.5, 0.5], N)
    state = cd.initialize_state(
        make_fluid_state(cfg.grid),
        make_particle_state(pos=pos, vel=vel, radius=4e-4),
        make_turbulence_state(cfg.grid),
        cfg, dt=1e-4,
    )
    n = 4
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    # overflow counters: exactness contract at this occupancy
    for d in (d1, d8):
        assert int(np.max(np.asarray(d.n_contact_overflow))) == 0
        assert int(np.max(np.asarray(d.n_coupling_overflow))) == 0
    assert int(np.max(np.asarray(d8.n_shard_overflow))) == 0
    assert int(d8.n_found[-1]) == N

    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    # migrations actually happened: slab of some pid changed across steps
    np.testing.assert_allclose(p8["pos"], p1["pos"], rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(p8["vel"], p1["vel"], rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.alpha), np.asarray(s1.fluid.alpha),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.u), np.asarray(s1.fluid.u),
        rtol=1e-2, atol=1e-5)
    # the drift really crossed slab boundaries
    slab0 = (np.asarray(state.particles.pos)[:, 0] // (0.024 / 8)).astype(int)
    order = np.argsort(np.asarray(state.particles.pid))
    slab1 = (p1["pos"][:, 0] // (0.024 / 8)).astype(int)
    assert (slab0[order] != slab1).sum() > 50


@pytest.mark.parametrize("exchange", ["planes", "window"])
def test_chunked_sharded_matches_single_chunked(exchange):
    """Chunked sharded scan (list_rebuild_steps=K: ONE migration + ONE
    frozen ghost-plan/Verlet build per chunk, extended-window exchange)
    vs the single-device statically-scheduled-rebuild scan with the same
    K. Covers: the ext_slab binning window (particles drift out of their
    owner slab between migrations and must STAY coupled), the periodic
    wrap of the window at the global x edges (staged px shifted into the
    window frame; anchor-relative and frame-free for 'window'), depth-2
    deposit/interp halos, and the frozen DEM plan with pid-keyed shear
    history."""
    import dataclasses as _dc
    cfg = _gaussian_cfg()
    cfg = _dc.replace(
        cfg,
        coupling=_dc.replace(cfg.coupling, lag_alpha=True,
                             exchange=exchange, slot_capacity=6,
                             dy_in_kernel=True),
        dem=_dc.replace(cfg.dem, neighbor="cells", cell_capacity=10,
                        max_neighbors=24, shear_history=True,
                        list_reuse=True, list_rebuild_steps=3,
                        skin=0.25, cundall_damping=0.2,
                        # soft contacts + dt=5e-5 keep per-chunk drift
                        # under the Verlet margin 0.5*(bin-2r) = 1e-4, so
                        # the zero-staleness contract is genuinely checked
                        params=_dc.replace(cfg.dem.params, kn=10.0,
                                           friction=0.4)),
    )
    rng = np.random.RandomState(7)
    L = 0.016
    r = 4e-4
    # jittered lattice (spacing 1.37 mm >> 2r + 2*jitter): no initial
    # overlaps, so contact impulses stay bounded and per-chunk drift
    # genuinely sits under the Verlet margin (a uniform-random cloud
    # spawns ~10 deeply overlapped pairs whose kn*overlap kick blows
    # one particle past the margin -> spurious staleness overflow)
    side = np.linspace(0.2 * L, 0.8 * L, 8)
    lat = np.stack(np.meshgrid(side, side, side, indexing="ij"),
                   -1).reshape(-1, 3)
    sites = lat[rng.choice(len(lat), 96, replace=False)]
    pos = (sites + rng.uniform(-2e-4, 2e-4, (96, 3))).astype(np.float32)
    vel = np.zeros((96, 3), np.float32)
    # cross-slab drift in x, sized so per-chunk drift (3 steps x 1.5e-5)
    # stays under the Verlet margin 0.5*(bin - 2r) = 8e-5
    vel[:, 0] = rng.choice([-0.15, 0.15], 96)
    # global-edge wrap-crossers: mid-chunk they cross x=0 / x=L and must
    # be coupled through the FIRST/LAST shard's wrapped window plane
    pos[:4, 0] = 1.1e-5
    vel[:4, 0] = -0.15
    pos[4:8, 0] = L - 1.1e-5
    vel[4:8, 0] = 0.15
    # an overlapping chain resting on the floor -> persistent contacts so
    # the frozen shear springs are actually engaged
    xs = 0.004 + np.arange(12) * 1.9 * r
    pos[8:20, 0] = xs
    pos[8:20, 1] = L / 2
    pos[8:20, 2] = r * 0.98
    vel[8:20] = 0.0
    state = cd.initialize_state(
        make_fluid_state(cfg.grid),
        make_particle_state(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                            radius=r),
        make_turbulence_state(cfg.grid),
        cfg, dt=5e-5,
    )
    n = 6   # 2 chunks of K=3
    s1, d1 = _run_single(cfg, state, n)
    s8, d8 = _run_sharded(cfg, state, n)

    # every particle stays coupled every step, even while outside its
    # owner slab mid-chunk (the ext window's whole point)
    np.testing.assert_array_equal(np.asarray(d8.n_found), np.full(n, 96))
    for d in (d1, d8):
        assert int(np.max(np.asarray(d.n_contact_overflow))) == 0
        assert int(np.max(np.asarray(d.n_coupling_overflow))) == 0
    assert int(np.max(np.asarray(d8.n_shard_overflow))) == 0

    p1 = sh.particles_by_pid(s1.particles)
    p8 = sh.particles_by_pid(s8.particles)
    np.testing.assert_array_equal(p8["pid"], p1["pid"])
    np.testing.assert_allclose(p8["pos"], p1["pos"], rtol=1e-4, atol=1e-8)
    # vel atol covers near-zero components (velocity scale is 0.15 m/s;
    # 1-vs-8-shard reduction order wiggles them by ~2e-5)
    np.testing.assert_allclose(p8["vel"], p1["vel"], rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.alpha), np.asarray(s1.fluid.alpha),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s8.fluid.u), np.asarray(s1.fluid.u),
        rtol=1e-2, atol=1e-5)
    # engaged springs (non-vacuous shear coverage)
    assert float(jnp.sum(jnp.abs(s8.particles.shear_xi))) > 0.0
    # the wrap-crossers really wrapped across the global x edge
    w = np.isin(p1["pid"], np.arange(8))
    assert (p1["pos"][w][:4, 0] > 0.9 * L).all()
    assert (p1["pos"][w][4:, 0] < 0.1 * L).all()
