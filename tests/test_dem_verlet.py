"""Verlet neighbor-list path: equivalence with all-pairs forces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops.grid import Grid


def _params():
    return dem.ContactParams(kn=1e3, kt_over_kn=0.5, restitution=0.9,
                             friction=0.3, rho_p=2500.0)


@pytest.mark.parametrize("periodic", [(False,) * 3, (True, True, True)])
@pytest.mark.parametrize("dense_rolls,sorted_fetch",
                         [(False, False), (True, False), (True, True)])
def test_neighbor_list_forces_match_allpairs(periodic, dense_rolls,
                                             sorted_fetch):
    rng = np.random.RandomState(7)
    N = 80
    grid = Grid.cube(16, 1.0)
    r = 0.025
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.1, (N, 3)), jnp.float32)
    ang = jnp.asarray(rng.normal(0, 0.1, (N, 3)), jnp.float32)
    rad = jnp.full((N,), r, jnp.float32)
    act = jnp.ones((N,), bool)

    cfg = dem.DEMConfig(
        params=_params(), neighbor="cells", cell_capacity=32,
        max_neighbors=32, periodic=periodic,
        wall_axes=tuple(not p for p in periodic),
        dense_rolls=dense_rolls, sorted_fetch=sorted_fetch,
    )
    nbr = dem.build_neighbor_list(pos, act, grid, cfg, r)
    f_n, t_n = dem.neighbor_contact_forces(nbr, pos, vel, ang, rad, act, grid, cfg)

    cfg_a = dem.DEMConfig(params=_params(), neighbor="allpairs",
                          periodic=periodic,
                          wall_axes=tuple(not p for p in periodic))
    f_a, t_a = dem.allpairs_contact_forces(pos, vel, ang, rad, act, grid, cfg_a)
    np.testing.assert_allclose(np.asarray(f_n), np.asarray(f_a), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_n), np.asarray(t_a), atol=1e-4)


def test_refined_neighbors_forces_match():
    """refined_neighbors (distance-refined compaction, DEMConfig docs):
    identical forces to the full list when nothing overflows, and overflow
    counts only in-cutoff drops."""
    rng = np.random.RandomState(3)
    N = 80
    grid = Grid.cube(16, 1.0)
    r = 0.025
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.1, (N, 3)), jnp.float32)
    ang = jnp.asarray(rng.normal(0, 0.1, (N, 3)), jnp.float32)
    rad = jnp.full((N,), r, jnp.float32)
    act = jnp.ones((N,), bool)

    base = dict(params=_params(), neighbor="cells", cell_capacity=32,
                max_neighbors=32, wall_axes=(True,) * 3)
    cfg_full = dem.DEMConfig(**base)
    cfg_ref = dem.DEMConfig(**base, refined_neighbors=8)

    nbr_f, ov_f = dem.build_neighbor_list(pos, act, grid, cfg_full, r,
                                          return_overflow=True)
    nbr_r, ov_r = dem.build_neighbor_list(pos, act, grid, cfg_ref, r,
                                          return_overflow=True)
    assert nbr_r.shape == (N, 8)
    assert int(ov_f) == 0 and int(ov_r) == 0
    f_f, t_f = dem.neighbor_contact_forces(nbr_f, pos, vel, ang, rad, act,
                                           grid, cfg_full)
    f_r, t_r = dem.neighbor_contact_forces(nbr_r, pos, vel, ang, rad, act,
                                           grid, cfg_ref)
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_r), np.asarray(t_f), atol=1e-5)

    # force an in-cutoff overflow: a tight cluster bigger than the cap
    cl = jnp.asarray(0.5 + 0.012 * rng.normal(size=(12, 3)), jnp.float32)
    pos2 = jnp.concatenate([cl, pos[12:]])
    cfg_tiny = dem.DEMConfig(**{**base, "max_neighbors": 16},
                             refined_neighbors=2)
    _, ov = dem.build_neighbor_list(pos2, act, grid, cfg_tiny, r,
                                    return_overflow=True)
    assert int(ov) > 0


def test_neighbor_list_self_excluded_and_padded():
    grid = Grid.cube(8, 1.0)
    pos = jnp.asarray([[0.5, 0.5, 0.5], [0.52, 0.5, 0.5], [0.9, 0.9, 0.9]],
                      jnp.float32)
    act = jnp.array([True, True, False])
    cfg = dem.DEMConfig(params=_params(), neighbor="cells", cell_capacity=4,
                        max_neighbors=4)
    nbr = dem.build_neighbor_list(pos, act, grid, cfg, 0.02)
    nbr = np.asarray(nbr)
    # particle 0 sees particle 1 and vice versa; inactive 2 sees nothing
    assert 1 in nbr[0] and 0 not in nbr[0]
    assert 0 in nbr[1] and 1 not in nbr[1]
    assert (nbr[2] == 3).all()
    # inactive particle never appears as a candidate
    assert not (nbr[:2] == 2).any()


def test_substeps_with_verlet_list_bounce():
    """Head-on collision through the Verlet path conserves momentum."""
    grid = Grid.cube(8, 1.0)
    cfg = dem.DEMConfig(
        params=_params(), neighbor="cells", cell_capacity=8, max_neighbors=8,
        gravity=(0, 0, 0), wall_axes=(False,) * 3,
        list_rebuild_every=30,   # travel exceeds the skin over 3000 substeps
    )
    r = 0.02
    pos = jnp.array([[0.42, 0.5, 0.5], [0.5, 0.5, 0.5]])
    vel = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    ang = jnp.zeros((2, 3))
    rad = jnp.full((2,), r)
    act = jnp.ones(2, bool)
    dt = dem.critical_dt(r, cfg.params)
    hydro = dem.DEMForces(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    p0 = float(jnp.sum(vel[:, 0]))
    pos, vel, ang, _ = dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid, cfg,
                                     dt, 3000, r)
    np.testing.assert_allclose(float(jnp.sum(vel[:, 0])), p0, rtol=1e-3)
    assert float(vel[1, 0]) > 0.3


def test_persistent_list_matches_per_step_rebuild():
    """DEMConfig.list_reuse: the carried Verlet list (rebuilt only on the
    displacement criterion) gives the same coupled trajectories as the
    per-step rebuild — a stale-but-valid list is a candidate superset and
    non-touching candidates contribute zero force."""
    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.ops import coupling as cp

    rng = np.random.RandomState(3)
    N = 120
    grid = Grid.cube(16, 16e-3)
    r = 4e-4

    def build(list_reuse):
        cfg = cd.CaseConfig(
            grid=grid,
            bcs=FluidBCs.channel_z(),
            transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0,
                                             rho_p=2500.0),
            solver="pimple",
            coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                       stencil_shape="sphere2",
                                       exchange="planes", slot_capacity=8),
            dem=dem.DEMConfig(
                params=dem.ContactParams(kn=100.0, rho_p=2500.0),
                gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
                periodic=(True, True, False), wall_axes=(False, False, True),
                neighbor="cells", cell_capacity=12, max_neighbors=24,
                list_reuse=list_reuse,
            ),
            n_dem_substeps=2,
            r_max=r,
        )
        return cfg

    pos0 = rng.uniform(0.2 * 16e-3, 0.8 * 16e-3, (N, 3))

    results = {}
    for reuse in (False, True):
        cfg = build(reuse)
        state = cd.initialize_state(
            make_fluid_state(grid),
            make_particle_state(pos=pos0, radius=r),
            make_turbulence_state(grid, k0=1e-6),
            cfg, dt=5e-5,
        )
        step = cd.make_step_fn(cfg)
        for _ in range(6):
            state, diag = step(state)
            assert int(diag.n_contact_overflow) == 0
        results[reuse] = state

    np.testing.assert_allclose(np.asarray(results[True].particles.pos),
                               np.asarray(results[False].particles.pos),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(results[True].particles.vel),
                               np.asarray(results[False].particles.vel),
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(results[True].fluid.p),
                               np.asarray(results[False].fluid.p),
                               rtol=1e-4, atol=1e-7)


def test_persistent_list_rebuild_triggers():
    """A particle moving fast enough to eat the skin margin forces a
    rebuild: contacts formed AFTER large drift are still found (the stale
    list alone would miss them)."""
    grid = Grid.cube(8, 1.0)
    cfg = dem.DEMConfig(
        params=_params(), neighbor="cells", cell_capacity=8, max_neighbors=8,
        gravity=(0, 0, 0), wall_axes=(False,) * 3, list_reuse=True,
    )
    r = 0.02
    # particle 0 flies toward particle 1 from far outside any shared bin
    pos = jnp.array([[0.2, 0.5, 0.5], [0.6, 0.5, 0.5]])
    vel = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    ang = jnp.zeros((2, 3))
    rad = jnp.full((2,), r)
    act = jnp.ones(2, bool)
    dt = dem.critical_dt(r, cfg.params)
    hydro = dem.DEMForces(jnp.zeros((2, 3)), jnp.zeros((2, 3)))

    # emulate the coupled_step carry loop: build once, then cond-rebuild
    import jax

    bin_size = dem.effective_bin_size(grid, cfg, r)
    margin = cfg.list_margin_factor * (bin_size - 2.0 * r)
    nbr = dem.build_neighbor_list(pos, act, grid, cfg, r)
    ref = pos
    for _ in range(60):
        disp = jnp.max(jnp.abs(pos - ref))
        if bool(disp >= margin):
            nbr = dem.build_neighbor_list(pos, act, grid, cfg, r)
            ref = pos
        pos, vel, ang, _ = dem.dem_substeps(
            pos, vel, ang, rad, act, hydro, grid, cfg, dt, 10, r, nbr=nbr)
    # collision must have happened: particle 1 got momentum
    assert float(vel[1, 0]) > 0.3


def test_chunked_scan_rebuild_matches_per_step():
    """list_rebuild_steps=K (statically scheduled rebuild in make_scan_fn,
    no lax.cond): same trajectories as per-step rebuild, staleness
    diagnostic stays zero for slow drift."""
    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.ops import coupling as cp

    rng = np.random.RandomState(7)
    N = 100
    grid = Grid.cube(16, 16e-3)
    r = 4e-4

    def build(reuse, K, sampled=False):
        return cd.CaseConfig(
            grid=grid, bcs=FluidBCs.channel_z(),
            transport=cd.TransportProperties(),
            solver="pimple",
            coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                       stencil_shape="sphere2",
                                       exchange="planes", slot_capacity=8),
            dem=dem.DEMConfig(
                params=dem.ContactParams(kn=100.0, rho_p=2500.0),
                gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
                periodic=(True, True, False), wall_axes=(False, False, True),
                neighbor="cells", cell_capacity=12, max_neighbors=24,
                list_reuse=reuse, list_rebuild_steps=K,
            ),
            n_dem_substeps=2, r_max=r,
            sampled_diagnostics=sampled,
        )

    # non-overlapping jittered lattice: random placement overlaps at this
    # density and the spring blow-apart creates genuinely fast particles
    # (which the staleness diagnostic then correctly flags)
    g5 = np.stack(np.meshgrid(*[np.linspace(0.25, 0.75, 5) * 16e-3] * 3,
                              indexing="ij"), -1).reshape(-1, 3)[:N]
    pos0 = g5 + rng.uniform(-2e-4, 2e-4, g5.shape)

    results = {}
    all_diags = {}
    for key, (reuse, K, sampled) in {
        "norm": (False, 0, False),
        "chunk": (True, 3, False),
        "sampled": (True, 3, True),   # CaseConfig.sampled_diagnostics
    }.items():
        cfg = build(reuse, K, sampled)
        state = cd.initialize_state(
            make_fluid_state(grid),
            make_particle_state(pos=pos0, radius=r),
            make_turbulence_state(grid, k0=1e-6),
            cfg, dt=5e-5)
        run = cd.make_scan_fn(cfg, 7)   # 2 full chunks + remainder of 1
        state, diags = run(state)
        assert int(np.max(np.asarray(diags.n_contact_overflow))) == 0
        results[key] = state
        all_diags[key] = diags

    for key in ("chunk", "sampled"):
        np.testing.assert_allclose(np.asarray(results[key].particles.pos),
                                   np.asarray(results["norm"].particles.pos),
                                   rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(np.asarray(results[key].fluid.p),
                                   np.asarray(results["norm"].fluid.p),
                                   rtol=1e-4, atol=1e-7)

    # sampled diagnostics: lite steps report 0 for the grid-wide
    # reductions; chunk-final steps (indices 2, 5) and the size-1
    # remainder chunk (index 6) report the real values
    cont = np.asarray(all_diags["sampled"].cont_err_local)
    cont_full = np.asarray(all_diags["chunk"].cont_err_local)
    assert np.all(cont[[0, 1, 3, 4]] == 0.0)
    np.testing.assert_allclose(cont[[2, 5, 6]], cont_full[[2, 5, 6]],
                               rtol=1e-3, atol=1e-12)


def test_carry_contact_matches_uncarried():
    """DEMConfig.carry_contact: re-composing the first substep acceleration
    from the previous step's carried contact force gives the same coupled
    trajectories as re-evaluating it (the carried evaluation was at exactly
    the current state, under the same Verlet-superset contract)."""
    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.ops import coupling as cp

    rng = np.random.RandomState(11)
    N = 100
    grid = Grid.cube(16, 16e-3)
    r = 4e-4

    def build(carry, K=3):
        return cd.CaseConfig(
            grid=grid, bcs=FluidBCs.channel_z(),
            transport=cd.TransportProperties(),
            solver="pimple",
            coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                       stencil_shape="sphere2",
                                       exchange="planes", slot_capacity=8),
            dem=dem.DEMConfig(
                params=dem.ContactParams(kn=100.0, rho_p=2500.0),
                gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
                periodic=(True, True, False), wall_axes=(False, False, True),
                neighbor="cells", cell_capacity=12, max_neighbors=24,
                list_reuse=True, list_rebuild_steps=K,
                carry_contact=carry,
            ),
            n_dem_substeps=2, r_max=r,
        )

    g5 = np.stack(np.meshgrid(*[np.linspace(0.25, 0.75, 5) * 16e-3] * 3,
                              indexing="ij"), -1).reshape(-1, 3)[:N]
    pos0 = g5 + rng.uniform(-2e-4, 2e-4, g5.shape)

    results = {}
    for carry in (False, True):
        cfg = build(carry)
        state = cd.initialize_state(
            make_fluid_state(grid),
            make_particle_state(pos=pos0, radius=r),
            make_turbulence_state(grid, k0=1e-6),
            cfg, dt=5e-5)
        assert (state.particles.contact_f is not None) == carry
        run = cd.make_scan_fn(cfg, 7)
        state, diags = run(state)
        assert int(np.max(np.asarray(diags.n_contact_overflow))) == 0
        results[carry] = state

    np.testing.assert_allclose(np.asarray(results[True].particles.pos),
                               np.asarray(results[False].particles.pos),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(results[True].particles.vel),
                               np.asarray(results[False].particles.vel),
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(results[True].fluid.p),
                               np.asarray(results[False].fluid.p),
                               rtol=1e-4, atol=1e-7)


def test_substep_unroll_bit_identical():
    """DEMConfig.substep_unroll only changes the lax.scan unroll schedule —
    same math, so pos/vel/angvel (and carried force / shear state) must
    match to FMA-reassociation noise across the plain, carry_contact,
    shear_history, and dt_seq paths."""
    import dataclasses

    rng = np.random.RandomState(11)
    N = 60
    grid = Grid.cube(12, 1.0)
    r = 0.03
    pos = jnp.asarray(rng.uniform(0.1, 0.9, (N, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.2, (N, 3)), jnp.float32)
    ang = jnp.asarray(rng.normal(0, 0.2, (N, 3)), jnp.float32)
    rad = jnp.full((N,), r, jnp.float32)
    act = jnp.ones((N,), bool)
    hydro = dem.DEMForces(jnp.asarray(rng.normal(0, 1e-6, (N, 3)),
                                      jnp.float32), jnp.zeros((N, 3)))
    dt = dem.critical_dt(r, _params())

    def run(cfg, **kw):
        return dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid, cfg,
                                dt, 4, r, **kw)

    base = dem.DEMConfig(params=_params(), neighbor="cells",
                         cell_capacity=16, max_neighbors=16,
                         wall_axes=(True,) * 3)
    for variant in ("plain", "carry", "shear", "dtseq"):
        cfg = base
        kw = {}
        if variant == "carry":
            cfg = dataclasses.replace(cfg, carry_contact=True)
        elif variant == "shear":
            cfg = dataclasses.replace(cfg, shear_history=True)
            kw["shear"] = dem.make_shear_state(N, base.max_neighbors)
        elif variant == "dtseq":
            kw["dt_seq"] = jnp.asarray([dt, dt, dt * 0.5, 0.0], jnp.float32)
        out_r = run(cfg, **kw)
        out_u = run(dataclasses.replace(cfg, substep_unroll=True), **kw)
        for a, b in zip(jax.tree_util.tree_leaves(out_r),
                        jax.tree_util.tree_leaves(out_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7,
                                       err_msg=variant)


@pytest.mark.parametrize("periodic", [(False,) * 3, (True, True, False)])
@pytest.mark.parametrize("chunks", [1, 4])
def test_pair_layout_channels_matches_rows(periodic, chunks):
    """pair_layout='channels' (SoA (M, n) math, the round-5 1M padding-tax
    fix) must reproduce the rows layout to FMA/reassociation-level
    rounding — identical formulas, different array layout."""
    import dataclasses
    rng = np.random.RandomState(3)
    N = 96
    grid = Grid.cube(16, 1.0)
    r = 0.03
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.2, (N, 3)), jnp.float32)
    ang = jnp.asarray(rng.normal(0, 0.5, (N, 3)), jnp.float32)
    rad = jnp.asarray(rng.uniform(0.02, 0.03, N), jnp.float32)
    act = jnp.asarray(rng.rand(N) > 0.1)

    cfg = dem.DEMConfig(
        params=_params(), neighbor="cells", cell_capacity=32,
        max_neighbors=32, periodic=periodic,
        wall_axes=tuple(not p for p in periodic), force_chunks=chunks,
    )
    nbr = dem.build_neighbor_list(pos, act, grid, cfg, float(rad.max()))
    f_r, t_r = dem.neighbor_contact_forces(nbr, pos, vel, ang, rad, act,
                                           grid, cfg)
    cfg_c = dataclasses.replace(cfg, pair_layout="channels")
    f_c, t_c = dem.neighbor_contact_forces(nbr, pos, vel, ang, rad, act,
                                           grid, cfg_c)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_r),
                               rtol=5e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_r),
                               rtol=5e-5, atol=1e-8)
    # at least some real contacts in the fixture
    assert float(jnp.sum(jnp.abs(f_r))) > 0
