"""DEM engine tests: contact laws, neighbor-list equivalence, integration."""

import jax
import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops.grid import Grid


def _params(**kw):
    d = dict(kn=1e3, kt_over_kn=0.5, restitution=0.9, friction=0.3, rho_p=2500.0)
    d.update(kw)
    return dem.ContactParams(**d)


def test_pair_force_overlap_direction():
    """Two overlapping spheres push apart along the centre line."""
    grid = Grid.cube(8, 1.0)
    cfg = dem.DEMConfig(params=_params(), gravity=(0, 0, 0))
    pos = jnp.array([[0.5, 0.5, 0.5], [0.5 + 0.015, 0.5, 0.5]])
    r = jnp.full((2,), 0.01)
    vel = jnp.zeros((2, 3))
    act = jnp.ones(2, bool)
    f, t = dem.allpairs_contact_forces(pos, vel, vel, r, act, grid, cfg)
    # overlap = 0.005, f = kn*overlap = 5.0 along -x for particle 0
    np.testing.assert_allclose(float(f[0, 0]), -5.0, rtol=1e-5)
    np.testing.assert_allclose(float(f[1, 0]), 5.0, rtol=1e-5)
    # Newton's third law
    np.testing.assert_allclose(np.asarray(f[0] + f[1]), 0.0, atol=1e-6)


def test_no_force_when_separated():
    grid = Grid.cube(8, 1.0)
    cfg = dem.DEMConfig(params=_params(), gravity=(0, 0, 0))
    pos = jnp.array([[0.3, 0.5, 0.5], [0.7, 0.5, 0.5]])
    r = jnp.full((2,), 0.01)
    vel = jnp.zeros((2, 3))
    act = jnp.ones(2, bool)
    f, _ = dem.allpairs_contact_forces(pos, vel, vel, r, act, grid, cfg)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-9)


def test_cell_list_matches_allpairs():
    """The hashed neighbor search reproduces the exact O(N^2) forces."""
    rng = np.random.RandomState(42)
    N = 64
    grid = Grid.cube(16, 1.0)
    r = 0.02
    pos = jnp.asarray(rng.uniform(0.1, 0.9, (N, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.1, (N, 3)), jnp.float32)
    ang = jnp.asarray(rng.normal(0, 0.1, (N, 3)), jnp.float32)
    rad = jnp.full((N,), r, jnp.float32)
    act = jnp.ones((N,), bool)

    cfg_a = dem.DEMConfig(params=_params(), neighbor="allpairs")
    cfg_c = dem.DEMConfig(params=_params(), neighbor="cells", cell_capacity=16)
    fa, ta = dem.allpairs_contact_forces(pos, vel, ang, rad, act, grid, cfg_a)
    fc, tc = dem.cell_list_contact_forces(pos, vel, ang, rad, act, grid, cfg_c, r)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fc), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tc), atol=1e-4)


def test_cell_list_matches_allpairs_periodic():
    rng = np.random.RandomState(3)
    N = 32
    grid = Grid.cube(16, 1.0)
    r = 0.03
    pos = jnp.asarray(rng.uniform(0.0, 1.0, (N, 3)), jnp.float32)
    vel = jnp.zeros((N, 3), jnp.float32)
    rad = jnp.full((N,), r, jnp.float32)
    act = jnp.ones((N,), bool)
    per = (True, True, True)
    cfg_a = dem.DEMConfig(params=_params(), neighbor="allpairs", periodic=per,
                          wall_axes=(False,) * 3)
    cfg_c = dem.DEMConfig(params=_params(), neighbor="cells", periodic=per,
                          wall_axes=(False,) * 3, cell_capacity=16)
    fa, _ = dem.allpairs_contact_forces(pos, vel, vel, rad, act, grid, cfg_a)
    fc, _ = dem.cell_list_contact_forces(pos, vel, vel, rad, act, grid, cfg_c, r)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fc), atol=1e-4)


def test_wall_bounce_restitution():
    """Drop a sphere on the floor: rebound speed ~ e * impact speed."""
    grid = Grid.cube(8, 0.1)
    e = 0.8
    cfg = dem.DEMConfig(
        params=_params(kn=1e5, restitution=e, friction=0.0),
        gravity=(0.0, 0.0, 0.0),
    )
    r = 0.005
    m = float(dem.particle_mass(jnp.array([r]), cfg.params.rho_p)[0])
    v0 = -0.5
    pos = jnp.array([[0.05, 0.05, r + 0.002]])
    vel = jnp.array([[0.0, 0.0, v0]])
    ang = jnp.zeros((1, 3))
    rad = jnp.full((1,), r)
    act = jnp.ones(1, bool)
    dt = dem.critical_dt(r, cfg.params)
    nsub = 2000
    hydro = dem.DEMForces(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    pos, vel, ang, _ = dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid, cfg,
                                     dt, nsub, r)
    vz = float(vel[0, 2])
    assert vz > 0.0, "did not rebound"
    np.testing.assert_allclose(vz, -e * v0, rtol=0.12)


def test_two_sphere_collision_momentum():
    """Head-on equal-mass collision conserves momentum."""
    grid = Grid.cube(8, 1.0)
    cfg = dem.DEMConfig(
        params=_params(kn=1e4, restitution=0.9, friction=0.0),
        gravity=(0, 0, 0), wall_axes=(False,) * 3,
    )
    r = 0.02
    pos = jnp.array([[0.4, 0.5, 0.5], [0.5, 0.5, 0.5]])
    vel = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    ang = jnp.zeros((2, 3))
    rad = jnp.full((2,), r)
    act = jnp.ones(2, bool)
    dt = dem.critical_dt(r, cfg.params)
    hydro = dem.DEMForces(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    p0 = float(jnp.sum(vel[:, 0]))
    pos, vel, ang, _ = dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid, cfg,
                                     dt, 3000, r)
    p1 = float(jnp.sum(vel[:, 0]))
    np.testing.assert_allclose(p1, p0, rtol=1e-3)
    # they must have exchanged momentum
    assert float(vel[1, 0]) > 0.3


def test_gravity_free_fall():
    grid = Grid.cube(8, 10.0)
    cfg = dem.DEMConfig(params=_params(), gravity=(0, 0, -9.81),
                        wall_axes=(False,) * 3)
    pos = jnp.array([[5.0, 5.0, 8.0]])
    vel = jnp.zeros((1, 3))
    ang = jnp.zeros((1, 3))
    rad = jnp.full((1,), 0.01)
    act = jnp.ones(1, bool)
    hydro = dem.DEMForces(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    T, n = 0.5, 500
    pos, vel, _, _ = dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid, cfg,
                                   T / n, n, 0.01)
    np.testing.assert_allclose(float(vel[0, 2]), -9.81 * T, rtol=1e-4)
    np.testing.assert_allclose(float(pos[0, 2]), 8.0 - 0.5 * 9.81 * T ** 2, rtol=1e-3)


def test_inactive_padding_inert():
    grid = Grid.cube(8, 1.0)
    cfg = dem.DEMConfig(params=_params(), gravity=(0, 0, -9.81))
    pos = jnp.array([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    vel = jnp.zeros((2, 3))
    ang = jnp.zeros((2, 3))
    rad = jnp.array([0.01, 0.01])
    act = jnp.array([True, False])
    hydro = dem.DEMForces(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    pos2, vel2, _, _ = dem.dem_substeps(pos, vel, ang, rad, act, hydro, grid, cfg,
                                     1e-4, 10, 0.01)
    # inactive particle must not move
    np.testing.assert_allclose(np.asarray(pos2[1]), np.asarray(pos[1]), atol=1e-8)
    assert bool(jnp.all(jnp.isfinite(pos2)))


def test_drift_since_min_image():
    """Min-image staleness drift: a particle that wrapped across a
    periodic axis between a Verlet build and now has drifted ~one skin,
    not ~one box length (the frozen-list staleness diagnostics would
    otherwise count every mid-chunk wrap crosser as overflow)."""
    grid = Grid.cube(8, 1.0)
    ref = jnp.array([[0.01, 0.5, 0.5],    # wraps low -> high in x
                     [0.99, 0.5, 0.5],    # wraps high -> low in x
                     [0.5, 0.5, 0.98],    # z NOT periodic: true drift
                     [0.3, 0.3, 0.3]])    # plain small drift
    pos = jnp.array([[0.99, 0.5, 0.5],
                     [0.01, 0.5, 0.5],
                     [0.5, 0.5, 0.02],
                     [0.3, 0.305, 0.3]])
    act = jnp.ones(4, bool)
    d = dem.drift_since(pos, ref, act, grid, (True, True, False))
    np.testing.assert_allclose(np.asarray(d),
                               [0.02, 0.02, 0.96, 0.005], atol=1e-6)
    # inactive rows report zero
    d0 = dem.drift_since(pos, ref, jnp.zeros(4, bool), grid,
                         (True, True, False))
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=0)
