"""Turbulence closure tests (C6 parity: laminar/kEpsilon/Smagorinsky/kEqn)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yade_openfoam_coupling_tpu.models import turbulence as tb
from yade_openfoam_coupling_tpu.models.fields import make_fluid_state, make_turbulence_state
from yade_openfoam_coupling_tpu.models.piso import FluidBCs
from yade_openfoam_coupling_tpu.ops import stencil as st
from yade_openfoam_coupling_tpu.ops.grid import Grid


def shear_state(grid, rate=2.0):
    """u_x = rate * z : |S| = rate, S2 = rate^2."""
    X = grid.cell_centers()
    u = jnp.stack([rate * X[2], jnp.zeros(grid.shape), jnp.zeros(grid.shape)])
    fs = make_fluid_state(grid)._replace(u=u)
    return fs._replace(phi=st.flux(u, FluidBCs.periodic().u, grid))


def test_strain_rate_shear():
    grid = Grid.cube(16, 1.0)
    bcs = FluidBCs.periodic()
    fs = shear_state(grid, rate=2.0)
    S2 = tb.strain_rate_sq(fs.u, bcs, grid)
    # 2 S:S for pure shear du/dz = 2: S = [[0,0,1],[0,0,0],[1,0,0]], 2S:S = 4
    interior = S2[:, :, 2:-2]
    np.testing.assert_allclose(np.asarray(interior), 4.0, rtol=1e-3)


def test_laminar_zero_nut():
    grid = Grid.cube(8, 1.0)
    fs = shear_state(grid)
    t = tb.correct(
        make_turbulence_state(grid), fs, grid, FluidBCs.periodic(),
        1e-6, 1e-3, tb.TurbulenceConfig(model="laminar"),
    )
    assert float(jnp.max(t.nut)) == 0.0


def test_smagorinsky_nut_value():
    grid = Grid.cube(16, 1.0)
    cfg = tb.TurbulenceConfig(model="Smagorinsky")
    fs = shear_state(grid, rate=2.0)
    t = tb.correct(make_turbulence_state(grid), fs, grid, FluidBCs.periodic(),
                   1e-6, 1e-3, cfg)
    d = tb.les_delta(grid)
    k_sgs = (cfg.ck / cfg.ce) * d * d * 4.0
    expect = cfg.ck * d * np.sqrt(k_sgs)
    got = float(t.nut[8, 8, 8])
    np.testing.assert_allclose(got, expect, rtol=1e-2)


def test_keqn_production_balance():
    """k grows under shear from a seed and nut stays positive & bounded."""
    grid = Grid.cube(16, 1.0)
    cfg = tb.TurbulenceConfig(model="kEqn")
    fs = shear_state(grid, rate=5.0)
    t = make_turbulence_state(grid, k0=1e-4)
    t = t._replace(nut=jnp.full(grid.shape, 1e-4))
    for _ in range(20):
        t = tb.correct(t, fs, grid, FluidBCs.periodic(), 1e-6, 1e-3, cfg)
    assert float(jnp.min(t.k)) > 0.0
    assert float(jnp.max(t.nut)) <= cfg.nut_max
    assert float(jnp.mean(t.k)) > 1e-4  # production won


def test_kepsilon_equilibrium_direction():
    """Under constant shear, k-epsilon approaches P ~ eps equilibrium:
    check k and eps grow from small seeds and nut = Cmu k^2/eps."""
    grid = Grid.cube(8, 1.0)
    cfg = tb.TurbulenceConfig(model="kEpsilon")
    fs = shear_state(grid, rate=10.0)
    t = make_turbulence_state(grid, k0=1e-4, eps0=1e-5)
    t = t._replace(nut=cfg.c_mu * t.k ** 2 / jnp.maximum(t.epsilon, 1e-12))
    for _ in range(50):
        t = tb.correct(t, fs, grid, FluidBCs.periodic(), 1e-6, 5e-4, cfg)
    assert float(jnp.min(t.k)) > 1e-4
    assert float(jnp.min(t.epsilon)) > 1e-5
    nut_expect = cfg.c_mu * np.asarray(t.k) ** 2 / np.asarray(t.epsilon)
    np.testing.assert_allclose(np.asarray(t.nut), np.clip(nut_expect, 0, cfg.nut_max), rtol=1e-4)


def test_unknown_model_raises():
    grid = Grid.cube(8, 1.0)
    fs = shear_state(grid)
    with pytest.raises(ValueError):
        tb.correct(make_turbulence_state(grid), fs, grid, FluidBCs.periodic(),
                   1e-6, 1e-3, tb.TurbulenceConfig(model="bogus"))


def test_kepsilon_wall_functions():
    """Wall-adjacent cells get the standard high-Re treatment:
    eps = Cmu^{3/4} k^{3/2}/(kappa y) and the nutk log-law value."""
    grid = Grid.cube(12, 0.12)           # h = 1 cm
    bcs = FluidBCs.channel_z()           # walls at z lo/hi
    fs = shear_state(grid, rate=10.0)
    cfg = tb.TurbulenceConfig(model="kEpsilon", wall_functions=True)
    k0, e0 = 1e-2, 1e-2
    t0 = make_turbulence_state(grid, k0=k0, eps0=e0)
    t0 = t0._replace(nut=jnp.full(grid.shape, 1e-4))
    nu = 1e-6
    t = tb.correct(t0, fs, grid, bcs, nu, 1e-4, cfg)

    eps = np.asarray(t.epsilon)
    nut = np.asarray(t.nut)
    k = np.asarray(t.k)
    y = 0.5 * grid.spacing[2]
    # wall layer (z=0): epsilonWallFunction value from the UPDATED k
    expect_eps = cfg.c_mu ** 0.75 * k[:, :, 0] ** 1.5 / (cfg.kappa * y)
    np.testing.assert_allclose(eps[:, :, 0], expect_eps, rtol=1e-4)
    # nutk log-law value (y+ ~ cmu^{1/4} sqrt(k) y / nu >> 11 here)
    u_tau = cfg.c_mu ** 0.25 * np.sqrt(k[:, :, 0])
    y_plus = u_tau * y / nu
    assert (y_plus > 11).all()
    expect_nut = nu * (y_plus * cfg.kappa / np.log(cfg.e_wall * y_plus) - 1.0)
    np.testing.assert_allclose(nut[:, :, 0], expect_nut, rtol=1e-3)
    # interior cells untouched by the wall override (eps from transport)
    assert not np.allclose(eps[:, :, 5], expect_eps, rtol=1e-2)


def test_kepsilon_wall_functions_off_matches_plain():
    grid = Grid.cube(8, 0.08)
    bcs = FluidBCs.channel_z()
    fs = shear_state(grid, rate=1.0)
    t0 = make_turbulence_state(grid, k0=1e-3, eps0=1e-3)
    a = tb.correct(t0, fs, grid, bcs, 1e-6, 1e-4,
                   tb.TurbulenceConfig(model="kEpsilon", wall_functions=False))
    b = tb.correct(t0, fs, grid, bcs, 1e-6, 1e-4,
                   tb.TurbulenceConfig(model="kEpsilon", wall_functions=True))
    # interior identical; only the wall layer differs
    np.testing.assert_allclose(np.asarray(a.nut)[:, :, 2:-2],
                               np.asarray(b.nut)[:, :, 2:-2], rtol=1e-6)
