"""Fixed-bed pressure drop: the deposited drag sources must produce the
packed-bed pressure gradient of the Ergun-blend drag law end-to-end.

A lattice bed of FROZEN particles (dem_fn stub) fills the lower half of an
inflow-driven column. At quasi-steady state the kinematic pressure
gradient across the bed must balance the drag force density:

    dp/dz = coeff(alpha_f, alpha_p, |u_rel|) * |u_rel| / rho_f

with u_rel the interstitial velocity U/alpha_f (continuity through the
bed) and coeff the Wen-Yu/Ergun blend (`coupling.drag_coefficient`,
`/root/reference/FoamYade/FoamYade.C:354-389` — the law itself is
hand-value-tested in test_coupling.py; this test closes the loop through
deposit -> momentum/pressure solve -> BCs)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from yade_openfoam_coupling_tpu.models import coupled as cd
from yade_openfoam_coupling_tpu.models.fields import (
    make_fluid_state, make_particle_state, make_turbulence_state,
)
from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
from yade_openfoam_coupling_tpu.models.piso import FluidBCs
from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig
from yade_openfoam_coupling_tpu.ops import coupling as cp
from yade_openfoam_coupling_tpu.ops import dem
from yade_openfoam_coupling_tpu.ops import pressure as pr
from yade_openfoam_coupling_tpu.ops.grid import (
    DIRICHLET, NEUMANN, PERIODIC, FaceBC, FieldBC, Grid,
)


def test_fixed_bed_pressure_drop_matches_drag_law():
    h = 1e-3
    nx, nz = 12, 24
    grid = Grid.box((nx, nx, nz), (nx * h, nx * h, nz * h))
    U = 2e-3                                  # superficial inlet velocity
    nu, rho_f = 1e-6, 1000.0
    r = 3e-4

    p_bc = FaceBC(PERIODIC)
    bcs = FluidBCs(
        u=FieldBC(((p_bc, p_bc), (p_bc, p_bc),
                   (FaceBC(DIRICHLET, (0.0, 0.0, U)), FaceBC(NEUMANN)))),
        p=FieldBC(((p_bc, p_bc), (p_bc, p_bc),
                   (FaceBC(NEUMANN), FaceBC(NEUMANN)))),
    )
    cfg = cd.CaseConfig(
        grid=grid, bcs=bcs,
        transport=cd.TransportProperties(nu=nu, rho_f=rho_f, rho_p=2500.0),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2"),
        dem=dem.DEMConfig(periodic=(True, True, False),
                          wall_axes=(False, False, True)),
        pimple=PIMPLEConfig(
            n_outer=2, n_correctors=1,
            pressure=pr.PressureSolverConfig(solver="pcg", tol=1e-7,
                                             maxiter=400),
        ),
        turbulence=TurbulenceConfig(model="laminar"),
        n_dem_substeps=1,
        r_max=r,
    )

    # lattice bed in z in [6h, 14h): spacing s -> alpha_p = V_p / s^3
    s = 0.75e-3
    xs = np.arange(s / 2, nx * h - 1e-9, s)
    zs = np.arange(6 * h + s / 2, 14 * h - 1e-9, s)
    X, Y, Z = np.meshgrid(xs, xs, zs, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    vol_p = 4.0 / 3.0 * np.pi * r ** 3
    alpha_p = vol_p / s ** 3
    assert 0.2 < alpha_p < 0.45        # Ergun regime (alpha_f < 0.8)

    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=pos, radius=r),
        make_turbulence_state(grid),
        cfg, dt=2e-4,
    )

    def frozen_dem(ps, hydro, dt_dem):
        return ps.pos, ps.vel, ps.angvel, jnp.int32(0)

    import jax

    def step(s):
        s2, d = cd.coupled_step(s, cfg, dem_fn=frozen_dem)
        return s2

    step = jax.jit(step)
    for _ in range(150):
        state = step(state)

    p_field = np.asarray(state.fluid.p)
    alpha = np.asarray(state.fluid.alpha)
    # plane-averaged pressure inside the bed interior (clear of its ends)
    pz = p_field.mean(axis=(0, 1))
    k0, k1 = 8, 12
    dpdz = (pz[k0] - pz[k1]) / ((k1 - k0) * h)     # positive: p drops upward
    alpha_f = float(alpha[:, :, k0:k1 + 1].mean())

    u_int = U / alpha_f
    coeff = float(cp.drag_coefficient(
        jnp.float32(alpha_f), jnp.float32(1.0 - alpha_f),
        jnp.float32(u_int), jnp.float32(2 * r), nu, rho_f))

    # Faithful balance of the reference's bookkeeping (FoamYade.C:381-386):
    # every particle deposits w*K into uSourceDrag (a cell holding n
    # particles carries n*K, n = alpha_p*Vc/V_p — no cell-volume division,
    # exactly as written in the reference), and the Archimedes reaction
    # (-f_arch deposit) feeds alpha_p * dp/dz back into the fluid:
    #    dp/dz * (1 - alpha_p) = n * K * u_int / rho
    a_p = 1.0 - alpha_f
    n_cell = a_p * grid.cell_volume / vol_p
    expect = n_cell * coeff * u_int / (rho_f * alpha_f)

    assert dpdz > 0.0
    np.testing.assert_allclose(dpdz, expect, rtol=0.10)
