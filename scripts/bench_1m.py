"""North-star single-chip measurement: 1M 4-way particles on a 256^3 grid.

Memory-bounded configuration (15.75 GB HBM on 1x v5e): lagged-alpha
exchange with 8-way particle chunking (the (N,S,c) transients lane-pad
10-40x), DEM force chunking, direct-scatter deposit fallback (the anchor
roll buffer would need ~14 GB at 256^3), and the (N,27)-row candidate
gather (the dense-roll table would exceed its slot budget). The
plane-dense exchange is not used here: its (ncells, 8*cap) staging table
lane-pads to ~8.6 GB at 256^3 — the sharded 8-chip path (2.1M cells and
~125k particles per shard) is the intended route to the 50 steps/s target.

Prints one JSON line like bench.py.
"""

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

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
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx = 256
    n_particles = 1_000_000
    length = 1e-3 * nx
    radius = 4e-4

    grid = Grid.cube(nx, length)
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   particle_chunks=8),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=4, max_neighbors=8,
            force_chunks=8,
        ),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=1,
            pressure=pr.PressureSolverConfig(solver="mgpcg", tol=1e-5,
                                             maxiter=40),
        ),
        turbulence=TurbulenceConfig(model="kEqn"),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=4,
        r_max=radius,
    )

    rng = np.random.RandomState(0)
    pos = rng.uniform(0.1 * length, 0.9 * length, (n_particles, 3))
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=pos, radius=radius),
        make_turbulence_state(grid, k0=1e-6),
        cfg, dt=5e-5,
    )

    n_steps = 3
    run = cd.make_scan_fn(cfg, n_steps)

    def materialize(state):
        return float(jnp.sum(state.fluid.p)) + float(jnp.sum(state.particles.pos))

    state, diags = run(state)
    materialize(state)

    t0 = time.perf_counter()
    state, diags = run(state)
    materialize(state)
    dt_wall = (time.perf_counter() - t0) / n_steps

    sps = 1.0 / dt_wall
    print(json.dumps({
        "metric": "coupled steps/sec, 1M 4-way particles, 256^3 grid, 1 chip",
        "value": round(sps, 4),
        "unit": "steps/sec",
        "vs_baseline": round(sps / 50.0, 5),
    }))


if __name__ == "__main__":
    main()
