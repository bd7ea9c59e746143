"""North-star single-chip measurement: 1M 4-way particles on a 256^3 grid.

Round 3: the flagship plane-dense exchange now runs here via the
slab-chunked pipeline (`gaussian_coupling_planes_chunked`, 8 x-slabs of
32 planes) — every lane-padded staging/unbin transient is bounded at
~1.1 GB instead of the 8.6 GB monolithic table that forced the sparse
fallback in round 2. DEM keeps the (N,27)-row candidate gather (dense
rolls exceed their slot budget at 213^3 hash bins) with the persistent
Verlet list amortizing the build, and force chunking bounds the
lane-padded force transients.

Prints one JSON line like bench.py.
"""

import json
import sys
import time

import numpy as np


def build_case(argv):
    """(cfg, state) for the north-star config — shared with mem_1m.py so
    the memory analysis inspects EXACTLY the benchmarked program.

    --fast: the round-4 candidate pipeline — window-staged exchange
    (no staging table, so no slab chunking needed even at 256^3;
    packed_unbin keeps the result table at its true 1.07 GB instead of
    the 8.6 GB lane-padded transpose) + the spectral pressure
    preconditioner.
    """
    sys_argv = argv
    fast = "--fast" in sys_argv
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
        coupling=(cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                    stencil_shape="sphere2",
                                    exchange="window", slot_capacity=4,
                                    packed_unbin=True, dy_in_kernel=True,
                                    unbin_gather="--unbin-gather"
                                    in sys_argv,
                                    window_dynamic="--no-dynamic"
                                    not in sys_argv)
                  if fast else
                  cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                    stencil_shape="sphere2",
                                    exchange="planes", slot_capacity=4,
                                    planes_chunks=8, packed_bin="col",
                                    dy_in_kernel=True)),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=4, max_neighbors=8,
            force_chunks=8, list_reuse=True,
            # round-3 wins, measured at the tracked config (PERF.md):
            # statically-scheduled rebuild (no per-step lax.cond) +
            # distance-refined candidate rows
            list_rebuild_steps=5, refined_neighbors=4,
            carry_contact=True,
            # round-5: unrolled substep scan (micro_dem1m_b.py: the rolled
            # 4-substep scan pays ~72 ms/substep of carry round-trips at
            # 1M — 978 vs 690 ms unrolled)
            substep_unroll="--no-unroll" not in sys_argv,
            # round-5: channel-major pair math (micro_dem1m_d: the rows
            # layout pays a 32-85x lane-padding tax on every VPU op —
            # 1255.6 -> 179.5 ms for the chained 4-substep contact chain)
            pair_layout=("rows" if "--rows" in sys_argv else "channels"),
        ),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=1,
            pressure=pr.PressureSolverConfig(
                solver="fftpcg" if fast else "mgpcg", tol=1e-5, maxiter=40,
                mg=pr.MGConfig(pre_smooth=4, post_smooth=4)),
        ),
        turbulence=TurbulenceConfig(model="kEqn"),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=4,
        r_max=radius,
    )

    rng = np.random.RandomState(0)
    # jittered non-overlapping lattice: a random-uniform cloud at this
    # density contains overlapping pairs whose spring blow-apart creates
    # multi-m/s particles — unphysical for a suspension and hostile to the
    # Verlet-skin schedule (the staleness assertion below would fire)
    def lattice_positions(n, lo, hi, jitter):
        k = int(np.ceil(n ** (1.0 / 3.0)))
        g = np.stack(np.meshgrid(*[np.linspace(lo, hi, k)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)[:n]
        return g + rng.uniform(-jitter, jitter, g.shape)
    pos = lattice_positions(n_particles, 0.1 * length, 0.9 * length,
                            0.2 * length / int(np.ceil(n_particles ** (1/3.))))
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=pos, radius=radius),
        make_turbulence_state(grid, k0=1e-6),
        cfg, dt=5e-5,
    )
    return cfg, state


def main():
    import jax
    import jax.numpy as jnp
    from yade_openfoam_coupling_tpu.models import coupled as cd

    cfg, state = build_case(sys.argv)
    n_steps = 3
    run = cd.make_scan_fn(cfg, n_steps,
                          donate="--no-donate" not in sys.argv)

    def materialize(state):
        return float(jnp.sum(state.fluid.p)) + float(jnp.sum(state.particles.pos))

    state, diags = run(state)
    materialize(state)

    t0 = time.perf_counter()
    state, diags = run(state)
    materialize(state)
    dt_wall = (time.perf_counter() - t0) / n_steps

    sps = 1.0 / dt_wall
    # verdict honesty: demonstrate no capacity drops and full location
    ovf = [int(np.asarray(diags.n_contact_overflow).sum()),
           int(np.asarray(diags.n_coupling_overflow).sum()),
           int(np.asarray(diags.n_shard_overflow).sum())]
    print(json.dumps({
        "metric": "coupled steps/sec, 1M 4-way particles, 256^3 grid, 1 chip",
        "value": round(sps, 4),
        "unit": "steps/sec",
        "vs_baseline": round(sps / 50.0, 5),
        "overflows": ovf,
        "n_found": int(np.asarray(diags.n_found)[-1]),
        "p_iters": np.asarray(diags.p_iters).reshape(-1).tolist(),
        "p_final_residual": float(np.asarray(diags.p_final_residual)[-1]),
    }))


if __name__ == "__main__":
    main()
