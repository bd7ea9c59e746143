"""Measure the SHARDED program on ONE real TPU chip (n=1 mesh) at the
tracked 100k/128^3 config — VERDICT r2 item 3.

The v5e-8 projection previously rested on per-shard-size scaling of the
LOCAL program; this measures the sharded step's own overhead (ring
ppermute hops, halo-reduction deposits, psum'd CG, slab-slot particle
layout) against the single-device step on identical physics. With n=1
every collective is a self-permute, so the delta is pure program-structure
cost — an upper bound on what the 8-chip program pays beyond ICI wire
time.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_sharded1.py
"""

import json
import sys
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
    from yade_openfoam_coupling_tpu.parallel import make_mesh
    from yade_openfoam_coupling_tpu.parallel import sharded as sh

    nx, n_particles = 128, 100_000
    length = 1e-3 * nx
    radius = 4e-4
    grid = Grid.cube(nx, length)
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        # round-3 winners that apply under sharding (carry_contact is
        # single-device-only; rebuild cadence is the sharded path's own)
        # round-4 refresh: packed_unbin dropped (measured -6.3 ms
        # regression, PERF round-4 batch 1), fftpcg pressure solver
        # round-5: the window exchange is ported to the sharded path —
        # measured against planes below (--exchange=planes to flip back)
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange=("planes" if "--exchange=planes"
                                             in sys.argv else "window"),
                                   slot_capacity=4,
                                   packed_bin="col", dy_in_kernel=True,
                                   # round-5 tracked-config winner (abl DW)
                                   window_dynamic="--no-dynamic"
                                   not in sys.argv),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=4, max_neighbors=8,
            refined_neighbors=4,
            # chunked sharded scan: ONE migration + ONE ghost-plan/Verlet
            # build per K steps (extended-window exchange keeps drifted
            # particles coupled) — the sharded analog of the local
            # statically-scheduled rebuild
            list_reuse=True, list_rebuild_steps=10,
            substep_unroll=True,
            pair_layout=("rows" if "--rows" in sys.argv else "channels"),
        ),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=1,
            pressure=pr.PressureSolverConfig(
                solver="fftpcg", tol=1e-5, maxiter=40,
                mg=pr.MGConfig(pre_smooth=4, post_smooth=4))),
        turbulence=TurbulenceConfig(model="kEqn"),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=4, r_max=radius,
    )
    rng = np.random.RandomState(0)
    pos = rng.uniform(0.1 * length, 0.9 * length, (n_particles, 3))
    state = cd.initialize_state(
        make_fluid_state(grid), make_particle_state(pos=pos, radius=radius),
        make_turbulence_state(grid, k0=1e-6), cfg, dt=5e-5)

    mesh = make_mesh(1)
    sstate = sh.to_sharded_state(state, cfg, mesh)

    import dataclasses as _dc
    cfg_step = _dc.replace(
        cfg, dem=_dc.replace(cfg.dem, list_reuse=False,
                             list_rebuild_steps=0))

    def runner(c, n):
        run = sh.make_sharded_scan(c, mesh, n)
        def go():
            out, _ = run(sstate)
            return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
        return jax.jit(go)

    def measure(label, c, k):
        # k chosen so the extra (k-1) steps carry exactly (k-1)/K extra
        # chunk builds: the 1-call does 1 build, the k-call ceil(k/K) —
        # with K=10, k=21 the delta is 2 builds per 20 steps = the true
        # 1/10 amortized cost (the 1-vs-k trap, CLAUDE.md)
        f1, fk = runner(c, 1), runner(c, k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(json.dumps({
            "metric": f"sharded-program step ms on a 1-shard mesh, "
                      f"100k/128^3 [{label}]",
            "value": round(best, 2),
            "unit": "ms/step",
        }), flush=True)
        return best

    ex = cfg.coupling.exchange
    measure(f"per-step migrate+rebuild, {ex}", cfg_step, 6)
    measure(f"chunked K=10, {ex}", cfg, 21)


if __name__ == "__main__":
    main()
