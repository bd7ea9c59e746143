"""Stage budget of the 1M/256^3 north-star step (--fast config of
scripts/bench_1m.py): full step vs exchange / DEM / fluid / Verlet rebuild
in isolation, 1-vs-k scan protocol (CLAUDE.md timing rules).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_1m.py [--small]
(--small = 64^3/16k CPU/quick smoke)
"""

import sys
import time

import numpy as np


def main():
    small = "--small" in sys.argv
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models import turbulence as turb_mod
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig, pimple_step
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem
    from yade_openfoam_coupling_tpu.ops import pressure as pr
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx = 64 if small else 256
    n_particles = 16_000 if small else 1_000_000
    length = 1e-3 * nx
    radius = 4e-4
    grid = Grid.cube(nx, length)
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange="window", slot_capacity=4,
                                   packed_unbin=True, dy_in_kernel=True,
                                   window_dynamic="--dynamic" in sys.argv),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=4, max_neighbors=8,
            force_chunks=8, list_reuse=True, list_rebuild_steps=5,
            refined_neighbors=4, carry_contact=True,
            substep_unroll="--no-unroll" not in sys.argv,
            pair_layout=("rows" if "--rows" in sys.argv else "channels"),
        ),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=1,
            pressure=pr.PressureSolverConfig(
                solver="fftpcg", tol=1e-5, maxiter=40,
                mg=pr.MGConfig(pre_smooth=4, post_smooth=4))),
        turbulence=turb_mod.TurbulenceConfig(model="kEqn"),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=4, r_max=radius,
    )
    rng = np.random.RandomState(0)

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

    def timeit(name, scan_fn, k=4):
        f1, fk = scan_fn(1), scan_fn(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{name:28s} {best:10.1f} ms/iter", flush=True)
        return best

    fs0, ps0, tb0 = state.fluid, state.particles, state.turb
    dt = state.dt
    tp = cfg.transport

    def full(n):
        run = cd.make_scan_fn(cfg, n)
        def go():
            out, _ = run(state)
            return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
        return jax.jit(go)

    def exch(n):
        def go():
            def body(u, _):
                fs = fs0._replace(u=u)
                res = cd.exchange(fs, ps0, grid, cfg.bcs, tp, cfg.coupling, dt)
                return u + 0.0 * (jnp.sum(res.force) + jnp.sum(res.u_source)), None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    def demsub(n):
        hydro0 = dem.DEMForces(jnp.zeros_like(ps0.pos), jnp.zeros_like(ps0.pos))
        def go():
            def body(pos, _):
                p2, v2, a2, ov, fc, tc = dem.dem_substeps(
                    pos, ps0.vel, ps0.angvel, ps0.radius, ps0.active,
                    hydro0, grid, cfg.dem, dt / 4, cfg.n_dem_substeps,
                    cfg.r_max, nbr=ps0.nbr,
                    carried=(ps0.contact_f, ps0.contact_t))
                return pos + 0.0 * jnp.sum(p2), None
            p, _ = jax.lax.scan(body, ps0.pos, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    def rebuild(n):
        def go():
            def body(pos, _):
                nbr = dem.build_neighbor_list(pos, ps0.active, grid,
                                              cfg.dem, cfg.r_max)
                return pos + 0.0 * jnp.sum(nbr[:1, :1].astype(jnp.float32)), None
            p, _ = jax.lax.scan(body, ps0.pos, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    def fluid(n):
        g = jnp.asarray(cfg.gravity_fluid, jnp.float32)
        def go():
            def body(u, _):
                fs = fs0._replace(u=u)
                tb2 = turb_mod.correct(tb0, fs, grid, cfg.bcs, tp.nu, dt,
                                       cfg.turbulence)
                fs2, info = pimple_step(fs, grid, cfg.bcs, tp.nu, tb2.nut, g,
                                        dt, cfg.pimple)
                return u + 0.0 * jnp.sum(fs2.p), None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    # --- exchange internals (round 5): bins vs kernel vs unbin -------------
    from yade_openfoam_coupling_tpu.ops import coupling_window as cw

    pf0 = cp.ParticleFields(ps0.pos, ps0.vel, ps0.angvel, ps0.radius,
                            ps0.active)
    W = cw.window_size(n_particles, nx, cfg.coupling.planes_window)

    def exbins(n):
        def go():
            def body(pos, _):
                bins = cw.window_bins(pf0._replace(pos=pos), grid,
                                      cfg.coupling.slot_capacity, W,
                                      with_angvel=cfg.coupling.use_torque)
                return pos + 0.0 * jnp.sum(bins.dat_win[0, 0, :8]), None
            p, _ = jax.lax.scan(body, ps0.pos, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    bins0 = jax.jit(lambda pos: cw.window_bins(
        pf0._replace(pos=pos), grid, cfg.coupling.slot_capacity, W,
        with_angvel=cfg.coupling.use_torque))(ps0.pos)
    C_in = 10  # u(3) + grad_p(3) + div_tau(3) + prev_alpha(1), no torque
    F0 = jnp.zeros((C_in, nx, nx, nx), jnp.float32)

    def exkern(n):
        periodic = cfg.bcs.periodic_axes()
        def go():
            def body(F, _):
                stks, combos, pres = cw.window_exchange_padded(
                    cw.pad_wrap_zero(F, periodic), bins0.dat_win, grid,
                    periodic, cfg.coupling, 0, tp.nu, tp.rho_f,
                    interpret=jax.default_backend() != "tpu",
                    counts=(bins0.counts if cfg.coupling.window_dynamic
                            else None))
                return F + 0.0 * (jnp.sum(stks[0, 0, 0, :2, :2])
                                  + jnp.sum(pres[0, 0, :2])), None
            F, _ = jax.lax.scan(body, F0, None, length=n)
            return jnp.sum(F)
        return jax.jit(go)

    sel = None
    for a in sys.argv:
        if a.startswith("--only="):
            sel = set(a.split("=", 1)[1].split(","))
    stages = {
        "full": lambda: timeit("full step (K=5 amortized)", full),
        "exch": lambda: timeit("exchange (window)", exch),
        "dem": lambda: timeit("DEM substeps (prebuilt list)", demsub),
        "rebuild": lambda: timeit("Verlet rebuild", rebuild),
        "fluid": lambda: timeit("fluid (turb + pimple)", fluid),
        "exbins": lambda: timeit("exchange: window_bins only", exbins),
        "exkern": lambda: timeit("exchange: pallas kernel only", exkern),
    }
    for name, fn in stages.items():
        if sel is None or name in sel:
            fn()


if __name__ == "__main__":
    main()
