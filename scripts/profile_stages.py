"""Per-stage timing of the tracked benchmark step on the real TPU.

Timing protocol (CLAUDE.md): block_until_ready can return early on this
backend, so every measurement chains a data dependency through a lax.scan
carry and materializes a derived scalar on the host; stage cost is
(t_k - t_1)/(k - 1) from k-iteration vs 1-iteration scans, which also
cancels dispatch overhead.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_stages.py [--small]
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
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig, pimple_step
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.models import turbulence as turb_mod
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem
    from yade_openfoam_coupling_tpu.ops import pressure as pr
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx = 64 if small else 128
    n_particles = 10_000 if small else 100_000
    length = 1e-3 * nx
    radius = 4e-4

    grid = Grid.cube(nx, length)
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2"),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=4, max_neighbors=8,
            # match bench.py: persistent Verlet list
            list_reuse=True,
        ),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=1,
            pressure=pr.PressureSolverConfig(solver="mgpcg", tol=1e-5, maxiter=40),
        ),
        turbulence=turb_mod.TurbulenceConfig(model="kEqn"),
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

    def timeit(name, scan_fn, k=8):
        """scan_fn(n) -> jitted callable returning a scalar; chained inside."""
        f1, fk = scan_fn(1), scan_fn(k)
        r = float(f1()); r = float(fk())  # compile both
        t0 = time.perf_counter(); r1 = float(f1()); t1 = time.perf_counter()
        tk0 = time.perf_counter(); rk = float(fk()); tk1 = time.perf_counter()
        # repeat for stability
        t0b = time.perf_counter(); _ = float(f1()); t1b = time.perf_counter()
        tkb0 = time.perf_counter(); _ = float(fk()); tkb1 = time.perf_counter()
        one = min(t1 - t0, t1b - t0b)
        kk = min(tk1 - tk0, tkb1 - tkb0)
        ms = (kk - one) / (k - 1) * 1e3
        print(f"{name:32s} {ms:9.2f} ms/iter", flush=True)
        return ms

    fs0, ps0, tb0 = state.fluid, state.particles, state.turb
    dt = state.dt
    tp = cfg.transport

    # --- full step -------------------------------------------------------
    def full(n):
        run = cd.make_scan_fn(cfg, n)
        def go():
            out, _ = run(state)
            return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
        return jax.jit(go)

    # --- exchange only: carry u perturbed by force ------------------------
    def exch(n):
        def go():
            def body(u, _):
                fs = fs0._replace(u=u)
                res = cd.exchange(fs, ps0, grid, cfg.bcs, tp, cfg.coupling, dt)
                u2 = u + 0.0 * (jnp.sum(res.force) + jnp.sum(res.u_source))
                return u2, None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    # --- exchange sub-stages --------------------------------------------------
    from yade_openfoam_coupling_tpu.ops.coupling import (
        gaussian_support, local_support_ops, stencil_offsets,
    )
    from yade_openfoam_coupling_tpu.parallel.ctx import LOCAL
    periodic = cfg.bcs.periodic_axes()
    pfields = cp.ParticleFields(ps0.pos, ps0.vel, ps0.angvel, ps0.radius,
                                ps0.active)

    def sub_inputs(n):
        def go():
            def body(u, _):
                fs = fs0._replace(u=u)
                curl, gp, dtau, ddtu = cd._coupling_inputs(
                    fs, grid, cfg.bcs, tp.nu, dt, LOCAL, cfg.coupling)
                return u + 0.0 * (jnp.sum(gp) + jnp.sum(dtau)), None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    def sub_support(n):
        def go():
            def body(pos, _):
                sup = gaussian_support(pos, ps0.active, grid, periodic,
                                       cfg.coupling)
                return pos + 0.0 * jnp.sum(sup.weights), None
            p, _ = jax.lax.scan(body, ps0.pos, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    sup0 = gaussian_support(ps0.pos, ps0.active, grid, periodic, cfg.coupling)
    ops0 = local_support_ops(sup0, grid, stencil_offsets(cfg.coupling))

    def sub_gather(n):
        def go():
            def body(u, _):
                g = ops0.gather_stack([u, fs0.alpha])
                return u + 0.0 * jnp.sum(g), None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    def sub_deposit(n):
        def go():
            def body(v, _):
                out = ops0.deposit_outer(v)
                return v + 0.0 * jnp.sum(out), None
            v, _ = jax.lax.scan(body, jnp.ones((n_particles, 8), jnp.float32),
                                None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    # --- slot-table exchange only -------------------------------------------
    import dataclasses as _dc
    cfg_slots = _dc.replace(
        cfg, coupling=_dc.replace(cfg.coupling, exchange="slots",
                                  slot_capacity=4),
    )

    def exch_slots(n):
        def go():
            def body(u, _):
                fs = fs0._replace(u=u)
                res = cd.exchange(fs, ps0, grid, cfg.bcs, tp,
                                  cfg_slots.coupling, dt)
                u2 = u + 0.0 * (jnp.sum(res.force) + jnp.sum(res.u_source))
                return u2, None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    # --- plane-dense exchange ------------------------------------------------
    cfg_planes = _dc.replace(
        cfg, coupling=_dc.replace(cfg.coupling, exchange="planes",
                                  slot_capacity=4),
    )

    def exch_planes(n):
        def go():
            def body(u, _):
                fs = fs0._replace(u=u)
                res = cd.exchange(fs, ps0, grid, cfg.bcs, tp,
                                  cfg_planes.coupling, dt)
                u2 = u + 0.0 * (jnp.sum(res.force) + jnp.sum(res.u_source))
                return u2, None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    def full_planes(n):
        run = cd.make_scan_fn(cfg_planes, n)
        def go():
            out, _ = run(state)
            return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
        return jax.jit(go)

    # --- ablations: step with exchange / DEM stubbed out ---------------------
    def _stub_exchange(fs, ps, dt):
        N = ps.pos.shape[0]
        z3 = jnp.zeros((N, 3), jnp.float32)
        return cp.CouplingResult(
            force=z3, torque=z3, alpha=fs.alpha,
            u_particle=fs.u_particle, u_source=fs.u_source,
            u_source_drag=fs.u_source_drag,
            found=ps.active, n_overflow=jnp.int32(0),
        )

    def _stub_dem(ps, hydro, dt_dem):
        return ps.pos, ps.vel, ps.angvel, jnp.int32(0)

    import collections as _col
    _Info = _col.namedtuple("Info", "iters initial_residual final_residual")

    def _stub_fluid(fs, dtv):
        z = jnp.float32(0.0)
        return fs, _Info(jnp.int32(0), z, z)

    def _make_ablated(exchange_fn=None, dem_fn=None, fluid_fn=None):
        def make(n):
            def go():
                def body(s, _):
                    s2, d = cd.coupled_step(s, cfg_planes,
                                            exchange_fn=exchange_fn,
                                            dem_fn=dem_fn,
                                            fluid_fn=fluid_fn)
                    return s2, None
                out, _ = jax.lax.scan(body, state, None, length=n)
                return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
            return jax.jit(go)
        return make

    # --- pressure solve only --------------------------------------------------
    def pressure_only(n):
        from yade_openfoam_coupling_tpu.ops import stencil as st_mod
        from yade_openfoam_coupling_tpu.ops.grid import FieldBC
        alpha_f = st_mod.face_interp(fs0.alpha, FieldBC.uniform("neumann"),
                                     grid)
        rhs0 = jnp.asarray(np.random.RandomState(3).randn(*grid.shape),
                           jnp.float32) * 1e-3
        def go():
            def body(rhs, _):
                res = pr.solve_pressure(
                    alpha_f, rhs, jnp.zeros_like(rhs), grid, cfg.bcs.p,
                    cfg.pimple.pressure)
                return rhs + res.x * 1e-30, None
            rhs, _ = jax.lax.scan(body, rhs0, None, length=n)
            return jnp.sum(rhs)
        return jax.jit(go)

    # --- diagnostics (Courant + continuity + new_dt) -------------------------
    def diags_only(n):
        from yade_openfoam_coupling_tpu.utils.diagnostics import (
            continuity_errors, courant, diffusive_dt_bound, new_dt,
        )
        from yade_openfoam_coupling_tpu.parallel.ctx import LOCAL
        def go():
            def body(phi, _):
                cm, cx = courant(phi, grid, dt, LOCAL)
                d = new_dt(cx, dt, cfg.time,
                           dt_diff=diffusive_dt_bound(grid, tp.nu, 0.0))
                cl, cg = continuity_errors(phi, fs0.alpha, fs0.alpha_old,
                                           grid, dt, LOCAL)
                phi = tuple(p + (cm + d + cl) * 1e-30 for p in phi)
                return phi, None
            phi, _ = jax.lax.scan(body, fs0.phi, None, length=n)
            return jnp.sum(phi[0])
        return jax.jit(go)

    # --- DEM substeps only -------------------------------------------------
    hydro = dem.DEMForces(jnp.zeros_like(ps0.vel), jnp.zeros_like(ps0.vel))
    def dem_only(n):
        def go():
            def body(carry, _):
                pos, vel, ang = carry
                p2, v2, a2, _ = dem.dem_substeps(
                    pos, vel, ang, ps0.radius, ps0.active, hydro,
                    grid, cfg.dem, dt / cfg.n_dem_substeps, cfg.n_dem_substeps,
                    cfg.r_max)
                return (p2, v2, a2), None
            (p, v, a), _ = jax.lax.scan(body, (ps0.pos, ps0.vel, ps0.angvel),
                                        None, length=n)
            return jnp.sum(p) + jnp.sum(v)
        return jax.jit(go)

    # --- DEM substeps with a prebuilt (persistent) list ---------------------
    def dem_reuse(n):
        def go():
            nbr = dem.build_neighbor_list(ps0.pos, ps0.active, grid, cfg.dem,
                                          cfg.r_max)
            def body(carry, _):
                pos, vel, ang = carry
                p2, v2, a2, _ = dem.dem_substeps(
                    pos, vel, ang, ps0.radius, ps0.active, hydro,
                    grid, cfg.dem, dt / cfg.n_dem_substeps, cfg.n_dem_substeps,
                    cfg.r_max, nbr=nbr)
                return (p2, v2, a2), None
            (p, v, a), _ = jax.lax.scan(body, (ps0.pos, ps0.vel, ps0.angvel),
                                        None, length=n)
            return jnp.sum(p) + jnp.sum(v)
        return jax.jit(go)

    # --- neighbor list build only ------------------------------------------
    def nlist(n):
        def go():
            def body(pos, _):
                nbr = dem.build_neighbor_list(pos, ps0.active, grid, cfg.dem,
                                              cfg.r_max)
                pos2 = pos + 0.0 * jnp.sum(nbr.astype(jnp.float32))
                return pos2, None
            pos, _ = jax.lax.scan(body, ps0.pos, None, length=n)
            return jnp.sum(pos)
        return jax.jit(go)

    # --- neighbor force eval only -------------------------------------------
    nbr0 = None
    def nforce(n):
        def go():
            nbr = dem.build_neighbor_list(ps0.pos, ps0.active, grid, cfg.dem,
                                          cfg.r_max)
            def body(carry, _):
                pos, vel = carry
                f, t = dem.neighbor_contact_forces(
                    nbr, pos, vel, ps0.angvel, ps0.radius, ps0.active,
                    grid, cfg.dem)
                vel2 = vel + 0.0 * f
                pos2 = pos + 0.0 * t
                return (pos2, vel2), None
            (p, v), _ = jax.lax.scan(body, (ps0.pos, ps0.vel), None, length=n)
            return jnp.sum(p) + jnp.sum(v)
        return jax.jit(go)

    # --- fluid (pimple + turbulence) only ------------------------------------
    def fluid_only(n):
        g = jnp.asarray(cfg.gravity_fluid, jnp.float32)
        def go():
            def body(fs, _):
                tb = turb_mod.correct(tb0, fs, grid, cfg.bcs, tp.nu, dt,
                                      cfg.turbulence)
                fs2, info = pimple_step(fs, grid, cfg.bcs, tp.nu, tb.nut, g,
                                        dt, cfg.pimple)
                return fs2, None
            fs, _ = jax.lax.scan(body, fs0, None, length=n)
            return jnp.sum(fs.u) + jnp.sum(fs.p)
        return jax.jit(go)

    # --- fluid with Pallas pressure matvec -----------------------------------
    def fluid_pallas(n):
        cfgp = _dc.replace(
            cfg, pimple=_dc.replace(
                cfg.pimple, pressure=_dc.replace(cfg.pimple.pressure,
                                                 use_pallas=True)))
        g = jnp.asarray(cfg.gravity_fluid, jnp.float32)
        def go():
            def body(fs, _):
                tb = turb_mod.correct(tb0, fs, grid, cfg.bcs, tp.nu, dt,
                                      cfg.turbulence)
                fs2, info = pimple_step(fs, grid, cfg.bcs, tp.nu, tb.nut, g,
                                        dt, cfgp.pimple)
                return fs2, None
            fs, _ = jax.lax.scan(body, fs0, None, length=n)
            return jnp.sum(fs.u) + jnp.sum(fs.p)
        return jax.jit(go)

    # --- full step with slots exchange ---------------------------------------
    def full_slots(n):
        run = cd.make_scan_fn(cfg_slots, n)
        def go():
            out, _ = run(state)
            return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
        return jax.jit(go)

    # --- window exchange (round-4 WW bench config) ----------------------------
    cfg_ww = _dc.replace(
        cfg, coupling=_dc.replace(cfg.coupling, exchange="window",
                                  slot_capacity=4, dy_in_kernel=True,
                                  planes_window=0 if small else 1536),
    )

    def exch_window(n):
        def go():
            def body(u, _):
                fs = fs0._replace(u=u)
                res = cd.exchange(fs, ps0, grid, cfg.bcs, tp,
                                  cfg_ww.coupling, dt)
                u2 = u + 0.0 * (jnp.sum(res.force) + jnp.sum(res.u_source))
                return u2, None
            u, _ = jax.lax.scan(body, fs0.u, None, length=n)
            return jnp.sum(u)
        return jax.jit(go)

    # --- fluid / pressure with the spectral preconditioner --------------------
    cfg_fft = _dc.replace(
        cfg, pimple=_dc.replace(
            cfg.pimple, pressure=_dc.replace(cfg.pimple.pressure,
                                             solver="fftpcg")))

    def fluid_fft(n):
        g = jnp.asarray(cfg.gravity_fluid, jnp.float32)
        def go():
            def body(fs, _):
                tb = turb_mod.correct(tb0, fs, grid, cfg.bcs, tp.nu, dt,
                                      cfg.turbulence)
                fs2, info = pimple_step(fs, grid, cfg.bcs, tp.nu, tb.nut, g,
                                        dt, cfg_fft.pimple)
                return fs2, None
            fs, _ = jax.lax.scan(body, fs0, None, length=n)
            return jnp.sum(fs.u) + jnp.sum(fs.p)
        return jax.jit(go)

    def psolve_fft(n):
        from yade_openfoam_coupling_tpu.ops import stencil as st_mod
        from yade_openfoam_coupling_tpu.ops.grid import FieldBC
        alpha_f = st_mod.face_interp(fs0.alpha, FieldBC.uniform("neumann"),
                                     grid)
        rhs0 = jnp.asarray(np.random.RandomState(3).randn(*grid.shape),
                           jnp.float32) * 1e-3
        def go():
            def body(rhs, _):
                res = pr.solve_pressure(
                    alpha_f, rhs, jnp.zeros_like(rhs), grid, cfg.bcs.p,
                    cfg_fft.pimple.pressure)
                return rhs + res.x * 1e-30, None
            rhs, _ = jax.lax.scan(body, rhs0, None, length=n)
            return jnp.sum(rhs)
        return jax.jit(go)

    print(f"config: {n_particles} particles, {nx}^3 grid", flush=True)
    only = [a for a in sys.argv if a.startswith("--only=")]
    sel = only[0].split("=", 1)[1].split(",") if only else None
    def want(name):
        return sel is None or any(s in name for s in sel)
    if want("full coupled step"): timeit("full coupled step", full, k=6)
    if want("exchange"): timeit("exchange", exch, k=6)
    if want("inputs"): timeit("  coupling input stencils", sub_inputs, k=6)
    if want("support"): timeit("  support weights", sub_support, k=6)
    if want("gather"): timeit("  gather_stack (4ch)", sub_gather, k=6)
    if want("deposit"): timeit("  deposit_outer (8ch)", sub_deposit, k=6)
    if want("slots"): timeit("exchange (slots)", exch_slots, k=6)
    if want("full slots"): timeit("full step (slots)", full_slots, k=6)
    if want("planes"): timeit("exchange (planes)", exch_planes, k=6)
    if want("full planes"): timeit("full step (planes)", full_planes, k=6)
    if want("DEM"): timeit("DEM substeps (4)", dem_only, k=6)
    if want("demreuse"): timeit("DEM substeps (prebuilt list)", dem_reuse, k=6)
    if want("list"): timeit("  neighbor list build", nlist, k=6)
    if want("force"): timeit("  neighbor force eval (x1)", nforce, k=8)
    if want("fluid"): timeit("fluid (turb + PIMPLE)", fluid_only, k=6)
    if want("diags"): timeit("diagnostics (Co+continuity)", diags_only, k=6)
    if want("noexch"): timeit("step w/o exchange", _make_ablated(exchange_fn=_stub_exchange), k=6)
    if want("nodem"): timeit("step w/o DEM", _make_ablated(dem_fn=_stub_dem), k=6)
    if want("nofluid"): timeit("step w/o fluid", _make_ablated(fluid_fn=_stub_fluid), k=6)
    if want("psolve"): timeit("pressure solve only", pressure_only, k=6)
    if want("fpallas"): timeit("fluid (pallas pEqn)", fluid_pallas, k=6)
    if want("window"): timeit("exchange (window WW)", exch_window, k=6)
    if want("fftfluid"): timeit("fluid (turb + PIMPLE, fftpcg)", fluid_fft, k=6)
    if want("fftsolve"): timeit("pressure solve only (fftpcg)", psolve_fft, k=6)


if __name__ == "__main__":
    main()
