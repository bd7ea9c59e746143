"""The coupled CFD-DEM driver: one jitted step for the whole system.

This module is where the reference's entire two-program architecture
collapses. The reference runs OpenFOAM and Yade as separate MPI programs
(`mpiexec -n 1 yade : -n 2 icoFoamYade`, README.md:29) that synchronize
through blocking sends each step (`FoamYade::setParticleAction`,
`/root/reference/FoamYade/FoamYade.C:605-632`). Here the fluid solve, the
coupling exchange, and the DEM substeps are stages of ONE pure function
`coupled_step`, jit-compiled as a whole, so XLA fuses across what used to
be a process boundary and multi-chip scaling is sharding, not MPMD.

Step order mirrors the reference loop bodies (`icoFoamYade.C:65-148`,
`pimpleFoamYade.C:60-113`):

  1. Courant number + adaptive dt        (CourantNo.H, setDeltaT.H)
  2. refresh coupling inputs             (vGrad, gradP, divT, ddtU_f —
                                          pimpleFoamYade.C:73-76)
  3. coupling exchange                   (setParticleAction)
  4. DEM substeps under the hydro force  (Yade side, SURVEY.md §3.4)
  5. fluid pressure-velocity step        (PISO or PIMPLE + turbulence)
  6. sources implicitly reset            (setSourceZero is a no-op in the
                                          functional formulation: coupling
                                          fields are rebuilt every step)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import coupling as cp
from ..ops import dem as demod
from ..ops import stencil as st
from ..ops.grid import FieldBC, Grid
from ..utils.diagnostics import TimeControls, continuity_errors, courant, new_dt
from . import turbulence as turb_mod
from .fields import (
    FluidState,
    ParticleState,
    SimState,
    StepDiagnostics,
    TurbulenceState,
)
from .pimple import PIMPLEConfig, pimple_step
from .piso import FluidBCs, PISOConfig, piso_step

_NEU = FieldBC.uniform("neumann")


@dataclasses.dataclass(frozen=True)
class TransportProperties:
    """`transportProperties` dictionary parity
    (`icoFoamYade/createFields.H:16-45`: nu, partDensity, fluidDensity)."""

    nu: float = 1e-6
    rho_f: float = 1000.0
    rho_p: float = 2500.0


@dataclasses.dataclass(frozen=True)
class CaseConfig:
    """Full static configuration of a coupled case — the typed equivalent
    of an OpenFOAM case directory (controlDict + fvSolution + fvSchemes +
    transportProperties + turbulenceProperties) plus the Yade-side DEM
    parameters."""

    grid: Grid
    bcs: FluidBCs
    transport: TransportProperties = TransportProperties()
    solver: str = "piso"                 # 'piso' (icoFoamYade) | 'pimple'
    coupling: cp.CouplingConfig = cp.CouplingConfig(gaussian=False)
    dem: demod.DEMConfig = demod.DEMConfig()
    piso: PISOConfig = PISOConfig()
    pimple: PIMPLEConfig = PIMPLEConfig()
    turbulence: turb_mod.TurbulenceConfig = turb_mod.TurbulenceConfig()
    time: TimeControls = TimeControls()
    n_dem_substeps: int = 10             # ceil(dt_fluid/dt_DEM) of exchangeDT
    r_max: float = 1e-3                  # max particle radius (cell lists)
    gravity_fluid: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # Sampled diagnostics: with the chunked scan (dem.list_rebuild_steps>0)
    # the grid-wide diagnostic reductions (Courant, continuity error,
    # max particle speed) run only on the LAST step of each chunk; the
    # other steps report 0 for those fields. Correctness-bearing counters
    # (overflows, Verlet staleness, p residuals) stay per-step. The
    # reference prints its banner every step (`CourantNo.H:48-49`) but the
    # prints are not load-bearing; max-based health assertions still see
    # one honest sample per chunk.
    sampled_diagnostics: bool = False
    # Masked-cell obstacle (immersed boundary): a host-side (nx,ny,nz)
    # boolean array marking SOLID cells — the TPU-native stand-in for the
    # reference's body-fitted internal geometry (OpenFOAM meshes any
    # domain, `icoFoamYade.C:41-42`). See `ops/obstacle.py`. None = all
    # fluid. compare=False: arrays have no unambiguous dataclass equality.
    solid: object = dataclasses.field(default=None, compare=False)

    def periodic_axes(self):
        return self.bcs.periodic_axes()

    def obstacle_masks(self):
        """ObstacleMasks for `solid`, or None. Built at trace time (the
        masks fold into the jitted program as constants)."""
        if self.solid is None:
            return None
        from ..ops import obstacle as ob
        return ob.build_masks(self.solid, self.bcs.periodic_axes())


def _coupling_inputs(fs: FluidState, grid: Grid, bcs: FluidBCs, nu: float, dt,
                     ctx, ccfg: cp.CouplingConfig):
    """The derived grid fields the engine consumes — the refresh block of
    `pimpleFoamYade.C:73-76` (ddtU_f, gradP, divT, vGrad). Fields whose
    force models are disabled (torque -> vGrad/curl, added mass -> ddtU)
    are skipped entirely; the reference computes them unconditionally."""
    up = ctx.pad_v(fs.u, bcs.u)
    need_curl = ccfg.use_torque or not ccfg.gaussian
    if need_curl:
        G = st.grad_vector_padded(up, grid)
        curl_u = st.curl_from_grad(G)
    else:
        curl_u = fs.u  # placeholder, never gathered
    grad_p = st.grad_scalar_padded(ctx.pad_s(fs.p, bcs.p), grid)
    alpha_f = st.face_interp_all_padded(ctx.pad_s(fs.alpha, _NEU))
    div_tau = 2.0 * nu * st.laplacian_gamma_vector_padded(alpha_f, up, grid)
    if ccfg.use_added_mass:
        conv = st.div_phi_vector_padded(fs.phi, up, grid)
        ddt_u = (fs.u - fs.u_old) / dt + conv
    else:
        ddt_u = fs.u  # placeholder, never gathered
    return curl_u, grad_p, div_tau, ddt_u


def exchange(
    fs: FluidState,
    ps: ParticleState,
    grid: Grid,
    bcs: FluidBCs,
    tp: TransportProperties,
    cfg: cp.CouplingConfig,
    dt,
    ctx=None,
) -> cp.CouplingResult:
    """The `setParticleAction` equivalent: one in-memory coupling exchange."""
    from ..parallel.ctx import LOCAL
    ctx = ctx if ctx is not None else LOCAL
    periodic = bcs.periodic_axes()
    curl_u, grad_p, div_tau, ddt_u = _coupling_inputs(fs, grid, bcs, tp.nu, dt, ctx, cfg)
    pf = cp.ParticleFields(ps.pos, ps.vel, ps.angvel, ps.radius, ps.active)
    if cfg.gaussian:
        if cfg.exchange == "planes":
            if cfg.planes_chunks > 1:
                from ..ops.coupling_planes import (
                    gaussian_coupling_planes_chunked,
                )
                fn = gaussian_coupling_planes_chunked
            else:
                from ..ops.coupling_planes import gaussian_coupling_planes
                fn = gaussian_coupling_planes
        elif cfg.exchange == "window":
            from ..ops.coupling_window import gaussian_coupling_window
            fn = gaussian_coupling_window
        elif cfg.exchange == "slots":
            from ..ops.coupling_slots import gaussian_coupling_slots
            fn = gaussian_coupling_slots
        elif cfg.particle_chunks > 1:
            fn = cp.gaussian_coupling_chunked
        else:
            fn = cp.gaussian_coupling
        return fn(
            pf, fs.u, grad_p, div_tau, ddt_u, curl_u,
            grid, periodic, tp.nu, tp.rho_f, dt, cfg,
            prev_alpha=fs.alpha,
        )
    return cp.point_force_coupling(
        pf, fs.u, curl_u, grid, periodic, tp.nu, tp.rho_f, cfg,
    )


def initialize_state(
    fluid: FluidState,
    particles: ParticleState,
    turb: TurbulenceState,
    cfg: CaseConfig,
    dt: float,
    t0: float = 0.0,
) -> SimState:
    """Build a self-consistent initial SimState.

    Runs the coupling once so `alpha` and `alpha_old` both reflect the
    initial particle configuration — otherwise the first step sees a
    spurious ddt(alpha) = (alpha - 1)/dt compaction source that spikes the
    pressure (the reference has the same hazard: `initFields` sets
    alpha = 1 everywhere, `FoamYade.C:68`, regardless of particles)."""
    dt_arr = jnp.asarray(dt, jnp.float32)
    if cfg.solid is not None:
        # consistent initial state: no velocity in solid cells, no flux
        # through blocked faces (the step maintains these invariants)
        from ..ops import obstacle as ob
        m = cfg.obstacle_masks()
        fluid = fluid._replace(u=ob.mask_u(fluid.u, m),
                               phi=ob.mask_flux(fluid.phi, m))
    if cfg.dem.shear_history and particles.shear_xi is None:
        # shear arrays ride the per-substep CONTACT list, whose width is
        # the refined compaction (DEMConfig.refined_neighbors) when active
        M_eff = (cfg.dem.refined_neighbors
                 if 0 < cfg.dem.refined_neighbors < cfg.dem.max_neighbors
                 else cfg.dem.max_neighbors)
        sh = demod.make_shear_state(particles.n_capacity, M_eff)
        particles = particles._replace(shear_xi=sh.xi, shear_ids=sh.ids,
                                       shear_wall=sh.xi_wall)
    if cfg.dem.list_reuse and particles.nbr is None:
        assert cfg.dem.neighbor == "cells", "list_reuse requires neighbor='cells'"
        nbr = demod.build_neighbor_list(
            particles.pos, particles.active, cfg.grid, cfg.dem, cfg.r_max
        )
        particles = particles._replace(nbr=nbr, nbr_ref_pos=particles.pos)
    if cfg.dem.carry_contact and particles.contact_f is None:
        # seed the carried contact force with one exact evaluation so the
        # scan carry structure is static and the first step is bit-equal
        # to the uncarried path (DEMConfig.carry_contact)
        assert cfg.dem.contact_mode == "substep" and not cfg.dem.shear_history
        fc0, tc0 = demod.contact_forces(
            particles.pos, particles.vel, particles.angvel, particles.radius,
            particles.active, cfg.grid, cfg.dem, cfg.r_max,
            nbr=particles.nbr)
        particles = particles._replace(contact_f=fc0, contact_t=tc0)
    # jit the one-off init exchange: eagerly it materializes every
    # transient back-to-back and OOMs at the 1M/256^3 north star (16.00 GB
    # vs 15.75 — the op-by-op dispatch keeps all staging/unbin buffers
    # live at once; under jit XLA schedules them well inside the budget)
    cres = jax.jit(
        lambda f, p, d: exchange(f, p, cfg.grid, cfg.bcs, cfg.transport,
                                 cfg.coupling, d)
    )(fluid, particles, dt_arr)
    fluid = fluid._replace(
        alpha=cres.alpha,
        alpha_old=cres.alpha,
        u_particle=cres.u_particle,
    )
    if cfg.solver == "pimple" and cfg.pimple.p_extrapolate != 0.0 \
            and fluid.p_prev is None:
        fluid = fluid._replace(p_prev=fluid.p)
    return SimState(
        fluid=fluid, particles=particles, turb=turb,
        t=jnp.asarray(t0, jnp.float32), dt=dt_arr, step=jnp.int32(0),
    )


def coupled_step(
    state: SimState,
    cfg: CaseConfig,
    ctx=None,
    exchange_fn=None,
    dem_fn=None,
    fluid_fn=None,
    frozen_list: bool = False,
    lite_diag: bool = False,
) -> Tuple[SimState, StepDiagnostics]:
    """Advance the coupled system one fluid time step.

    `ctx` selects single-device / per-shard execution; `exchange_fn`
    overrides the coupling exchange and `dem_fn` the DEM substep driver
    (the sharded path substitutes its owner-shard + halo-reduction exchange
    and its ghost-refreshing DEM, `parallel/sharded.py` /
    `parallel/particles.py`). Under particle sharding the per-particle
    arrays hold only this shard's slab population."""
    from ..parallel.ctx import LOCAL
    ctx = ctx if ctx is not None else LOCAL
    grid, bcs, tp = cfg.grid, cfg.bcs, cfg.transport
    fs, ps, tb = state.fluid, state.particles, state.turb

    # 1. Courant + adaptive dt (capped by the explicit-diffusion bound —
    #    the reference's fvm::laplacian is implicit and needs no cap;
    #    nut is one step lagged, fine for a stability bound)
    if lite_diag and not cfg.time.adjust_time_step:
        co_mean = co_max = jnp.zeros((), fs.p.dtype)
    else:
        co_mean, co_max = courant(fs.phi, grid, state.dt, ctx)
    if cfg.time.adjust_time_step:
        from ..utils.diagnostics import diffusive_dt_bound
        if cfg.solver == "pimple" and cfg.pimple.implicit_diffusion:
            # fvm::laplacian parity: implicit diffusion has no stability
            # bound — dt is Courant-limited only (PIMPLEConfig docs)
            dt_diff = None
        else:
            nut_max = (ctx.max(jnp.max(tb.nut))
                       if cfg.solver == "pimple" else 0.0)
            dt_diff = diffusive_dt_bound(grid, tp.nu, nut_max)
        dt = new_dt(co_max, state.dt, cfg.time, dt_diff=dt_diff)
        if cfg.dem.enforce_critical_dt or cfg.dem.dynamic_substeps:
            # DEM stability: dt/n_sub <= Rayleigh critical dt (exchangeDT
            # parity — see DEMConfig.enforce_critical_dt). min over shards:
            # radius is per-local-slab under particle sharding. With
            # dynamic_substeps this is only the BACKSTOP for
            # ceil(dt/dt_c) > n_dem_substeps — below it the substep count
            # adapts instead of the fluid dt (DEMConfig.dynamic_substeps).
            dt_c = ctx.min(demod.critical_dt_dynamic(
                ps.radius, ps.active, cfg.dem.params))
            dt = jnp.minimum(dt, cfg.n_dem_substeps * dt_c)
    else:
        dt = state.dt

    # 2-3. coupling exchange
    if exchange_fn is None:
        cres = exchange(fs, ps, grid, bcs, tp, cfg.coupling, dt, ctx)
    else:
        cres = exchange_fn(fs, ps, dt)

    fs = fs._replace(
        alpha=cres.alpha,
        alpha_old=fs.alpha,
        u_source=cres.u_source,
        u_source_drag=cres.u_source_drag,
        u_particle=cres.u_particle,
    )

    # 4. DEM substeps (hydro force held constant over the fluid dt, as in
    #    the reference's once-per-fluid-step force send)
    n_sub = cfg.n_dem_substeps
    if cfg.dem.dynamic_substeps:
        # true exchangeDT semantics (FoamYade.C:537-553): the SUBSTEP COUNT
        # adapts to ceil(dt / dt_crit) each step (static max n_sub, masked
        # zero-dt tail) instead of throttling the fluid dt
        dt_c = ctx.min(demod.critical_dt_dynamic(
            ps.radius, ps.active, cfg.dem.params))
        n_eff = jnp.clip(
            jnp.ceil(dt / dt_c).astype(jnp.int32), 1, n_sub)
        dt_dem = dt / n_eff.astype(dt.dtype)
        dt_seq = jnp.where(jnp.arange(n_sub) < n_eff, dt_dem,
                           jnp.zeros((), dt.dtype))
    else:
        n_eff = jnp.int32(n_sub)
        dt_dem = dt / n_sub
        dt_seq = None
    hydro = demod.DEMForces(cres.force, cres.torque)

    # persistent Verlet list: rebuild under lax.cond only when accumulated
    # drift eats the configured fraction of the skin margin (amortizes the
    # dominant DEM list-build cost over ~10 fluid steps; a stale-but-valid
    # list is a candidate superset, so forces are identical — see
    # DEMConfig.list_reuse). Overflow accounting rides the rebuild branch.
    nbr = None
    n_list_overflow = jnp.int32(0)
    if dem_fn is None and cfg.dem.list_reuse:
        assert cfg.dem.neighbor == "cells", "list_reuse requires neighbor='cells'"
        assert ps.nbr is not None, "initialize_state builds the first list"
        bin_size = demod.effective_bin_size(grid, cfg.dem, cfg.r_max)
        margin = cfg.dem.list_margin_factor * (bin_size - 2.0 * cfg.r_max)
        assert margin > 0.0 or cfg.dem.list_margin_factor < 0, (
            "list_reuse needs skin slack: effective bin size "
            f"{bin_size:g} <= 2*r_max {2 * cfg.r_max:g}")
        if frozen_list:
            # statically-scheduled rebuild (make_scan_fn chunks): use the
            # carried list as-is — NO lax.cond (15.6 ms/step of pure
            # conditional overhead measured on v5e, scripts/abl_r3.py).
            # Safety becomes a diagnostic: particles whose drift since the
            # chunk's rebuild exceeds the skin margin may have unseen
            # contacts — count them as contact overflow (0 = exact).
            nbr = ps.nbr
            disp = demod.drift_since(ps.pos, ps.nbr_ref_pos, ps.active,
                                     grid, cfg.dem.periodic)
            n_list_overflow = jnp.sum((disp >= margin).astype(jnp.int32))
        elif cfg.dem.list_margin_factor < 0:
            # debug/measurement mode: never rebuild, no lax.cond in the
            # graph (quantifies the conditional's own in-context cost)
            nbr = ps.nbr
        else:
            disp = jnp.max(demod.drift_since(
                ps.pos, ps.nbr_ref_pos, ps.active, grid, cfg.dem.periodic))
            need = disp >= margin

            def _rebuild(_):
                nbr2, ov = demod.build_neighbor_list(
                    ps.pos, ps.active, grid, cfg.dem, cfg.r_max,
                    return_overflow=True)
                return nbr2, ps.pos, ov

            def _keep(_):
                return ps.nbr, ps.nbr_ref_pos, jnp.int32(0)

            nbr, ref_pos, n_list_overflow = jax.lax.cond(
                need, _rebuild, _keep, None)
            ps = ps._replace(nbr=nbr, nbr_ref_pos=ref_pos)

    if dem_fn is None:
        if cfg.dem.shear_history:
            pos, vel, angvel, n_overflow, sh = demod.dem_substeps(
                ps.pos, ps.vel, ps.angvel, ps.radius, ps.active,
                hydro, grid, cfg.dem, dt_dem, cfg.n_dem_substeps, cfg.r_max,
                shear=demod.ShearState(ps.shear_xi, ps.shear_ids,
                                       ps.shear_wall),
                pid=ps.pid, nbr=nbr, dt_seq=dt_seq,
            )
            ps = ps._replace(shear_xi=sh.xi, shear_ids=sh.ids,
                             shear_wall=sh.xi_wall)
        elif cfg.dem.carry_contact and cfg.dem.contact_mode == "substep":
            carried = (None if ps.contact_f is None
                       else (ps.contact_f, ps.contact_t))
            pos, vel, angvel, n_overflow, fc, tc = demod.dem_substeps(
                ps.pos, ps.vel, ps.angvel, ps.radius, ps.active,
                hydro, grid, cfg.dem, dt_dem, cfg.n_dem_substeps, cfg.r_max,
                nbr=nbr, carried=carried, dt_seq=dt_seq,
            )
            ps = ps._replace(contact_f=fc, contact_t=tc)
        else:
            pos, vel, angvel, n_overflow = demod.dem_substeps(
                ps.pos, ps.vel, ps.angvel, ps.radius, ps.active,
                hydro, grid, cfg.dem, dt_dem, cfg.n_dem_substeps, cfg.r_max,
                nbr=nbr, dt_seq=dt_seq,
            )
        n_overflow = n_overflow + n_list_overflow
    elif cfg.dem.shear_history:
        # dt_seq only when dynamic (custom dem_fn closures keep the
        # 3-argument signature otherwise)
        if dt_seq is not None:
            pos, vel, angvel, n_overflow, sh = dem_fn(ps, hydro, dt_dem,
                                                      dt_seq)
        else:
            pos, vel, angvel, n_overflow, sh = dem_fn(ps, hydro, dt_dem)
        ps = ps._replace(shear_xi=sh.xi, shear_ids=sh.ids,
                         shear_wall=sh.xi_wall)
    elif dt_seq is not None:
        pos, vel, angvel, n_overflow = dem_fn(ps, hydro, dt_dem, dt_seq)
    else:
        pos, vel, angvel, n_overflow = dem_fn(ps, hydro, dt_dem)
    ps = ps._replace(pos=pos, vel=vel, angvel=angvel)

    # 5. fluid step
    u_prev = fs.u
    masks = cfg.obstacle_masks()
    if fluid_fn is not None:
        fs2, info = fluid_fn(fs, dt)
        tb2 = tb
    elif cfg.solver == "piso":
        fs2, info = piso_step(fs, grid, bcs, tp.nu, dt, cfg.piso, ctx=ctx,
                              masks=masks)
        tb2 = tb
    elif cfg.solver == "pimple":
        tb2 = turb_mod.correct(tb, fs, grid, bcs, tp.nu, dt, cfg.turbulence, ctx=ctx)
        g = jnp.asarray(cfg.gravity_fluid, fs.u.dtype)
        fs2, info = pimple_step(fs, grid, bcs, tp.nu, tb2.nut, g, dt, cfg.pimple, ctx=ctx,
                                masks=masks)
    else:
        raise ValueError(f"unknown solver {cfg.solver!r}")
    fs2 = fs2._replace(u_old=u_prev)
    if fs.p_prev is not None:
        # warm-start bookkeeping (PIMPLEConfig.p_extrapolate): the pressure
        # this step STARTED from becomes next step's p_prev. Only when the
        # state already carries the leaf — scan carries must keep structure.
        fs2 = fs2._replace(p_prev=fs.p)

    # diagnostics (grid-wide reductions skipped on lite_diag steps —
    # see CaseConfig.sampled_diagnostics)
    if lite_diag:
        zero = jnp.zeros((), fs2.p.dtype)
        cont_local = cont_global = max_speed = zero
    else:
        cont_local, cont_global = continuity_errors(
            fs2.phi, fs2.alpha, fs2.alpha_old, grid, dt, ctx
        )
        max_speed = ctx.max(jnp.max(
            jnp.where(ps.active, jnp.linalg.norm(ps.vel, axis=-1), 0.0)
        ))
    diag = StepDiagnostics(
        co_mean=co_mean,
        co_max=co_max,
        cont_err_local=cont_local,
        cont_err_global=cont_global,
        p_iters=info.iters,
        p_initial_residual=info.initial_residual,
        p_final_residual=info.final_residual,
        # particle arrays hold only the local slab population under
        # sharding, so per-particle counters reduce through the ctx
        n_found=ctx.sum(jnp.sum(cres.found.astype(jnp.int32))),
        max_particle_speed=max_speed,
        # silently dropped DEM contacts are a correctness hazard, not a
        # tuning detail (Yade's collider never drops) — surface the count
        n_contact_overflow=ctx.sum(n_overflow),
        n_coupling_overflow=ctx.sum(jnp.asarray(cres.n_overflow, jnp.int32)),
        # migration/ghost buffer overflows; filled in by the sharded body
        n_shard_overflow=jnp.int32(0),
        n_dem_sub=n_eff,
    )

    new_state = SimState(
        fluid=fs2,
        particles=ps,
        turb=tb2,
        t=state.t + dt,
        dt=dt,
        step=state.step + 1,
    )
    return new_state, diag


def make_step_fn(cfg: CaseConfig):
    """jit-compiled single coupled step."""
    return jax.jit(lambda s: coupled_step(s, cfg))


def make_scan_fn(cfg: CaseConfig, n_steps: int, donate: bool = False):
    """jit-compiled `lax.scan` over n_steps coupled steps (the inner loop
    the benchmarks time — zero host round-trips between steps).

    With `cfg.dem.list_rebuild_steps = K > 0` (and `list_reuse`) the scan
    is restructured as chunks of [one unconditional Verlet-list rebuild ->
    K frozen-list steps]: the rebuild amortizes 1/K with NO per-step
    `lax.cond` (see DEMConfig.list_rebuild_steps; staleness is surfaced in
    `StepDiagnostics.n_contact_overflow`).

    `donate=True` donates the input SimState buffers to the call (the
    caller must not reuse the passed-in state) — at the 1M/256^3 scale the
    undonated input pins ~2 GB of HBM across the whole step, which matters
    when the program runs near the 16 GB ceiling."""
    K = cfg.dem.list_rebuild_steps
    chunked = (cfg.dem.list_reuse and K > 0 and cfg.dem.neighbor == "cells")
    jit_kw = {"donate_argnums": (0,)} if donate else {}

    def _finish(jitted):
        if not donate:
            return jitted

        # XLA refuses to donate the same buffer twice; SimState can hold
        # aliased leaves (initialize_state sets nbr_ref_pos = pos). Copy
        # second occurrences on device before the donating call.
        def wrapped(state: SimState):
            seen = set()

            def dedup(x):
                if id(x) in seen:
                    return jnp.asarray(x).copy()
                seen.add(id(x))
                return x

            return jitted(jax.tree.map(dedup, state))

        wrapped.lower = jitted.lower
        return wrapped

    if not chunked:
        def run(state: SimState):
            def body(s, _):
                s, d = coupled_step(s, cfg)
                return s, d
            return jax.lax.scan(body, state, None, length=n_steps)
        return _finish(jax.jit(run, **jit_kw))

    n_chunks, rem = divmod(n_steps, K)
    sizes = [K] * n_chunks + ([rem] if rem else [])

    def rebuild(s: SimState) -> SimState:
        ps = s.particles
        nbr = demod.build_neighbor_list(ps.pos, ps.active, cfg.grid,
                                        cfg.dem, cfg.r_max)
        return s._replace(particles=ps._replace(nbr=nbr, nbr_ref_pos=ps.pos))

    def run(state: SimState):
        diags = []
        for sz in sizes:
            state = rebuild(state)

            if cfg.sampled_diagnostics and sz > 1:
                # sz-1 lite steps (no grid-wide diagnostic reductions),
                # then one fully-diagnosed step closing the chunk
                def body_lite(s, _):
                    s, d = coupled_step(s, cfg, frozen_list=True,
                                        lite_diag=True)
                    return s, d
                state, d = jax.lax.scan(body_lite, state, None, length=sz - 1)
                diags.append(d)
                state, d_last = coupled_step(state, cfg, frozen_list=True)
                diags.append(jax.tree.map(lambda x: jnp.asarray(x)[None],
                                          d_last))
                continue

            def body(s, _):
                s, d = coupled_step(s, cfg, frozen_list=True)
                return s, d
            state, d = jax.lax.scan(body, state, None, length=sz)
            diags.append(d)
        d_all = jax.tree.map(lambda *xs: jnp.concatenate(xs), *diags)
        return state, d_all

    return _finish(jax.jit(run, **jit_kw))
