"""State pytrees: fluid, particles, turbulence, and the coupled sim state.

The reference splits this state across two processes: grid fields live in
OpenFOAM (`/root/reference/icoFoamYade/createFields.H`,
`pimpleFoamYade/createFields.H`) and particle state lives in Yade, crossing
the MPI boundary as 10-double records (`FoamYade.C:190-219`). Here both are
leaves of one pytree advanced by one jitted step, so "communication" is a
gather/scatter and checkpointing captures the *whole* coupled state (the
reference checkpoints only the fluid half — SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.grid import Grid

FaceFlux = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


class FluidState(NamedTuple):
    """The grid half of the coupled state.

    Mirrors the field set of `createFields.H` (icoFoamYade:16-169 /
    pimpleFoamYade:32-261): U, p, phi plus the four coupling fields the
    engine writes (`FoamYade.H:85-90`) and alpha's previous value for
    ddt(alpha) in the PIMPLE pressure equation (`pEqn.H:30`)."""

    u: jnp.ndarray              # (3, nx, ny, nz) velocity
    u_old: jnp.ndarray          # previous-step velocity (ddt inputs)
    p: jnp.ndarray              # (nx, ny, nz) kinematic pressure p/rho
    phi: FaceFlux               # face-normal velocities
    alpha: jnp.ndarray          # fluid volume fraction (1 in point mode)
    alpha_old: jnp.ndarray
    u_source: jnp.ndarray       # (3, grid) explicit momentum source [m/s^2]
    u_source_drag: jnp.ndarray  # implicit drag coefficient [1/s], <= 0
    u_particle: jnp.ndarray     # (3, grid) cell-averaged particle velocity
    # end-of-previous-step pressure (PIMPLEConfig.p_extrapolate warm start:
    # first solve of the step starts from p + (p - p_prev), cutting CG
    # iterations in smooth flows); None disables
    p_prev: Optional[jnp.ndarray] = None


class TurbulenceState(NamedTuple):
    """Closure state for the DPM turbulence models (reference C6,
    `DPMTurbulenceModels.C:37-77`: laminar/kEpsilon/Smagorinsky/kEqn)."""

    k: jnp.ndarray       # turbulent kinetic energy (unused by laminar/Smag)
    epsilon: jnp.ndarray # dissipation (kEpsilon only)
    nut: jnp.ndarray     # eddy viscosity


class ParticleState(NamedTuple):
    """Fixed-capacity SoA particle arrays — the DEM half.

    The wire record of the reference (pos, linVel, rotVel, radius —
    `FoamYade.C:190-219`) plus what Yade keeps on its side (mass/inertia
    implied by radius & density). `active` masks capacity padding."""

    pos: jnp.ndarray       # (N, 3)
    vel: jnp.ndarray       # (N, 3)
    angvel: jnp.ndarray    # (N, 3)
    radius: jnp.ndarray    # (N,)
    active: jnp.ndarray    # (N,) bool
    # stable particle identity (int32; -1 for capacity padding). Slot order
    # is NOT stable once particles migrate between shards
    # (`parallel/particles.py`), so cross-run comparisons key on pid — the
    # same role as Yade's body ids in the reference's per-rank buffers.
    pid: jnp.ndarray       # (N,)
    # tangential shear-spring history (DEMConfig.shear_history; None when
    # disabled): displacement per Verlet-list slot + the neighbor ids the
    # slots belong to, plus one wall-contact spring per axis (Yade keeps
    # the same state per persistent contact)
    shear_xi: Optional[jnp.ndarray] = None    # (N, M, 3)
    shear_ids: Optional[jnp.ndarray] = None   # (N, M) int32
    shear_wall: Optional[jnp.ndarray] = None  # (N, 3, 3)
    # persistent Verlet candidate list (DEMConfig.list_reuse; None when
    # disabled): the (N, M) neighbor ids last built and the positions at
    # build time (the displacement reference of the skin criterion)
    nbr: Optional[jnp.ndarray] = None         # (N, M) int32
    nbr_ref_pos: Optional[jnp.ndarray] = None # (N, 3)
    # carried contact force/torque of the last DEM substep evaluation
    # (DEMConfig.carry_contact; None when disabled) — re-composes the
    # next step's initial Verlet acceleration without a force evaluation
    contact_f: Optional[jnp.ndarray] = None   # (N, 3)
    contact_t: Optional[jnp.ndarray] = None   # (N, 3)

    @property
    def n_capacity(self) -> int:
        return self.pos.shape[0]


class SimState(NamedTuple):
    """Everything one coupled step advances."""

    fluid: FluidState
    particles: ParticleState
    turb: TurbulenceState
    t: jnp.ndarray          # simulation time
    dt: jnp.ndarray         # current fluid time step (adaptive)
    step: jnp.ndarray       # int32 step counter


class StepDiagnostics(NamedTuple):
    """Per-step observability, matching the reference's step banner:
    Courant mean/max (`CourantNo.H:48-49`), continuity errors
    (`continuityErrs.H:42-45`), pressure-solver iterations/residuals
    (OpenFOAM solver log), and particle force summary."""

    co_mean: jnp.ndarray
    co_max: jnp.ndarray
    cont_err_local: jnp.ndarray
    cont_err_global: jnp.ndarray
    p_iters: jnp.ndarray
    p_initial_residual: jnp.ndarray
    p_final_residual: jnp.ndarray
    n_found: jnp.ndarray        # particles located in the domain
    max_particle_speed: jnp.ndarray
    n_contact_overflow: jnp.ndarray  # DEM neighbor-list capacity drops (0 = exact)
    n_coupling_overflow: jnp.ndarray  # slot-exchange capacity drops (0 = exact)
    n_shard_overflow: jnp.ndarray    # particle migration/ghost buffer drops
    # effective DEM substep count this step: ceil(dt/dt_crit) under
    # DEMConfig.dynamic_substeps, the static n_dem_substeps otherwise
    # (the observable of the reference's exchangeDT negotiation)
    n_dem_sub: jnp.ndarray


def make_fluid_state(grid: Grid, dtype=jnp.float32) -> FluidState:
    ones = jnp.ones(grid.shape, dtype)
    return FluidState(
        u=grid.zeros_vector(dtype),
        u_old=grid.zeros_vector(dtype),
        p=grid.zeros_scalar(dtype),
        phi=grid.zeros_flux(dtype),
        alpha=ones,
        alpha_old=ones,
        u_source=grid.zeros_vector(dtype),
        u_source_drag=grid.zeros_scalar(dtype),
        u_particle=grid.zeros_vector(dtype),
    )


def make_turbulence_state(grid: Grid, k0: float = 0.0, eps0: float = 0.0,
                          dtype=jnp.float32) -> TurbulenceState:
    return TurbulenceState(
        k=jnp.full(grid.shape, k0, dtype),
        epsilon=jnp.full(grid.shape, eps0, dtype),
        nut=grid.zeros_scalar(dtype),
    )


def make_particle_state(
    pos, vel=None, angvel=None, radius=0.001, capacity: Optional[int] = None,
    dtype=jnp.float32,
) -> ParticleState:
    """Build a padded particle state from (n,3) positions."""
    pos = jnp.asarray(pos, dtype)
    n = pos.shape[0]
    cap = capacity if capacity is not None else n
    assert cap >= n

    def pad2(x, fill=0.0):
        return jnp.concatenate([x, jnp.full((cap - n,) + x.shape[1:], fill, dtype)])

    vel = jnp.zeros((n, 3), dtype) if vel is None else jnp.asarray(vel, dtype)
    angvel = jnp.zeros((n, 3), dtype) if angvel is None else jnp.asarray(angvel, dtype)
    radius = (
        jnp.full((n,), radius, dtype)
        if jnp.ndim(radius) == 0
        else jnp.asarray(radius, dtype)
    )
    active = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(cap - n, bool)])
    pid = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.full(cap - n, -1, jnp.int32)]
    )
    return ParticleState(
        pos=pad2(pos), vel=pad2(vel), angvel=pad2(angvel),
        radius=pad2(radius, 1e-6), active=active, pid=pid,
    )
