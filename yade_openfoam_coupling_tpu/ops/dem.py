"""Discrete-element engine: contacts, neighbor search, leapfrog integration.

The reference outsources the DEM half to Yade (its `FoamCoupling` engine —
not in the reference repo; protocol documented in SURVEY.md §3.4): Yade
applies the hydrodynamic force received over MPI, runs
ceil(dt_fluid/dt_DEM) spring-dashpot substeps, and sends back particle
state. A self-contained framework needs the DEM side too, so this module
implements the standard Yade-style contact model TPU-natively:

* linear spring-dashpot normal contact + Coulomb-capped tangential friction
  (Cundall-Strack, the model class of Yade's default
  Law2_ScGeom_FrictPhys_CundallStrack),
* neighbor search by uniform-grid cell hashing — vectorized sort +
  fixed-occupancy bins (the jax-md cell-list pattern) instead of Yade's
  sweep-and-prune collider; an O(N^2) all-pairs path for small N,
* wall contacts against the domain box faces, minimum-image convention on
  periodic axes,
* symplectic leapfrog (velocity-Verlet) with `lax.scan` sub-stepping driven
  by the dt_fluid/dt_DEM ratio — the in-memory replacement of the
  `exchangeDT` handshake (`/root/reference/FoamYade/FoamYade.C:537-553`).

Everything is fixed-shape and mask-based: inactive capacity padding takes
part in the math with zero radius/force and is never branched on.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from .grid import Grid


@dataclasses.dataclass(frozen=True)
class ContactParams:
    """Linear spring-dashpot contact model parameters (Yade FrictMat-style)."""

    kn: float = 1.0e4        # normal stiffness [N/m]
    kt_over_kn: float = 0.5  # tangential/normal stiffness ratio
    restitution: float = 0.5 # normal restitution -> dashpot coefficient
    friction: float = 0.5    # Coulomb friction coefficient
    rho_p: float = 2500.0    # particle material density


@dataclasses.dataclass(frozen=True)
class DEMConfig:
    params: ContactParams = ContactParams()
    gravity: tuple[float, float, float] = (0.0, 0.0, -9.81)
    # buoyancy adds -rho_f * V_p * g; in 4-way (Gaussian) mode the Archimedes
    # force already carries the hydrostatic -grad p, so leave this False
    # there; in point-force mode (icoFoamYade) the fluid has no gravity term
    # and the net weight must be applied here.
    buoyancy: bool = False
    rho_f: float = 1000.0
    # neighbor search: 'allpairs' (exact, O(N^2), fine to ~4k) or 'cells'
    neighbor: str = "allpairs"
    cell_capacity: int = 8       # max particles per hash cell ('cells' mode)
    # contact evaluation cadence: 'substep' (every DEM substep — Yade's
    # behavior) or 'step' (once per fluid step, force held constant over the
    # substeps — valid for soft/rare contacts, large speedup at scale)
    contact_mode: str = "substep"
    # Verlet-list parameters ('cells' mode): candidate lists are built once
    # per fluid step from bins of size 2*r_max*(1+skin) and compacted to
    # max_neighbors entries; forces are then evaluated per substep against
    # the fixed list (standard Verlet-skin practice — valid while the
    # per-fluid-step displacement stays under skin*r_max)
    max_neighbors: int = 12
    skin: float = 0.5
    # rebuild the Verlet list every k substeps inside dem_substeps
    # (0 = once per call — right when the caller rebuilds per fluid step)
    list_rebuild_every: int = 0
    # Persistent Verlet list across FLUID steps: the coupled step carries
    # the candidate list (`ParticleState.nbr`) and rebuilds it under
    # `lax.cond` only when the max displacement since the last build
    # exceeds `list_margin_factor` x (bin_size - 2*r_max) — the classic
    # Verlet-skin reuse criterion. A stale-but-valid list is a superset of
    # all touching pairs, so forces are bit-identical to per-step rebuild
    # (tests/test_dem_verlet.py). The list build is the largest DEM cost
    # (23 ms at the 100k benchmark, PERF.md), so amortizing it over ~10
    # steps is the round-3 headline DEM win. Single-device path only; the
    # sharded driver keeps per-step rebuild (ghost ids reshuffle).
    list_reuse: bool = False
    # fraction of the geometric safety margin (bin - 2*r_max) that total
    # drift may consume before a rebuild; 0.5 = the standard "skin/2 per
    # particle" bound (two particles approaching from opposite sides)
    list_margin_factor: float = 0.5
    # Statically scheduled rebuild (the fast path): with K > 0,
    # `make_scan_fn` restructures its scan as ceil(n/K) chunks of
    # [unconditional rebuild -> K frozen-list coupled steps]. This removes
    # the per-step `lax.cond` entirely — measured at 15.6 ms/step of pure
    # conditional overhead on v5e (scripts/abl_r3.py H vs A) — while the
    # skin-criterion safety moves to a DIAGNOSTIC: frozen steps count
    # particles whose drift exceeded the margin into
    # `StepDiagnostics.n_contact_overflow` (0 = list provably valid;
    # bench.py asserts it). K=0 keeps the per-step cond (single-step
    # drivers, adaptive workloads).
    list_rebuild_steps: int = 0
    # cap on hash-bin count: the (nbin, cap) slot table is lane-padded, so
    # HBM cost ~ nbin * 512 B regardless of cap <= 128; bins are enlarged
    # (and should carry a bigger cap) when the 2r(1+skin) sizing would
    # exceed this
    max_bins: int = 2_000_000
    # build the candidate table by 27 static rolls + one transpose instead
    # of a (N,27)-row bin gather (the dominant list-build cost: 2.7M index
    # rows, ~19 ms at 100k). The v1 construction (reshape each roll to
    # (bx,by,bz,cap)) OOM'd on TPU — cap=4 minor dims lane-pad 32x
    # (~580 MB per HLO temp); v2 keeps every intermediate either fused
    # (minor dim bz*cap) or flat, pays one (27, nbin*cap) -> (nbin*cap, 27)
    # transpose, and fetches candidates with a cap-row gather (cap*N rows).
    dense_rolls: bool = True
    # evaluate contact forces in this many particle chunks (lax.map) — the
    # (N, M, 11) candidate-data transient is lane-padded ~12x, so bound it
    # at large N. 1 = unchunked.
    force_chunks: int = 1
    # Carry the CONTACT force/torque across fluid steps: velocity Verlet
    # needs the acceleration at the start of each substep run, and the
    # previous step's LAST evaluation was at exactly the current
    # (pos, vel, angvel) — only the (held-constant) hydro force changed.
    # Re-composing a0 from the carried contact force skips one of the
    # n_sub+1 force evaluations per fluid step (~1.8 ms at the 100k
    # benchmark). Exact while the carried list is a valid superset (the
    # same Verlet-skin contract as list_reuse). substep contact_mode,
    # non-shear path only; `coupled_step` threads
    # `ParticleState.contact_f/contact_t`.
    carry_contact: bool = False
    # Fetch candidate rows in bin-sorted particle order (sequential walk
    # of the (nbin, cap*27) table instead of random rows; the result is
    # un-sorted with one cheap N-row gather). Only affects the dense-roll
    # path with force_chunks=1.
    sorted_fetch: bool = False
    # Distance-refined candidate compaction (0 = off). After the
    # bin-neighborhood top_k, gather the M candidates' positions once and
    # keep only pairs within reach before the NEXT rebuild: cutoff =
    # 2*r_max + 2*margin, margin = list_margin_factor*(bin_size-2*r_max)
    # — the same Verlet-skin bound that schedules rebuilds (two particles
    # each drifting < margin close their gap by < 2*margin, so an
    # out-of-cutoff pair provably cannot touch while the list is live).
    # The surviving pairs compact to `refined_neighbors` rows, shrinking
    # every per-substep force gather (N*M rows) and the shear-history
    # carry; in-cutoff candidates dropped beyond the cap count as overflow
    # (same honesty contract as max_neighbors). Requires
    # list_margin_factor > 0.
    refined_neighbors: int = 0
    # walls: per axis, whether the domain box faces are solid walls
    wall_axes: tuple[bool, bool, bool] = (True, True, True)
    periodic: tuple[bool, bool, bool] = (False, False, False)
    # Tangential shear HISTORY (Yade Law2_ScGeom_FrictPhys_CundallStrack
    # parity): integrate a tangential spring displacement per persistent
    # contact, Coulomb-capped with slip feedback, instead of the
    # history-less viscous tangential force. Requires neighbor='cells'
    # (history keys on the Verlet-list slots); carried across list
    # rebuilds by matching neighbor ids. Default off: the history-less
    # model is the documented round-1 behavior and several physics tests
    # pin it.
    shear_history: bool = False
    # Clamp the ADAPTIVE fluid dt so dt/n_dem_substeps never exceeds the
    # Rayleigh-style critical contact dt (`critical_dt_dynamic`) — the
    # in-graph counterpart of the reference's exchangeDT handshake
    # (FoamYade.C:537-553). Divergence, documented: the reference never
    # clamps the FLUID dt (Yade adapts its substep count to
    # ceil(dt_fluid/dt_DEM)); our substep count is static, so enforcing
    # the bound must throttle dt_fluid instead — which can slow
    # contact-free flows enormously. Opt-in: enable for stiff-contact
    # cases with adaptive dt, or raise n_dem_substeps. Only active with
    # TimeControls.adjust_time_step.
    enforce_critical_dt: bool = False
    # Dynamic DEM sub-step COUNT (true exchangeDT parity): each fluid step
    # runs n_eff = ceil(dt_fluid / dt_crit) substeps of dt_fluid / n_eff,
    # with dt_crit the Rayleigh bound from the current radii
    # (`critical_dt_dynamic`) — the in-graph analog of the reference's dt
    # negotiation, where Yade runs ceil(dt_fluid/dt_DEM) substeps of its
    # own stable dt (/root/reference/FoamYade/FoamYade.C:537-553).
    # `CaseConfig.n_dem_substeps` becomes the STATIC MAX of the scan;
    # iterations beyond n_eff run with a zero per-substep dt (exact no-ops
    # for velocity Verlet — position/velocity untouched — though they
    # still pay their force evaluation, so size the max to the stiff
    # regime, not far above it). Under adaptive time stepping the fluid dt
    # is additionally clamped to n_dem_substeps * dt_crit as a backstop
    # (the only case where the fluid is throttled — contrast
    # `enforce_critical_dt`, which throttles the fluid for ANY
    # dt > n_sub * dt_crit instead of raising the substep count).
    dynamic_substeps: bool = False
    # Cundall non-viscous damping (Yade NewtonIntegrator::damping, default
    # 0.2 there): per component, forces that increase |velocity| are
    # reduced by this factor and forces that decrease it amplified —
    # dissipates elastic oscillations (essential for quasi-static packing
    # with the shear spring, which is otherwise undamped tangentially).
    # Default 0 keeps the round-1 dynamics bit-for-bit.
    cundall_damping: float = 0.0
    # Fully unroll the substep lax.scan(s) (jax.lax.scan unroll=True):
    # identical math (FMA-reassociation-level numerics only), but XLA
    # schedules the substeps as straight-line
    # code instead of a rolled loop that round-trips the (pos, vel, angvel,
    # a, aw, fc, tc) carry (7 x N x 3 f32) through the loop state each
    # iteration. Measured at 1M particles / 4 substeps: 978 -> 690 ms
    # (scripts/micro_dem1m_b.py, v5e) — the carry copies cost ~72 ms per
    # substep at that scale. Costs compile time (body duplicated n_sub
    # times); keep False for large n_sub or memory-tight configs.
    substep_unroll: bool = False
    # Force the candidate row-gather result to materialize ONCE per
    # evaluation (jax.lax.optimization_barrier after `data[nbr]`). Without
    # it XLA is free to duplicate the gather into each consumer fusion
    # (pos_j / vel_j / ang_j / rad-act slice chains), re-paying the ~7
    # ns/row random-row cost several times — the round-5 1M bisect
    # (scripts/micro_dem1m_c.py) measured a chained contact eval at ~4x
    # the raw-gather floor. Measured: NO effect (1255.7 vs 1255.6 ms,
    # micro_dem1m_d) — the gather is not duplicated; kept as a probe.
    gather_barrier: bool = False
    # Pair-force evaluation layout: 'rows' evaluates on the gathered
    # (n, M, 3)/(n, M) arrays (minor dims 3 and M lane-pad 32-85x — every
    # VPU op pays that inflation); 'channels' transposes the gathered
    # candidate table ONCE to (11, M, n) and runs the identical formulas
    # on (M, n) component arrays (minor dim = n, no padding) via
    # `_pair_force_cm`. The 1M bisect measured ~180 ms/eval of pure
    # rows-layout math vs a ~45 ms gather floor (micro_dem1m_d.py);
    # channels removes most of it. Non-shear path only (shear history
    # keeps rows).
    pair_layout: str = "rows"


# dense-roll candidate table budget: the transposed (nbin*cap, 27) gather
# table lane-pads 27 -> 128, i.e. nbin*cap*512 B of HBM; cap the slot count
# so the table stays ~2.5 GB next to the state
ROLL_CAND_SLOT_LIMIT = 5_000_000


def rank_in_sorted_segments(keys_sorted: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = i - (first index of keys_sorted[i]'s run), for an ascending
    key array. An associative cummax scan over segment-start indices — pure
    elementwise passes. Replaces `searchsorted(keys, keys)`, whose binary
    search costs log2(N) sequential gather rounds (measured 11.6 ms for
    N=100k on v5e vs ~0.5 ms for this scan)."""
    n = keys_sorted.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), keys_sorted[1:] != keys_sorted[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_new, idx, 0)
    )
    return idx - seg_start


def particle_mass(radius: jnp.ndarray, rho_p: float) -> jnp.ndarray:
    return rho_p * (4.0 / 3.0) * jnp.pi * radius ** 3


def particle_inertia(radius: jnp.ndarray, rho_p: float) -> jnp.ndarray:
    """Solid-sphere moment of inertia 2/5 m r^2."""
    return 0.4 * particle_mass(radius, rho_p) * radius ** 2


def _normal_damping(kn: float, m_eff: jnp.ndarray, restitution: float) -> jnp.ndarray:
    """Dashpot coefficient from restitution e: c = -2 ln e sqrt(kn m)/sqrt(pi^2+ln^2 e)."""
    e = max(min(restitution, 0.999), 1e-4)
    ln_e = np.log(e)
    beta = -ln_e / np.sqrt(np.pi ** 2 + ln_e ** 2)
    return 2.0 * beta * jnp.sqrt(kn * m_eff)


def _pair_force(
    dx: jnp.ndarray,      # (..., 3) x_i - x_j (minimum image applied)
    vi, vj, wi, wj,       # velocities / angular velocities (...,3)
    ri, rj,               # radii (...)
    mi, mj,               # masses (...)
    p: ContactParams,
    valid,                # (...) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Force and torque on particle i from contact with j (vectorized)."""
    dist = jnp.linalg.norm(dx, axis=-1)
    overlap = ri + rj - dist
    touching = valid & (overlap > 0.0) & (dist > 1e-12)
    dist_safe = jnp.where(dist > 1e-12, dist, 1.0)
    n = dx / dist_safe[..., None]                       # from j toward i

    # relative velocity of i's surface w.r.t. j's surface at the contact
    ci = -ri[..., None] * n                             # contact vec from i
    cj = rj[..., None] * n
    v_rel = (vi + jnp.cross(wi, ci)) - (vj + jnp.cross(wj, cj))
    v_n = jnp.sum(v_rel * n, axis=-1)
    v_t = v_rel - v_n[..., None] * n

    m_eff = (mi * mj) / jnp.maximum(mi + mj, 1e-30)
    cn = _normal_damping(p.kn, m_eff, p.restitution)

    f_n_mag = p.kn * overlap - cn * v_n                 # spring + dashpot
    f_n_mag = jnp.maximum(f_n_mag, 0.0)                 # no cohesion
    f_n = f_n_mag[..., None] * n

    # tangential: viscous (history-less) capped by Coulomb friction.
    # Yade's default law integrates a tangential spring with history; the
    # history-less cap is the standard fixed-shape variant (shear-history
    # state would need a persistent contact table — future round).
    kt = p.kt_over_kn * p.kn
    ct = 2.0 * 0.5 * jnp.sqrt(kt * m_eff)
    f_t = -ct[..., None] * v_t
    f_t_mag = jnp.linalg.norm(f_t, axis=-1)
    cap = p.friction * f_n_mag
    scale = jnp.where(f_t_mag > 1e-30, jnp.minimum(1.0, cap / jnp.maximum(f_t_mag, 1e-30)), 0.0)
    f_t = f_t * scale[..., None]

    f = jnp.where(touching[..., None], f_n + f_t, 0.0)
    torque = jnp.cross(ci, f_t)
    torque = jnp.where(touching[..., None], torque, 0.0)
    return f, torque


class ShearState(NamedTuple):
    """Per-(particle, neighbor-slot) tangential spring history.

    Yade's default contact law integrates a tangential displacement per
    persistent contact (`shearForce` in Law2_ScGeom_FrictPhys_
    CundallStrack); the fixed-shape equivalent keys the history on the
    Verlet-list slots and carries it across rebuilds by PARTNER-KEY match:
    the key is the partner's stable pid when the caller provides pids
    (required under shard migration/ghosting, where local indices
    reshuffle), or the local index otherwise. -1 marks empty slots. Wall
    contacts keep one history slot per axis (the wall's identity — Yade
    walls/facets keep the same per-contact state)."""

    xi: jnp.ndarray        # (N, M, 3) tangential spring displacement
    ids: jnp.ndarray       # (N, M) int32 partner keys (-1 = empty)
    xi_wall: jnp.ndarray   # (N, 3, 3) wall-contact springs, one per axis


def make_shear_state(n: int, max_neighbors: int, dtype=jnp.float32) -> ShearState:
    return ShearState(
        xi=jnp.zeros((n, max_neighbors, 3), dtype),
        ids=jnp.full((n, max_neighbors), -1, jnp.int32),
        xi_wall=jnp.zeros((n, 3, 3), dtype),
    )


def shear_keys(nbr: jnp.ndarray, n_valid: int,
               pid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Partner keys for a neighbor-id array: pid[nbr] when pids are given
    (stable across shard migration/ghost reshuffles), else the local
    index; -1 for empty slots. `pid` must cover every id < n_valid."""
    if pid is None:
        return jnp.where(nbr >= n_valid, -1, nbr)
    pid_ext = jnp.concatenate([pid, jnp.full((1,), -1, jnp.int32)])
    keys = pid_ext[jnp.minimum(nbr, pid.shape[0])]
    return jnp.where(nbr >= n_valid, jnp.int32(-1), keys)


def carry_shear(old: ShearState, new_keys: jnp.ndarray) -> jnp.ndarray:
    """Match each new neighbor slot's partner key against the old list and
    carry its spring displacement; unmatched (new or vanished) contacts
    start at zero. Dense (N, M_new, M_old) compare — no gathers."""
    match = (new_keys[:, :, None] == old.ids[:, None, :]) & (
        old.ids[:, None, :] >= 0
    ) & (new_keys[:, :, None] >= 0)
    return jnp.einsum(
        "nmo,noc->nmc", match.astype(old.xi.dtype), old.xi
    )


def _pair_force_shear(
    dx, vi, vj, wi, wj, ri, rj, mi, mj, p: ContactParams, valid,
    xi, dt,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spring-dashpot normal + HISTORY tangential spring with Coulomb cap
    and slip feedback (Yade Law2_ScGeom_FrictPhys_CundallStrack). Returns
    (force on i, torque on i, updated xi)."""
    dist = jnp.linalg.norm(dx, axis=-1)
    overlap = ri + rj - dist
    touching = valid & (overlap > 0.0) & (dist > 1e-12)
    dist_safe = jnp.where(dist > 1e-12, dist, 1.0)
    n = dx / dist_safe[..., None]

    ci = -ri[..., None] * n
    cj = rj[..., None] * n
    v_rel = (vi + jnp.cross(wi, ci)) - (vj + jnp.cross(wj, cj))
    v_n = jnp.sum(v_rel * n, axis=-1)
    v_t = v_rel - v_n[..., None] * n

    m_eff = (mi * mj) / jnp.maximum(mi + mj, 1e-30)
    cn = _normal_damping(p.kn, m_eff, p.restitution)
    f_n_mag = jnp.maximum(p.kn * overlap - cn * v_n, 0.0)
    f_n = f_n_mag[..., None] * n

    # rotate the stored spring into the current tangent plane, accumulate
    # this step's tangential sliding
    xi_t = xi - jnp.sum(xi * n, axis=-1)[..., None] * n
    xi_acc = xi_t + v_t * dt

    # spring + tangential dashpot (Hertz-Mindlin-style; Yade's pure law
    # omits the dashpot and relies on global damping, which cannot damp
    # contact-frame oscillations superimposed on a net acceleration)
    kt = p.kt_over_kn * p.kn
    ct = _normal_damping(kt, m_eff, p.restitution)
    f_t_trial = -kt * xi_acc - ct[..., None] * v_t
    f_t_mag = jnp.linalg.norm(f_t_trial, axis=-1)
    cap = p.friction * f_n_mag
    over = f_t_mag > jnp.maximum(cap, 1e-30)
    scale = jnp.where(over, cap / jnp.maximum(f_t_mag, 1e-30), 1.0)
    f_t = f_t_trial * scale[..., None]
    # slip: the spring relaxes to the Coulomb cone (Yade's shearForce
    # re-set on plastic slip); sticking keeps the accumulated spring
    xi_new = jnp.where(over[..., None], -f_t / kt, xi_acc)
    xi_new = jnp.where(touching[..., None], xi_new, 0.0)

    f = jnp.where(touching[..., None], f_n + f_t, 0.0)
    torque = jnp.where(touching[..., None], jnp.cross(ci, f_t), 0.0)
    return f, torque, xi_new


def _cross_cm(a, b):
    """Cross product on component triples (each component any shape)."""
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _pair_force_cm(dx, vi, vj, wi, wj, ri, rj, mi, mj,
                   p: ContactParams, valid):
    """`_pair_force` in CHANNEL-MAJOR (structure-of-arrays) form: every
    vector argument is an (x, y, z) tuple of (M, n) component arrays and
    scalars are (M, n)/broadcastable, so the minor dimension of every
    intermediate is the large particle axis.

    Why this exists: the rows-layout pair math runs on (n, M, 3)/(n, M)
    transients whose trailing dims lane-pad 32-85x on TPU — the round-5
    1M bisect (scripts/micro_dem1m_d.py) measured ~180 ms/eval of pure
    elementwise math, ~4x the gather floor, exactly the padding tax.
    Identical formulas, op for op, to `_pair_force`."""
    dist = jnp.sqrt(dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2])
    overlap = ri + rj - dist
    touching = valid & (overlap > 0.0) & (dist > 1e-12)
    dist_safe = jnp.where(dist > 1e-12, dist, 1.0)
    n = tuple(c / dist_safe for c in dx)                # from j toward i

    ci = tuple(-ri * c for c in n)
    cj = tuple(rj * c for c in n)
    v_rel = tuple((vi[k] + wxci) - (vj[k] + wxcj)
                  for k, (wxci, wxcj) in enumerate(
                      zip(_cross_cm(wi, ci), _cross_cm(wj, cj))))
    v_n = v_rel[0] * n[0] + v_rel[1] * n[1] + v_rel[2] * n[2]
    v_t = tuple(v_rel[k] - v_n * n[k] for k in range(3))

    m_eff = (mi * mj) / jnp.maximum(mi + mj, 1e-30)
    cn = _normal_damping(p.kn, m_eff, p.restitution)

    f_n_mag = jnp.maximum(p.kn * overlap - cn * v_n, 0.0)
    f_n = tuple(f_n_mag * c for c in n)

    kt = p.kt_over_kn * p.kn
    ct = 2.0 * 0.5 * jnp.sqrt(kt * m_eff)
    f_t = tuple(-ct * c for c in v_t)
    f_t_mag = jnp.sqrt(f_t[0] * f_t[0] + f_t[1] * f_t[1]
                       + f_t[2] * f_t[2])
    cap = p.friction * f_n_mag
    scale = jnp.where(f_t_mag > 1e-30,
                      jnp.minimum(1.0, cap / jnp.maximum(f_t_mag, 1e-30)),
                      0.0)
    f_t = tuple(c * scale for c in f_t)

    zero = jnp.zeros((), dist.dtype)
    f = tuple(jnp.where(touching, f_n[k] + f_t[k], zero) for k in range(3))
    torque = tuple(jnp.where(touching, c, zero)
                   for c in _cross_cm(ci, f_t))
    return f, torque


def _min_image(dx: jnp.ndarray, grid: Grid, periodic) -> jnp.ndarray:
    L = jnp.asarray(grid.lengths, dx.dtype)
    per = jnp.asarray(periodic)
    wrapped = dx - L * jnp.round(dx / L)
    return jnp.where(per, wrapped, dx)


# ---------------------------------------------------------------------------
# All-pairs contact forces (exact, small N)
# ---------------------------------------------------------------------------

def allpairs_contact_forces(
    pos, vel, angvel, radius, active, grid: Grid, cfg: DEMConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = pos.shape[0]
    p = cfg.params
    m = particle_mass(radius, p.rho_p)

    dx = pos[:, None, :] - pos[None, :, :]
    dx = _min_image(dx, grid, cfg.periodic)
    valid = active[:, None] & active[None, :] & ~jnp.eye(N, dtype=bool)

    f, t = _pair_force(
        dx,
        vel[:, None, :], vel[None, :, :],
        angvel[:, None, :], angvel[None, :, :],
        radius[:, None], radius[None, :],
        m[:, None], m[None, :],
        p, valid,
    )
    return jnp.sum(f, axis=1), jnp.sum(t, axis=1)


# ---------------------------------------------------------------------------
# Cell-list contact forces (large N): sort by hash, fixed-occupancy bins
# ---------------------------------------------------------------------------

def _dem_cell_grid(grid: Grid, r_max: float) -> Tuple[Tuple[int, int, int], Tuple[float, float, float]]:
    """Hash-cell counts and sizes: cells at least 2*r_max wide."""
    dims, sizes = [], []
    for a in range(3):
        L = grid.lengths[a]
        n = max(1, int(np.floor(L / max(2.0 * r_max, 1e-12))))
        dims.append(n)
        sizes.append(L / n)
    return tuple(dims), tuple(sizes)


def _check_periodic_bins(dims, cfg: "DEMConfig") -> None:
    """On a periodic axis with fewer than 3 bins the -1/0/+1 neighbor-bin
    offsets wrap onto the same bin, so candidates appear 2-3x in the
    27*cap list and pair forces double-count. Static shapes -> static check."""
    for a in range(3):
        if cfg.periodic[a] and dims[a] < 3:
            raise ValueError(
                f"periodic axis {a} has only {dims[a]} DEM hash bins "
                f"(domain < 6*r_max*(1+skin)): neighbor bins would alias and "
                f"double-count contacts. Use neighbor='allpairs' for this case."
            )


def cell_list_contact_forces(
    pos, vel, angvel, radius, active, grid: Grid, cfg: DEMConfig, r_max: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(N * 27 * capacity) contact forces via spatial hashing.

    Replaces the role of Yade's collider; same math as `allpairs`, checked
    in tests by equivalence on random packings."""
    N = pos.shape[0]
    p = cfg.params
    cap = cfg.cell_capacity
    dims, sizes = _dem_cell_grid(grid, r_max)
    _check_periodic_bins(dims, cfg)
    ncell = dims[0] * dims[1] * dims[2]

    origin = jnp.asarray(grid.origin, pos.dtype)
    csz = jnp.asarray(sizes, pos.dtype)
    nvec = jnp.asarray(dims, jnp.int32)

    ijk = jnp.floor((pos - origin) / csz).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, nvec - 1)
    cell = ijk[:, 0] * (dims[1] * dims[2]) + ijk[:, 1] * dims[2] + ijk[:, 2]
    cell = jnp.where(active, cell, ncell)           # park inactive in scrap bin

    # stable sort particles by cell; compute each particle's slot in its cell
    order = jnp.argsort(cell)                        # (N,)
    cell_sorted = cell[order]
    # rank within cell: position among equal keys
    idx_in_cell = rank_in_sorted_segments(cell_sorted)
    # bin table: (ncell+1, cap) of particle indices (N = empty)
    table = jnp.full((ncell + 1) * cap, N, jnp.int32)
    slot = jnp.clip(cell_sorted, 0, ncell) * cap + jnp.minimum(idx_in_cell, cap - 1)
    keep = idx_in_cell < cap                        # overflow silently dropped
    table = table.at[jnp.where(keep, slot, (ncell + 1) * cap - 1)].set(
        jnp.where(keep, order.astype(jnp.int32), N)
    )
    table = table.reshape(ncell + 1, cap)

    # gather candidate indices: 27 neighbor cells x cap
    offs = jnp.asarray(
        np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), -1).reshape(-1, 3),
        jnp.int32,
    )                                                # (27,3)
    nb = ijk[:, None, :] + offs[None, :, :]          # (N,27,3)
    per = jnp.asarray(cfg.periodic)
    nb_wrapped = jnp.mod(nb, nvec)
    in_rng = jnp.all((nb >= 0) & (nb < nvec) | per[None, None, :], axis=-1)
    nb_cell = (
        nb_wrapped[..., 0] * (dims[1] * dims[2])
        + nb_wrapped[..., 1] * dims[2]
        + nb_wrapped[..., 2]
    )
    nb_cell = jnp.where(in_rng, nb_cell, ncell)      # scrap bin when off-grid
    cand = table[nb_cell]                            # (N, 27, cap)
    cand = cand.reshape(N, 27 * cap)

    # Pack all per-particle data into one (N+1, 11) table so the candidate
    # fetch is ONE row-gather (TPU gathers pay per index row; payload
    # channels are nearly free): [pos(3) vel(3) angvel(3) radius active].
    m = particle_mass(radius, p.rho_p)
    data = jnp.concatenate(
        [pos, vel, angvel, radius[:, None], active.astype(pos.dtype)[:, None]],
        axis=-1,
    )
    data = jnp.concatenate([data, jnp.zeros((1, 11), data.dtype)])
    dj = data[cand]                                  # (N, 27*cap, 11)
    pos_j, vel_j, ang_j = dj[..., 0:3], dj[..., 3:6], dj[..., 6:9]
    rad_j, act_j = dj[..., 9], dj[..., 10] > 0.5
    m_j = particle_mass(jnp.maximum(rad_j, 1e-12), p.rho_p)

    i_idx = jnp.arange(N, dtype=jnp.int32)[:, None]
    valid = act_j & active[:, None] & (cand != i_idx)

    dx = pos[:, None, :] - pos_j
    dx = _min_image(dx, grid, cfg.periodic)
    f, t = _pair_force(
        dx,
        vel[:, None, :], vel_j,
        angvel[:, None, :], ang_j,
        radius[:, None], rad_j,
        m[:, None], m_j,
        p, valid,
    )
    return jnp.sum(f, axis=1), jnp.sum(t, axis=1)


# ---------------------------------------------------------------------------
# Verlet neighbor lists: build once per fluid step, reuse across substeps
# ---------------------------------------------------------------------------

def drift_since(pos, ref_pos, active, grid: Grid, periodic) -> jnp.ndarray:
    """(N,) max-norm per-particle displacement since ``ref_pos``, with
    MIN-IMAGE distance on periodic axes: a particle that wrapped across
    the box between a Verlet-list build and now has moved ~one skin, not
    ~one box length. Without this, frozen-list staleness diagnostics
    (models/coupled.py, parallel/sharded.py) count every mid-chunk wrap
    crosser as a false-positive contact overflow."""
    d = jnp.abs(pos - ref_pos)
    comps = []
    for a in range(3):
        da = d[:, a]
        if periodic[a]:
            da = jnp.minimum(da, grid.lengths[a] - da)
        comps.append(da)
    d = jnp.stack(comps, axis=-1)
    return jnp.where(active, jnp.max(d, axis=-1), 0.0)


def effective_bin_size(grid: Grid, cfg: DEMConfig, r_max: float) -> float:
    """The hash-bin size `build_neighbor_list` actually uses: the Verlet
    2*r_max*(1+skin) sizing, enlarged when the bin count would exceed
    `max_bins` (callers sizing ghost zones must match this)."""
    bin_size = 2.0 * r_max * (1.0 + cfg.skin)
    vol = grid.lengths[0] * grid.lengths[1] * grid.lengths[2]
    if vol / bin_size ** 3 > cfg.max_bins:
        bin_size = float(np.cbrt(vol / cfg.max_bins))
    return bin_size


def build_neighbor_list(
    pos, active, grid: Grid, cfg: DEMConfig, r_max: float,
    return_overflow: bool = False,
):
    """(N, max_neighbors) int32 candidate indices (N = empty slot).

    With ``return_overflow`` also returns an int32 scalar counting silently
    dropped candidates this build: particles beyond ``cell_capacity`` in
    their hash bin plus per-particle candidates truncated by the
    ``max_neighbors`` top_k compaction. Yade's collider never drops
    contacts; a nonzero count here means capacities need raising
    (surfaced in `StepDiagnostics.n_contact_overflow`).

    TPU-shaped pipeline (every stage chosen from measured v5e costs): one
    N-row scatter bins particles into a (nbin+1, cap) slot table (the
    lane-padded layout costs memory but row-gathers at ~12 ms for 2.7M
    rows, vs 5.6 s for slice-gathers from a flat table); one row-gather
    fetches the 27 neighbor bins' slots per particle; `lax.top_k` on a
    composite (validity<<21 | id) key compacts them to max_neighbors
    (jnp.argsort on (N,216) keys costs seconds). Replaces both Yade's
    sweep-and-prune collider and the reference's per-particle tree walks
    (`meshTree.C`)."""
    N = pos.shape[0]
    cap = cfg.cell_capacity
    M = cfg.max_neighbors
    assert N < (1 << 21), "top_k composite key supports < 2M particles"
    bin_size = effective_bin_size(grid, cfg, r_max)
    dims, sizes = [], []
    for a in range(3):
        L = grid.lengths[a]
        n = max(1, int(np.floor(L / max(bin_size, 1e-12))))
        dims.append(n)
        sizes.append(L / n)
    _check_periodic_bins(dims, cfg)
    bx, by, bz = dims
    nbin = bx * by * bz

    origin = jnp.asarray(grid.origin, pos.dtype)
    csz = jnp.asarray(sizes, pos.dtype)
    nvec = jnp.asarray(dims, jnp.int32)
    ijk = jnp.clip(jnp.floor((pos - origin) / csz).astype(jnp.int32), 0, nvec - 1)
    bin_of = ijk[:, 0] * (by * bz) + ijk[:, 1] * bz + ijk[:, 2]
    bin_of = jnp.where(active, bin_of, nbin)

    # rank within bin via sorted search
    order = jnp.argsort(bin_of)
    bin_sorted = bin_of[order]
    rank = rank_in_sorted_segments(bin_sorted)
    keep = rank < cap

    offs_np = np.stack(
        np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), -1
    ).reshape(-1, 3)

    # bin-capacity drops (slots beyond cap never enter the table)
    n_bin_drop = jnp.sum(((rank >= cap) & (bin_sorted < nbin)).astype(jnp.int32))

    # bin-major flat slot table (bin*cap + rank); ONE N-row scatter
    slot = jnp.clip(bin_sorted, 0, nbin) * cap + jnp.minimum(rank, cap - 1)
    table_flat = jnp.full((nbin + 1) * cap, N, jnp.int32)
    table_flat = table_flat.at[jnp.where(keep, slot, (nbin + 1) * cap - 1)].set(
        jnp.where(keep, order.astype(jnp.int32), N)
    )

    # Candidate fetch. Dense-roll path (kills the hot (N,27)-row bin
    # gather, ~20 ms at the 100k benchmark): build a (nbin, 27*cap)
    # candidate table with 27 static rolls — pure HBM streaming, no index
    # rows — then ONE N-row gather pulls each particle's full candidate
    # row. TPU-layout care: the bin table is viewed with cap FUSED into
    # the minor axis, (bx, by, bz*cap), so z-rolls shift by dz*cap and no
    # 2-D array with a tiny minor dim ever materializes (a (nbin, cap)
    # layout lane-pads cap->128 = 32x; its 27 rolled copies OOM'd a 16 GB
    # chip, and an explicit transpose gets rewritten by XLA into per-part
    # padded transposes — measured, not hypothetical). The roll wrap
    # matches the old mod-wrap semantics (wall-axis wraps are rejected by
    # the minimum-image distance test). Falls back to the per-particle
    # (N,27)-row gather when the dense table would blow the memory budget.
    use_dense = cfg.dense_rolls and nbin * cap <= ROLL_CAND_SLOT_LIMIT

    if use_dense:
        # v2 construction (see dense_rolls docstring): every array here is
        # either fused-minor (bz*cap) or has a large minor dim, so nothing
        # lane-pads catastrophically. Layout of the final table: row
        # bin*cap + slot, 27 neighbor-offset channels (order within the
        # 27*cap candidate set is irrelevant — top_k re-orders by key).
        tbl_fused = table_flat[: nbin * cap].reshape(bx, by, bz * cap)
        parts = [
            jnp.roll(
                tbl_fused,
                (-int(o[0]), -int(o[1]), -int(o[2]) * cap),
                axis=(0, 1, 2),
            ).reshape(-1)
            for o in offs_np
        ]                                                  # 27 x (nbin*cap,)
        candT = jnp.stack(parts).T                         # (nbin*cap, 27)
        cand_rows = candT.reshape(nbin, cap * 27)          # row per bin
        nb_bin = jnp.zeros((N, 27), jnp.int32)            # unused placeholder
        table = None
    else:
        # (nbin+1, cap) row view (the 512 B/row lane padding is the
        # deliberate budget here — PERF.md) + per-axis (N,27) neighbor-bin
        # ids; a (N,27,3) stack would be lane-padded ~40x
        table = table_flat.reshape(nbin + 1, cap)
        nb_bin = 0
        strides = (by * bz, bz, 1)
        for a in range(3):
            off_a = jnp.asarray(offs_np[:, a], jnp.int32)
            nb_bin = nb_bin + jnp.mod(ijk[:, a:a + 1] + off_a[None], nvec[a]) * strides[a]
        nb_bin = jnp.where(active[:, None], nb_bin, nbin)

    do_refine = 0 < cfg.refined_neighbors < M
    if do_refine:
        assert cfg.list_margin_factor > 0, (
            "refined_neighbors needs the Verlet-skin margin to bound the "
            "reach of surviving pairs")
        posx = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)])

    def refine_block(nbr_b, pos_b):
        """Distance-refined compaction (DEMConfig.refined_neighbors): keep
        only candidates reachable before the next rebuild. Runs per block
        so the (n, M, 3) gather transient stays bounded under
        force_chunks."""
        margin = cfg.list_margin_factor * (bin_size - 2.0 * r_max)
        cutoff = 2.0 * r_max + 2.0 * margin
        Mr = cfg.refined_neighbors
        dxp = pos_b[:, None, :] - posx[nbr_b]              # (n, M, 3)
        dxp = _min_image(dxp, grid, cfg.periodic)
        d2 = jnp.sum(dxp * dxp, axis=-1)
        within = (nbr_b != N) & (d2 <= cutoff * cutoff)
        HIGH = jnp.int32(1 << 21)
        key = jnp.where(within, nbr_b + HIGH, 0)
        topk, _ = jax.lax.top_k(key, Mr)
        extra = jnp.sum(jnp.maximum(
            jnp.sum(within.astype(jnp.int32), axis=1) - Mr, 0))
        return jnp.where(topk >= HIGH, topk - HIGH, N), extra

    def compact_block(args):
        bin_b, nb_b, act_b, self_b, pos_b = args     # (n,), (n,27), (n,), (n,1), (n,3)
        if use_dense:
            # ONE row per particle from the (nbin, cap*27) relayout of the
            # transposed table (measured ~1.2 ms cheaper than cap
            # consecutive rows); inactive particles (bin_b == nbin) clip
            # to an arbitrary real row and are masked out through act_b
            cand = cand_rows[jnp.minimum(bin_b, nbin - 1)]
        else:
            cand = table[nb_b].reshape(nb_b.shape[0], 27 * cap)
        valid = (cand != N) & (cand != self_b) & act_b[:, None]
        # compact via top_k on a composite key: valid entries carry a high
        # bit so they sort first; the id rides in the low bits (N < 2^21)
        HIGH = jnp.int32(1 << 21)
        key = jnp.where(valid, cand + HIGH, 0)
        topk, _ = jax.lax.top_k(key, M)                   # (n, M)
        trunc = jnp.sum(
            jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - M, 0)
        )
        out = jnp.where(topk >= HIGH, topk - HIGH, N)
        if do_refine:
            out, extra = refine_block(out, pos_b)
            trunc = trunc + extra
        return out, trunc

    self_idx = jnp.arange(N, dtype=jnp.int32)[:, None]
    if use_dense:
        nb_bin = jnp.zeros((N, 27), jnp.int32)            # unused placeholder
    k = cfg.force_chunks
    if use_dense and cfg.sorted_fetch and k <= 1:
        # walk the candidate table in bin-sorted order (sequential rows),
        # then invert the sort on the compact (N, M) result
        act_s = active[order]
        self_s = order.astype(jnp.int32)[:, None]
        cand_s = jnp.take(cand_rows, jnp.minimum(bin_sorted, nbin - 1),
                          axis=0, indices_are_sorted=True)
        valid = (cand_s != N) & (cand_s != self_s) & act_s[:, None]
        HIGH = jnp.int32(1 << 21)
        key = jnp.where(valid, cand_s + HIGH, 0)
        topk, _ = jax.lax.top_k(key, M)
        trunc = jnp.sum(jnp.maximum(
            jnp.sum(valid.astype(jnp.int32), axis=1) - M, 0))
        nbr_s = jnp.where(topk >= HIGH, topk - HIGH, N)
        if do_refine:
            nbr_s, extra = refine_block(nbr_s, pos[order])
            trunc = trunc + extra
        nbr = nbr_s[jnp.argsort(order)]
    elif k <= 1:
        nbr, trunc = compact_block((bin_of, nb_bin, active, self_idx, pos))
    else:
        assert N % k == 0, f"capacity {N} not divisible by force_chunks={k}"

        def chunked(x):
            return x.reshape((k, N // k) + x.shape[1:])

        nbr, trunc = jax.lax.map(
            compact_block,
            (chunked(bin_of), chunked(nb_bin), chunked(active),
             chunked(self_idx), chunked(pos)),
        )
        nbr = nbr.reshape(N, nbr.shape[-1])
        trunc = jnp.sum(trunc)

    if return_overflow:
        return nbr, n_bin_drop + trunc
    return nbr


def neighbor_contact_forces(
    nbr: jnp.ndarray,   # (N, M) from build_neighbor_list
    pos, vel, angvel, radius, active, grid: Grid, cfg: DEMConfig,
    xi: Optional[jnp.ndarray] = None,   # (N, M, 3) shear springs (history)
    dt=None,
):
    """Pair forces against a fixed candidate list (one 11-channel row-gather
    of N*M rows per evaluation; `cfg.force_chunks` bounds the lane-padded
    (chunk, M, 11) transient at large N). With ``xi`` (and ``dt``) the
    tangential force is the Coulomb-capped HISTORY spring and the updated
    springs are returned as a third output."""
    N = pos.shape[0]
    p = cfg.params
    m = particle_mass(radius, p.rho_p)
    data = jnp.concatenate(
        [pos, vel, angvel, radius[:, None], active.astype(pos.dtype)[:, None]],
        axis=-1,
    )
    data = jnp.concatenate([data, jnp.zeros((1, 11), data.dtype)])

    def eval_block_cm(args):
        # channel-major eval: one transpose to (11, M, n), then all pair
        # math on (M, n) component arrays (see DEMConfig.pair_layout)
        nbr_b, pos_b, vel_b, ang_b, rad_b, act_b, _ = args
        dj = data[nbr_b]                                # (n, M, 11)
        djT = jnp.transpose(dj, (2, 1, 0))              # (11, M, n)
        pos_j = (djT[0], djT[1], djT[2])
        vel_j = (djT[3], djT[4], djT[5])
        ang_j = (djT[6], djT[7], djT[8])
        rad_j, act_j = djT[9], djT[10] > 0.5
        m_j = particle_mass(jnp.maximum(rad_j, 1e-12), p.rho_p)
        m_b = particle_mass(rad_b, p.rho_p)
        valid = act_j & act_b[None, :] & (nbr_b.T != N)
        L = grid.lengths
        dx = []
        for c in range(3):
            d = pos_b[:, c][None, :] - pos_j[c]
            if cfg.periodic[c]:
                d = d - L[c] * jnp.round(d / L[c])
            dx.append(d)
        f, t = _pair_force_cm(
            tuple(dx),
            tuple(vel_b[:, c][None, :] for c in range(3)), vel_j,
            tuple(ang_b[:, c][None, :] for c in range(3)), ang_j,
            rad_b[None, :], rad_j,
            m_b[None, :], m_j,
            p, valid,
        )
        fs = jnp.stack([jnp.sum(c, axis=0) for c in f], axis=-1)
        ts = jnp.stack([jnp.sum(c, axis=0) for c in t], axis=-1)
        return fs, ts, None

    def eval_block(args):
        if cfg.pair_layout == "channels" and args[-1] is None:
            return eval_block_cm(args)
        nbr_b, pos_b, vel_b, ang_b, rad_b, act_b, xi_b = args
        dj = data[nbr_b]                                # (n, M, 11)
        if cfg.gather_barrier:
            dj = jax.lax.optimization_barrier(dj)
        pos_j, vel_j, ang_j = dj[..., 0:3], dj[..., 3:6], dj[..., 6:9]
        rad_j, act_j = dj[..., 9], dj[..., 10] > 0.5
        m_j = particle_mass(jnp.maximum(rad_j, 1e-12), p.rho_p)
        m_b = particle_mass(rad_b, p.rho_p)
        valid = act_j & act_b[:, None] & (nbr_b != N)
        dx = pos_b[:, None, :] - pos_j
        dx = _min_image(dx, grid, cfg.periodic)
        if xi_b is None:
            f, t = _pair_force(
                dx,
                vel_b[:, None, :], vel_j,
                ang_b[:, None, :], ang_j,
                rad_b[:, None], rad_j,
                m_b[:, None], m_j,
                p, valid,
            )
            xi_n = None
        else:
            f, t, xi_n = _pair_force_shear(
                dx,
                vel_b[:, None, :], vel_j,
                ang_b[:, None, :], ang_j,
                rad_b[:, None], rad_j,
                m_b[:, None], m_j,
                p, valid, xi_b, dt,
            )
        return jnp.sum(f, axis=1), jnp.sum(t, axis=1), xi_n

    k = cfg.force_chunks
    if k <= 1:
        f, t, xi_n = eval_block((nbr, pos, vel, angvel, radius, active, xi))
        return (f, t) if xi is None else (f, t, xi_n)
    assert N % k == 0, f"capacity {N} not divisible by force_chunks={k}"

    def chunked(x):
        return x.reshape((k, N // k) + x.shape[1:])

    args = (chunked(nbr), chunked(pos), chunked(vel), chunked(angvel),
            chunked(radius), chunked(active))
    if xi is None:
        f, t, _ = jax.lax.map(lambda a: eval_block(a + (None,)), args)
        return f.reshape(N, 3), t.reshape(N, 3)
    f, t, xi_n = jax.lax.map(eval_block, args + (chunked(xi),))
    return f.reshape(N, 3), t.reshape(N, 3), xi_n.reshape(xi.shape)


# ---------------------------------------------------------------------------
# Wall contacts
# ---------------------------------------------------------------------------

def wall_contact_forces(pos, vel, angvel, radius, active, grid: Grid,
                        cfg: DEMConfig, xi_wall=None, dt=None):
    """Contacts with the 6 domain box faces (spring-dashpot + Coulomb
    friction against infinite-mass planes), fully vectorized: one fused
    elementwise pass instead of six pair-kernel invocations. With
    ``xi_wall`` (N, 3, 3) the tangential force is the Coulomb-capped
    HISTORY spring (one slot per axis — the wall is the contact identity)
    and the updated springs are returned as a third output."""
    p = cfg.params
    m = particle_mass(radius, p.rho_p)
    cn = _normal_damping(p.kn, m, p.restitution)            # m_eff = m (wall)
    kt = p.kt_over_kn * p.kn
    ct = jnp.sqrt(kt * m)                                    # 2*0.5*sqrt(kt m)
    lo = jnp.asarray(grid.origin, pos.dtype)
    hi = jnp.asarray(grid.upper, pos.dtype)

    f_total = jnp.zeros_like(pos)
    t_total = jnp.zeros_like(pos)
    xi_out = xi_wall
    for axis in range(3):
        if not cfg.wall_axes[axis] or cfg.periodic[axis]:
            continue
        x = pos[:, axis]
        # signed "inward normal" handling both faces at once: the particle
        # can only touch one of the two opposite faces
        gap_lo = x - lo[axis]
        gap_hi = hi[axis] - x
        at_lo = gap_lo <= gap_hi
        gap = jnp.where(at_lo, gap_lo, gap_hi)
        sgn = jnp.where(at_lo, 1.0, -1.0)                    # inward normal comp
        overlap = radius - gap
        touching = active & (overlap > 0.0)

        v_n = sgn * vel[:, axis]                             # normal speed
        f_n_mag = jnp.maximum(p.kn * overlap - cn * v_n, 0.0)
        f_n_mag = jnp.where(touching, f_n_mag, 0.0)

        # tangential surface velocity at the contact point: v_t + omega x c,
        # c = -r * n (from centre to contact)
        n_vec = jnp.zeros((1, 3), pos.dtype).at[0, axis].set(1.0) * sgn[:, None]
        c_vec = -radius[:, None] * n_vec
        v_surf = vel + jnp.cross(angvel, c_vec)
        v_t = v_surf - (jnp.sum(v_surf * n_vec, -1))[:, None] * n_vec
        cap = p.friction * f_n_mag
        if xi_wall is None:
            f_t = -ct[:, None] * v_t
            f_t_mag = jnp.linalg.norm(f_t, axis=-1)
            scale = jnp.where(
                f_t_mag > 1e-30,
                jnp.minimum(1.0, cap / jnp.maximum(f_t_mag, 1e-30)), 0.0
            )
            f_t = f_t * jnp.where(touching, scale, 0.0)[:, None]
        else:
            xi_a = xi_out[:, axis]                           # (N, 3)
            # the wall normal is axis-aligned: drop the normal component
            xi_t = xi_a.at[:, axis].set(0.0)
            xi_acc = xi_t + v_t * dt
            ct_t = _normal_damping(kt, m, p.restitution)     # m_eff = m
            f_t_trial = -kt * xi_acc - ct_t[:, None] * v_t
            f_t_mag = jnp.linalg.norm(f_t_trial, axis=-1)
            over = f_t_mag > jnp.maximum(cap, 1e-30)
            scale = jnp.where(over, cap / jnp.maximum(f_t_mag, 1e-30), 1.0)
            f_t = f_t_trial * jnp.where(touching, scale, 0.0)[:, None]
            xi_upd = jnp.where(over[:, None], -f_t / kt, xi_acc)
            xi_out = xi_out.at[:, axis].set(
                jnp.where(touching[:, None], xi_upd, 0.0)
            )

        f = f_n_mag[:, None] * n_vec + f_t
        f_total = f_total + f
        t_total = t_total + jnp.cross(c_vec, f_t)
    if xi_wall is None:
        return f_total, t_total
    return f_total, t_total, xi_out


# ---------------------------------------------------------------------------
# Integration
# ---------------------------------------------------------------------------

class DEMForces(NamedTuple):
    force: jnp.ndarray    # (N,3) external (hydro) force, constant over substeps
    torque: jnp.ndarray   # (N,3)


def contact_forces(pos, vel, angvel, radius, active, grid, cfg: DEMConfig,
                   r_max: float, nbr=None):
    if nbr is not None:
        fc, tc = neighbor_contact_forces(nbr, pos, vel, angvel, radius, active, grid, cfg)
    elif cfg.neighbor == "allpairs":
        fc, tc = allpairs_contact_forces(pos, vel, angvel, radius, active, grid, cfg)
    elif cfg.neighbor == "cells":
        fc, tc = cell_list_contact_forces(pos, vel, angvel, radius, active, grid, cfg, r_max)
    else:
        raise ValueError(f"unknown neighbor mode {cfg.neighbor!r}")
    fw, tw = wall_contact_forces(pos, vel, angvel, radius, active, grid, cfg)
    return fc + fw, tc + tw


def dem_substeps(
    pos, vel, angvel, radius, active,
    hydro: DEMForces,
    grid: Grid,
    cfg: DEMConfig,
    dt_dem,
    n_sub: int,
    r_max: float,
    shear: Optional[ShearState] = None,
    pid: Optional[jnp.ndarray] = None,
    nbr: Optional[jnp.ndarray] = None,
    carried: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dt_seq: Optional[jnp.ndarray] = None,
):
    """Advance the DEM state n_sub leapfrog substeps under constant hydro
    force — the Yade-side loop of the coupling (SURVEY.md §3.4 item 5:
    "Yade runs ceil(dt_fluid/dt_DEM) substeps per exchange").

    Returns (pos, vel, angvel, n_overflow): the last element counts
    neighbor-list capacity drops this step (0 when exact). With
    ``cfg.shear_history`` (pass the previous step's ``shear``) a fifth
    element returns the updated ShearState.

    ``nbr`` supplies a prebuilt (persistent) Verlet candidate list; the
    in-call build is skipped entirely and n_overflow reports 0 (the build
    step that produced the list accounted for its own drops).

    With ``cfg.carry_contact`` the return gains (contact_f, contact_t) —
    the contact force/torque of the LAST substep evaluation, valid as the
    ``carried`` input of the next call (see DEMConfig.carry_contact).

    ``dt_seq`` (shape (n_sub,)) supplies a PER-SUBSTEP dt overriding the
    scalar ``dt_dem`` — the dynamic-substep path
    (DEMConfig.dynamic_substeps) passes dt/n_eff for the first n_eff
    entries and 0 for the masked tail (a zero-dt velocity-Verlet substep
    leaves pos/vel/angvel bit-identical)."""
    p = cfg.params
    m = particle_mass(radius, p.rho_p)
    inertia = particle_inertia(radius, p.rho_p)
    g = jnp.asarray(cfg.gravity, pos.dtype)
    vol = (4.0 / 3.0) * jnp.pi * radius ** 3
    f_grav = m[:, None] * g[None, :]
    if cfg.buoyancy:
        f_grav = f_grav - cfg.rho_f * vol[:, None] * g[None, :]

    inv_m = jnp.where(active, 1.0 / m, 0.0)[:, None]
    inv_I = jnp.where(active, 1.0 / inertia, 0.0)[:, None]

    def damp(f, v):
        # Cundall non-viscous damping (Yade NewtonIntegrator::damping):
        # reduce force components that feed kinetic energy, amplify those
        # that drain it
        d = cfg.cundall_damping
        if d == 0.0:
            return f
        return f * (1.0 - d * jnp.sign(f * v))

    def make_accel(nbr, pos0, vel0, angvel0):
        if cfg.contact_mode == "step":
            fc0, tc0 = contact_forces(pos0, vel0, angvel0, radius, active,
                                      grid, cfg, r_max, nbr)

            def accel(pos, vel, angvel):
                f = damp(fc0 + f_grav + hydro.force, vel)
                t = damp(tc0 + hydro.torque, angvel)
                return f * inv_m, t * inv_I
        else:
            def accel(pos, vel, angvel):
                fc, tc = contact_forces(pos, vel, angvel, radius, active,
                                        grid, cfg, r_max, nbr)
                f = damp(fc + f_grav + hydro.force, vel)
                t = damp(tc + hydro.torque, angvel)
                return f * inv_m, t * inv_I
        return accel

    def substep_body(accel):
        def body(state, dt_x):
            # velocity Verlet with the acceleration carried across steps:
            # a2 of step k is a1 of step k+1, so force evaluation happens
            # ONCE per substep
            dt_ = dt_dem if dt_x is None else dt_x
            pos, vel, angvel, a, aw = state
            vel_h = vel + 0.5 * dt_ * a
            angvel_h = angvel + 0.5 * dt_ * aw
            pos_n = pos + dt_ * vel_h
            # wrap periodic axes
            lo = jnp.asarray(grid.origin, pos.dtype)
            L = jnp.asarray(grid.lengths, pos.dtype)
            per = jnp.asarray(cfg.periodic)
            pos_n = jnp.where(per, lo + jnp.mod(pos_n - lo, L), pos_n)
            a2, aw2 = accel(pos_n, vel_h, angvel_h)
            vel_n = vel_h + 0.5 * dt_ * a2
            angvel_n = angvel_h + 0.5 * dt_ * aw2
            return (pos_n, vel_n, angvel_n, a2, aw2), None
        return body

    use_list = cfg.neighbor == "cells"
    if nbr is not None:
        every = n_sub          # one chunk, no in-call rebuild
    else:
        every = cfg.list_rebuild_every if (use_list and cfg.list_rebuild_every > 0) else n_sub
    every = min(every, n_sub)
    n_chunks, rem = divmod(n_sub, every)
    assert rem == 0, f"n_sub={n_sub} not divisible by list_rebuild_every={every}"
    # per-substep dt rows for the chunk scans (None = closure scalar dt_dem)
    dt_rows = None if dt_seq is None else jnp.reshape(dt_seq, (n_chunks, every))
    unroll = True if cfg.substep_unroll else 1

    if cfg.shear_history:
        assert use_list and cfg.contact_mode == "substep", (
            "shear_history requires neighbor='cells', contact_mode='substep'")
        assert shear is not None, "pass the previous ShearState"

        def eval_h(nbr, pos_, vel_, ang_, xi_, xw_, dt_):
            fc, tc, xi2 = neighbor_contact_forces(
                nbr, pos_, vel_, ang_, radius, active, grid, cfg, xi_, dt_)
            fw, tw, xw2 = wall_contact_forces(pos_, vel_, ang_, radius,
                                              active, grid, cfg, xw_, dt_)
            f = damp(fc + fw + f_grav + hydro.force, vel_)
            t = damp(tc + tw + hydro.torque, ang_)
            return f * inv_m, t * inv_I, xi2, xw2

        def chunk_h(state, dt_row):
            pos, vel, angvel, sh = state
            if nbr is not None:
                nbr_c, overflow = nbr, jnp.int32(0)
            else:
                nbr_c, overflow = build_neighbor_list(
                    pos, active, grid, cfg, r_max, return_overflow=True
                )
            keys = shear_keys(nbr_c, pos.shape[0], pid)
            xi = carry_shear(sh, keys)
            xw = sh.xi_wall
            # dt=0: force at the current state, springs projected only
            a0, aw0, xi, xw = eval_h(nbr_c, pos, vel, angvel, xi, xw, 0.0)

            def body(st, dt_x):
                dt_ = dt_dem if dt_x is None else dt_x
                pos, vel, angvel, a, aw, xi, xw = st
                vel_h = vel + 0.5 * dt_ * a
                angvel_h = angvel + 0.5 * dt_ * aw
                pos_n = pos + dt_ * vel_h
                lo = jnp.asarray(grid.origin, pos.dtype)
                L = jnp.asarray(grid.lengths, pos.dtype)
                per = jnp.asarray(cfg.periodic)
                pos_n = jnp.where(per, lo + jnp.mod(pos_n - lo, L), pos_n)
                a2, aw2, xi2, xw2 = eval_h(nbr_c, pos_n, vel_h, angvel_h, xi,
                                           xw, dt_)
                if dt_x is not None:
                    # masked substep: freeze the shear springs (a zero-dt
                    # evaluation at the final velocity could re-project /
                    # re-cap them differently from the last live one)
                    live = dt_ > 0
                    xi2 = jnp.where(live, xi2, xi)
                    xw2 = jnp.where(live, xw2, xw)
                vel_n = vel_h + 0.5 * dt_ * a2
                angvel_n = angvel_h + 0.5 * dt_ * aw2
                return (pos_n, vel_n, angvel_n, a2, aw2, xi2, xw2), None

            (pos, vel, angvel, _, _, xi, xw), _ = jax.lax.scan(
                body, (pos, vel, angvel, a0, aw0, xi, xw), dt_row,
                length=every, unroll=unroll
            )
            return (pos, vel, angvel, ShearState(xi, keys, xw)), overflow

        (pos, vel, angvel, shear), overflows = jax.lax.scan(
            chunk_h, (pos, vel, angvel, shear), dt_rows, length=n_chunks,
            unroll=unroll
        )
        return pos, vel, angvel, jnp.max(overflows), shear

    carry_c = cfg.carry_contact and cfg.contact_mode == "substep"

    if carry_c:
        def contact_eval(nbr_c, pos_, vel_, ang_):
            fc, tc = contact_forces(pos_, vel_, ang_, radius, active, grid,
                                    cfg, r_max, nbr_c)
            return fc, tc

        def chunk_c(state, dt_row):
            pos, vel, angvel, fc, tc = state
            if nbr is not None:
                nbr_c, overflow = nbr, jnp.int32(0)
            elif use_list:
                nbr_c, overflow = build_neighbor_list(
                    pos, active, grid, cfg, r_max, return_overflow=True
                )
            else:
                nbr_c, overflow = None, jnp.int32(0)
            # a0 re-composed from the carried contact force — no eval
            a0 = damp(fc + f_grav + hydro.force, vel) * inv_m
            aw0 = damp(tc + hydro.torque, angvel) * inv_I

            def body(st, dt_x):
                dt_ = dt_dem if dt_x is None else dt_x
                pos, vel, angvel, a, aw, fc, tc = st
                vel_h = vel + 0.5 * dt_ * a
                angvel_h = angvel + 0.5 * dt_ * aw
                pos_n = pos + dt_ * vel_h
                lo = jnp.asarray(grid.origin, pos.dtype)
                L = jnp.asarray(grid.lengths, pos.dtype)
                per = jnp.asarray(cfg.periodic)
                pos_n = jnp.where(per, lo + jnp.mod(pos_n - lo, L), pos_n)
                fc2, tc2 = contact_eval(nbr_c, pos_n, vel_h, angvel_h)
                if dt_x is not None:
                    # masked (zero-dt) substep: the half-step velocity here
                    # is the FULL final velocity, so a fresh evaluation
                    # would shift the velocity-dependent (dashpot) part of
                    # the carried force — keep the last live evaluation so
                    # the carry stays bit-equal to the static-substep run
                    live = dt_ > 0
                    fc2 = jnp.where(live, fc2, fc)
                    tc2 = jnp.where(live, tc2, tc)
                a2 = damp(fc2 + f_grav + hydro.force, vel_h) * inv_m
                aw2 = damp(tc2 + hydro.torque, angvel_h) * inv_I
                vel_n = vel_h + 0.5 * dt_ * a2
                angvel_n = angvel_h + 0.5 * dt_ * aw2
                return (pos_n, vel_n, angvel_n, a2, aw2, fc2, tc2), None

            (pos, vel, angvel, _, _, fc, tc), _ = jax.lax.scan(
                body, (pos, vel, angvel, a0, aw0, fc, tc), dt_row,
                length=every, unroll=unroll
            )
            return (pos, vel, angvel, fc, tc), overflow

        if carried is not None:
            fc0, tc0 = carried
        else:
            nbr0 = nbr
            if nbr0 is None and use_list:
                nbr0 = build_neighbor_list(pos, active, grid, cfg, r_max)
            fc0, tc0 = contact_eval(nbr0, pos, vel, angvel)
        (pos, vel, angvel, fc, tc), overflows = jax.lax.scan(
            chunk_c, (pos, vel, angvel, fc0, tc0), dt_rows, length=n_chunks,
            unroll=unroll
        )
        return pos, vel, angvel, jnp.max(overflows), fc, tc

    def chunk(state, dt_row):
        pos, vel, angvel = state
        if nbr is not None:
            nbr_c, overflow = nbr, jnp.int32(0)
        elif use_list:
            nbr_c, overflow = build_neighbor_list(
                pos, active, grid, cfg, r_max, return_overflow=True
            )
        else:
            nbr_c, overflow = None, jnp.int32(0)
        accel = make_accel(nbr_c, pos, vel, angvel)
        a0, aw0 = accel(pos, vel, angvel)
        (pos, vel, angvel, _, _), _ = jax.lax.scan(
            substep_body(accel), (pos, vel, angvel, a0, aw0), dt_row,
            length=every, unroll=unroll
        )
        return (pos, vel, angvel), overflow

    (pos, vel, angvel), overflows = jax.lax.scan(
        chunk, (pos, vel, angvel), dt_rows, length=n_chunks, unroll=unroll
    )
    return pos, vel, angvel, jnp.max(overflows)


def critical_dt(radius_min: float, params: ContactParams) -> float:
    """Rayleigh-style critical DEM time step: dt_c ~ sqrt(m_min/kn) * safety."""
    m_min = float(params.rho_p * (4.0 / 3.0) * np.pi * radius_min ** 3)
    return 0.2 * float(np.sqrt(m_min / params.kn))


def critical_dt_dynamic(radius, active, params: ContactParams):
    """Traced critical_dt from the current (masked) minimum radius — the
    in-graph clamp the coupled step applies to the adaptive fluid dt
    (`coupled_step`), replacing the reference's per-step dt negotiation
    with Yade (`exchangeDT`, /root/reference/FoamYade/FoamYade.C:537-553:
    Yade runs ceil(dt_fluid/dt_DEM) substeps of its own stable dt; here
    the substep count is static, so dt_fluid itself is bounded)."""
    r_min = jnp.min(jnp.where(active, radius, jnp.inf))
    r_min = jnp.where(jnp.isfinite(r_min), r_min, 1.0)  # no active particles
    m_min = params.rho_p * (4.0 / 3.0) * jnp.pi * r_min ** 3
    return 0.2 * jnp.sqrt(m_min / params.kn)
